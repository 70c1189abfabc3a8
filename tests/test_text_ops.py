"""Cross-engine tokenizer-unit parity on non-ASCII BMP text (r10 verdict
item 5): each space-split text operator states a tokenizer unit contract
in its docstring (tokens/regex_tokens, lm_perplexity, dsir_log_weights);
this file is the contract's executable form — the REGISTERED
query-vs-oracle compare (the same machinery as tools/compare_oracle.py)
replayed on a multilingual BMP corpus, so the operators are one
multilingual fixture away from NOTHING: the divergence char_entropy's r9
advice warned about fails loudly here, engine-vs-engine, before any
driver round can see it. Mirrors test_scalar.py's DST-edge pattern of
pinning engine behavior on the hostile inputs."""

from __future__ import annotations

import importlib.util
import pathlib
import sys

import duckdb

_TOOL = pathlib.Path(__file__).resolve().parents[1] / "tools" / "compare_oracle.py"


def _compare_mod():
    if "compare_oracle" in sys.modules:
        return sys.modules["compare_oracle"]
    spec = importlib.util.spec_from_file_location("compare_oracle", str(_TOOL))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["compare_oracle"] = mod
    spec.loader.exec_module(mod)
    return mod


#: BMP-only multilingual corpus: 2-/3-byte UTF-8, no astral chars — the
#: stated contract boundary (same as char_entropy's). Deliberately hostile:
#: NBSP-joined words, unsegmented CJK, tabs/newlines, mixed-script tokens.
BMP_DOCS = [
    (0, "héllo wörld — café naïve über straße", "en"),
    (1, "привет мир это тестовый документ номер один", "ru"),
    (2, "γειά σου κόσμε δοκιμή κειμένου εδώ τώρα", "el"),
    (3, "这是一个没有空格的中文句子在这里", "zh"),  # unsegmented: ONE token
    (4, "中文 句子 有 空格 分词 测试 在这", "zh"),
    (5, "nbsp\u00a0joined\u00a0words stay whole «quoted» 。句点", None),
    (6, "tabs\tand\nnewlines   collapse here sometimes", "en"),
    (7, "mixed英文and中文tokens numbers123 and—dashes too", "en"),
    (8, "repeat repeat repeat повтор повтор 重复 重复", "ru"),
    (9, "final doc ensures english bigrams train the lm model here", "en"),
]

#: every registered query whose tokenizer is the ASCII space split —
#: token_stats additionally exercises regex_tokens' per-code-point class
SPACE_SPLIT_QUERIES = (
    "token_stats",
    "lm_perplexity",
    "dsir_importance_topk",
    "shard_packing",
)


def test_space_split_operators_bmp_oracle_parity(spark, tmp_path):
    from yfinance_etl_spark.plans.queries import REGISTRY

    rows = [(i, t, lang, "bmp", len(t)) for i, t, lang in BMP_DOCS]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    mod = _compare_mod()
    for name in SPACE_SPLIT_QUERIES:
        q = REGISTRY[name]
        sdf = q.fn(spark, str(tmp_path))
        spark_rows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(q.oracle)
        ok = mod.compare(
            name, spark_rows, sdf.columns, rel.fetchall(), list(rel.columns)
        )
        assert ok, f"{name}: BMP fixture broke oracle parity"
        assert len(spark_rows) > 0, name


def test_bmp_semantic_traits_are_engine_shared_not_divergence(spark, tmp_path):
    """The contract's stated limitations, pinned as FACTS both engines
    share: NBSP joins words into one token and unsegmented CJK is one
    token — identical counts in Spark and DuckDB, so they can never be
    mistaken for cross-engine drift."""
    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.text import regex_tokens, tokens

    df = spark.createDataFrame(
        [(3, BMP_DOCS[3][1]), (5, BMP_DOCS[5][1])], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.ws, r.re)
        for r in df.select(
            "doc_id",
            F.size(F.filter(tokens("text"), lambda x: x != "")).alias("ws"),
            F.size(regex_tokens("text")).alias("re"),
        ).collect()
    }
    con = duckdb.connect()
    duck = {
        i: (ws, re)
        for i, ws, re in con.execute(
            """
            SELECT doc_id,
                   len(list_filter(string_split(trim(regexp_replace(t, '\\s+', ' ', 'g')), ' '),
                                   x -> x != '')),
                   len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
            FROM (VALUES (3, ?), (5, ?)) v(doc_id, t)
            """,
            [BMP_DOCS[3][1], BMP_DOCS[5][1]],
        ).fetchall()
    }
    assert got == duck
    assert got[3][0] == 1  # unsegmented CJK: one whitespace token, both engines
    # regex_tokens sees each BMP CJK code point as its own token, both engines
    assert got[3][1] == len(BMP_DOCS[3][1])
    # NBSP never splits: "nbsp joined words" is one whitespace token
    assert got[5][0] == 5


def test_bpe_merges_hand_checkable_first_merges(spark):
    """First merges on a controlled corpus, every count hand-derived
    (r14 verdict next #5): word freqs low*3 lower*2 newest*4 widest the*3
    cat hat mat aaa aaaa. Round 1: (t, </w>) = newest 4 + widest 1 +
    cat/hat/mat 3 = 8. Round 2: (w, e) = lower 2 + newest 4 = 6. Round 3:
    (a, a) counts OVERLAPS — aaa has 2, aaaa has 3 = 5 — and its merge
    applies greedily left-to-right (aaaa -> [aa, aa], aaa -> [aa, a]).
    Round 6 pins the tie-break: (e,we), (n,e), (we,st</w>) all count 4 ->
    lexicographic (l, r) ascending picks (e, we)."""
    from yfinance_etl_spark.operators.bpe import bpe_merges, bpe_word_vocab

    docs = spark.createDataFrame(
        [
            (0, "low low low lower lower newest newest newest newest widest"),
            (1, "the cat the hat the mat aaa aaaa"),
        ],
        "doc_id long, text string",
    )
    vocab = {r.word: (r.freq, r.syms) for r in bpe_word_vocab(docs).collect()}
    assert vocab["aaaa"] == (1, ["a", "a", "a", "a", "</w>"])
    assert vocab["the"] == (3, ["t", "h", "e", "</w>"])

    got = [
        (r.merge_rank, r.lhs, r.rhs, r.new_symbol, r.pair_count)
        for r in sorted(bpe_merges(docs, n_merges=6).collect())
    ]
    assert got == [
        (1, "t", "</w>", "t</w>", 8),
        (2, "w", "e", "we", 6),
        (3, "a", "a", "aa", 5),
        (4, "l", "o", "lo", 5),
        (5, "s", "t</w>", "st</w>", 5),
        (6, "e", "we", "ewe", 4),
    ]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_merges"):
        bpe_merges(docs, n_merges=0)


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    """The fold's pending-buffer state machine must implement the
    reference merge_vocab scan exactly: non-overlapping, left-anchored.
    Directly exercised via _apply_merge on crafted symbol arrays."""
    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.bpe import _apply_merge

    rows = [
        (1, ["a", "a", "a", "a"]),
        (2, ["a", "a", "a"]),
        (3, ["x", "a", "a", "y", "a"]),
        (4, ["b"]),
        (5, []),
    ]
    df = spark.createDataFrame(rows, "id long, syms array<string>")
    got = {
        r.id: r.m
        for r in df.select(
            "id", _apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    }
    assert got[1] == ["aa", "aa"]
    assert got[2] == ["aa", "a"]
    assert got[3] == ["x", "aa", "y", "a"]
    assert got[4] == ["b"]
    assert got[5] == []


def test_bpe_token_counts_train_plus_apply(spark):
    """The apply step on the hand corpus: after the 6 hand-checked
    merges, each word's token count is its final symbolization size —
    recomputed here with reference Python BPE (count overlapping pairs,
    merge greedily left-to-right) from scratch, independent of the
    operator's fold."""
    from yfinance_etl_spark.operators.bpe import bpe_token_counts

    texts = [
        (0, "low low low lower lower newest newest newest newest widest"),
        (1, "the cat the hat the mat aaa aaaa"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")

    # reference BPE, straight from the paper's pseudocode
    freqs: dict[tuple, int] = {}
    for _, t in texts:
        for w in t.split():
            k = tuple(list(w) + ["</w>"])
            freqs[k] = freqs.get(k, 0) + 1
    for _ in range(6):
        pairs: dict[tuple, int] = {}
        for syms, f in freqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        # tie-break exactly as the operator: count DESC, then (lhs, rhs) ASC
        mx = max(pairs.values())
        l, r = min(p for p, c in pairs.items() if c == mx)
        new_freqs = {}
        for syms, f in freqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_freqs[tuple(out)] = new_freqs.get(tuple(out), 0) + f
        freqs = new_freqs
    # per-word token count keyed by the original word string (the final
    # symbolization concatenates back to word + marker)
    wt = {}
    for syms, _f in freqs.items():
        word = "".join(syms)[: -len("</w>")]
        wt[word] = len(syms)

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_token_counts(docs, n_merges=6).collect()
    }
    for doc_id, t in texts:
        ws = t.split()
        assert got[doc_id] == (len(ws), sum(wt[w] for w in ws)), doc_id


def test_bpe_fold_matches_reference_scan_on_randomized_inputs(spark):
    """_apply_merge's fold vs the reference left-to-right scan over 300
    seeded-random symbol arrays (alphabet {a,b,ab} to force overlap and
    multi-char-symbol cases), all compared in ONE Spark action."""
    import random

    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.bpe import _apply_merge

    rng = random.Random(1517)
    alphabet = ["a", "b", "ab"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randrange(0, 12))]
        for _ in range(300)
    ]
    merges = [("a", "a"), ("a", "b"), ("ab", "a"), ("b", "b")]

    def reference(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, syms array<string>"
    )
    cols = [
        _apply_merge(F.col("syms"), l, r).alias(f"m{k}")
        for k, (l, r) in enumerate(merges)
    ]
    got = {r.id: r for r in df.select("id", *cols).collect()}
    for i, c in enumerate(cases):
        for k, (l, r) in enumerate(merges):
            assert got[i][f"m{k}"] == reference(c, l, r), (c, l, r)


def test_bpe_driver_tier_matches_relational_tier(spark):
    """The r16 two-tier contract: the driver tier (collected type frame
    + incremental heap/delta loop + Arrow re-upload) must reproduce the
    relational per-round loop merge-for-merge AND symbol-for-symbol —
    same merge table (ranks, pairs, counts) and same final vocab
    symbolization — on a corpus engineered with ties, overlaps, and a
    fully-merging word."""
    from yfinance_etl_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame(
        [
            (0, "low low low lower lower newest newest newest newest widest"),
            (1, "the cat the hat the mat aaa aaaa"),
            (2, "zz zz zz zz zz"),  # fully merges in 2 rounds
        ],
        "doc_id long, text string",
    )
    d = bpe_learn(docs, n_merges=12, tier="driver")
    r = bpe_learn(docs, n_merges=12, tier="relational")
    assert list(d.merges) == list(r.merges)
    assert d.alphabet == r.alphabet
    vd = {x.word: x.syms for x in d.vocab.collect()}
    vr = {x.word: x.syms for x in r.vocab.collect()}
    assert vd == vr


def test_bpe_driver_delta_loop_matches_naive_rescore_randomized():
    """_learn_driver's site-local delta updates + lazy-invalidation heap
    vs a from-scratch per-round recount, over 300 seeded-random corpora
    on a 2-letter alphabet (maximal pair interaction): identical merge
    tables and identical final symbolizations."""
    import random

    from yfinance_etl_spark.operators.bpe import EOW, _learn_driver, _merge_word

    def naive(word_freq, n_merges):
        syms = {w: list(w) + [EOW] for w, _ in word_freq}
        out = []
        for rank in range(1, n_merges + 1):
            counts = {}
            for w, f in word_freq:
                s = syms[w]
                for p in zip(s, s[1:]):
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                break
            (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, l, r, l + r, int(cnt)))
            for w, _ in word_freq:
                syms[w] = _merge_word(syms[w], l, r, l + r)
        return out, syms

    rng = random.Random(7)
    for trial in range(300):
        wf = {}
        for _ in range(rng.randint(1, 30)):
            w = "".join(rng.choice("ab") for _ in range(rng.randint(1, 8)))
            wf[w] = rng.randint(1, 5)
        wf = sorted(wf.items())
        nm = rng.randint(1, 15)
        got = _learn_driver(list(wf), nm)
        want = naive(list(wf), nm)
        assert got[0] == want[0], (trial, wf, nm)
        assert got[1] == want[1], (trial, wf, nm)


def test_bpe_token_counts_zero_word_doc_budgets_at_zero(spark):
    """A document with no alphabetic words gets an explicit (0, 0) row
    (r15 ADVICE): a downstream pack_shards consumer shards it rather
    than silently dropping it."""
    from yfinance_etl_spark.operators.bpe import bpe_token_counts

    docs = spark.createDataFrame(
        [(0, "plain words here"), (1, "12345 !!! 99"), (2, "more plain words")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_token_counts(docs, n_merges=2).collect()}
    assert set(got) == {0, 1, 2}
    assert got[1] == (0, 0)
    assert got[0][0] == 3 and got[0][1] > 0


def test_bpe_token_ids_first_rank_wins_on_colliding_new_symbols():
    """Two merges can concatenate to the same string — (a,bc) and
    (ab,c) both yield 'abc'. The id law keeps the FIRST rank's id, and
    the model surfaces every alphabet symbol before any merge id."""
    from yfinance_etl_spark.operators.bpe import BpeModel

    m = BpeModel(
        merges=((1, "a", "bc", "abc", 9), (2, "ab", "c", "abc", 5),
                (3, "x", "y", "xy", 4)),
        vocab=None,
        alphabet=("a", "b", "c", "x", "y"),
    )
    ids = m.token_ids()
    assert ids["a"] == 0 and ids["y"] == 4
    assert ids["abc"] == 5  # rank 1 wins, rank 2's id 6 is never reused
    assert ids["xy"] == 7


def test_bpe_tokenize_sequences_and_shared_model(spark):
    """bpe_tokenize emits (doc, word_pos, sym_pos, token, token_id)
    with original whitespace-token positions (gaps where non-alphabetic
    tokens sat), subword order within each word, and ids under the
    alphabet+rank law; sharing one BpeModel across bpe_merges /
    bpe_token_counts / bpe_tokenize re-learns nothing and agrees with
    per-call learning."""
    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.bpe import (
        bpe_learn,
        bpe_merges,
        bpe_token_counts,
        bpe_tokenize,
    )

    docs = spark.createDataFrame(
        [(0, "aa 42 bb aa"), (1, "bb aa bb")], "doc_id long, text string"
    )
    model = bpe_learn(docs, n_merges=1)  # learns exactly one merge
    rows = bpe_tokenize(docs, model=model).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: word positions 0, 2, 3 — position 1 ('42') is a visible gap
    assert sorted({r.word_pos for r in by_doc[0]}) == [0, 2, 3]
    # every (word_pos, sym_pos) pair unique; tokens reassemble the word
    w0 = sorted((r.sym_pos, r.token) for r in by_doc[0] if r.word_pos == 0)
    assert "".join(t for _, t in w0).replace("</w>", "") == "aa"
    # ids: alphabet is (</w>, a, b) sorted ascending -> merge id = 3
    ids = model.token_ids()
    assert len(model.alphabet) == 3
    assert all(ids[r.token] == r.token_id for r in rows)
    # the shared model agrees with per-call learning
    assert bpe_merges(docs, n_merges=1).collect() == \
        bpe_merges(docs, model=model).collect()
    a = sorted(map(tuple, bpe_token_counts(docs, n_merges=1).collect()))
    b = sorted(map(tuple, bpe_token_counts(docs, model=model).collect()))
    assert a == b
    # n_bpe_tokens consistency: tokenize row count per doc == n_bpe_tokens
    per_doc = {d: len(v) for d, v in by_doc.items()}
    assert per_doc == {r.doc_id: r.n_bpe_tokens for r in
                       bpe_token_counts(docs, model=model).collect()}
