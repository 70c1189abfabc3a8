"""Relational BPE vocabulary learning (Sennrich et al. 2016, arXiv:
1508.07909 "Neural Machine Translation of Rare Words with Subword
Units") — the tokenizer-training step of a pretraining-data pipeline,
and the one standard training-data operator the engine lacked through
r14 (r14 verdict next #5). Reference analog: the chunk/embed pipeline
tokenizes implicitly (pdf_rag_chatbot.py:218-223); a 100 TB pipeline
trains its own vocabulary first.

Scale shape — the whole point of doing BPE relationally:

* The corpus crosses the wire ONCE: a map-side-combined word-frequency
  aggregate collapses 100 TB of text to a VOCAB-sized (word, freq)
  frame (heavy-tailed: ~10⁶-10⁷ types for web-scale corpora). Every
  merge round thereafter touches only that frame.
* Each round is (a) one adjacent-pair count aggregate over the vocab
  frame, weighted by freq — map-side combinable, pair-type-sized
  output; (b) ONE top-1 row to the driver (the k-scalar collect
  contract; same move as ``pagerank``/``kmeans``'s per-round driver
  step); (c) a per-row fold (`F.aggregate` HOF) that applies the merge
  greedily left-to-right inside each word — pure Catalyst, zero
  shuffle, no Python. The round frame is checkpointed so plans stay
  flat across rounds (the k-rounds discipline ``kmeans`` set).
* Nothing anywhere is corpus-sized after step 0, and no stage sorts or
  windows a whole partition of anything bigger than the vocab.

Semantics pinned cross-engine (the DuckDB oracle replays every round
as unrolled CTEs — pair counts include overlapping occurrences, the
merge applies left-to-right non-overlapping, exactly Python reference
BPE's ``pairs`` / ``merge_vocab``):

* Words: lowercased whitespace tokens restricted to ``^[a-z]+$`` —
  the alphabetic-vocabulary simplification keeps the symbol alphabet
  unambiguous in both engines (no UTF-16-code-unit vs codepoint
  character-split divergence on astral text).
* Initial symbolization: characters plus a terminal ``</w>`` marker
  (the Sennrich end-of-word symbol, so merges can learn suffixes).
* Pair score: Σ word_freq over all ADJACENT occurrences (overlapping
  counted, as in the reference implementation); tie → (left, right)
  ascending, so the winner is unique and engine-independent.
* Merge application: greedy left-to-right, non-overlapping ("aaaa"
  under (a,a) → [aa, aa]; "aaa" → [aa, a]) — the fold's pending-symbol
  state machine below IS that scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: terminal end-of-word symbol (Sennrich et al. 2016 §3.2)
EOW = "</w>"


def bpe_word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, syms) — the corpus collapsed to its alphabetic word
    types with initial character+EOW symbolization. The ONLY corpus-
    sized pass in BPE training; everything downstream is vocab-sized."""
    from yfinance_etl_spark.operators.text import tokens

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .select(F.lower("w").alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split("word", ""), F.array(F.lit(EOW))
        ).alias("syms"),
    )


def _apply_merge(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) into left||right — a fold with a one-symbol pending
    buffer: emit the merge and clear the buffer on a match (the merged
    token never re-pairs within its own round), otherwise flush the
    buffer and hold the current symbol."""
    new = F.lit(left + right)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pending"),
    )

    def step(acc, x):
        hit = (acc["pending"] == F.lit(left)) & (x == F.lit(right))
        return F.when(
            hit,
            F.struct(
                F.array_append(acc["out"], new).alias("out"),
                F.lit(None).cast("string").alias("pending"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["pending"].isNotNull(),
                    F.array_append(acc["out"], acc["pending"]),
                )
                .otherwise(acc["out"])
                .alias("out"),
                x.alias("pending"),
            )
        )

    def finish(acc):
        return F.when(
            acc["pending"].isNotNull(), F.array_append(acc["out"], acc["pending"])
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, finish)


def _bpe_learn(
    docs: DataFrame, n_merges: int, text_col: str
) -> tuple[list[tuple], DataFrame]:
    """The learn loop: returns (merge rows, final vocab frame with the
    post-merge symbolization) — shared by ``bpe_merges`` (ships the
    merge table) and ``bpe_token_counts`` (applies it to the corpus)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = bpe_word_vocab(docs, text_col).localCheckpoint(eager=True)
    out_rows = []
    for rank in range(1, n_merges + 1):
        n = F.size("syms")
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.greatest(n - 1, F.lit(0))).alias("l"),
                        F.slice("syms", 2, F.greatest(n - 1, F.lit(0))).alias("r"),
                    )
                ).alias("pr"),
            )
            .groupBy(
                F.col("pr.l").alias("l"), F.col("pr.r").alias("r")
            )
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not top:
            break  # vocabulary fully merged — nothing adjacent remains
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        out_rows.append((rank, l, r, l + r, cnt))
        vocab = vocab.select(
            "word", "freq", _apply_merge(F.col("syms"), l, r).alias("syms")
        ).localCheckpoint(eager=True)
    return out_rows, vocab


def bpe_merges(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus. Returns
    one row per merge: (merge_rank, lhs, rhs, new_symbol, pair_count),
    rank ascending in learn order — the merge table a tokenizer ships.

    Driver traffic: one (l, r, count) row per round. Cluster work per
    round: a pair-count aggregate + a Catalyst fold over the vocab
    frame (see module docstring for the 100 TB argument)."""
    out_rows, _vocab = _bpe_learn(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        out_rows,
        "merge_rank int, lhs string, rhs string, new_symbol string, "
        "pair_count bigint",
    )


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the tokenizer AND apply it — the composed step a training
    pipeline actually runs (learn merges on the corpus, then budget the
    same corpus in the learned subword unit). Returns (id_col, n_words,
    n_bpe_tokens) per document over its alphabetic words: n_words =
    word occurrences, n_bpe_tokens = their post-merge symbol count
    (each unmerged word costs len(word)+1 symbols for the </w> marker;
    every learned merge that applies saves one).

    Scale shape: applying BPE to the corpus does NOT re-scan text per
    merge — the folds already produced the final symbolization on the
    VOCAB frame, so application is one (word → token-count) equi-join
    against the doc-word frame, pre-aggregated by (doc, word) so the
    join input carries type counts, not raw occurrences. The token
    budget per doc is what ``pack_shards`` consumes when shards are
    budgeted in model tokens instead of whitespace tokens."""
    from yfinance_etl_spark.operators.text import tokens

    _rows, vocab = _bpe_learn(docs, n_merges, text_col)
    wtoks = vocab.select("word", F.size("syms").alias("__wt"))
    docw = (
        docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("w"))
        .select(id_col, F.lower("w").alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        docw.join(wtoks, "word")
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_words"),
            F.sum(F.col("__n") * F.col("__wt")).alias("n_bpe_tokens"),
        )
    )
