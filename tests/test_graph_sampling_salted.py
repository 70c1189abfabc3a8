"""Connected-components clustering, hash-split sampling, TF-IDF, and the
salted skew join — round-3 training-pipeline/scale operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from yfinance_etl_spark.operators.graph import connected_components, dedup_clusters
from yfinance_etl_spark.operators.joins import salted_join
from yfinance_etl_spark.operators.sampling import hash_bucket, with_split
from yfinance_etl_spark.operators.text import tfidf_top_terms


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_connected_components_two_clusters_and_chain(spark):
    # {1,2,3} as a chain (diameter 2, needs >1 iteration) and {10,11}
    out = {
        r.node: r.component
        for r in connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)])).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    # path 0-1-2-...-7: worst diameter shape for label propagation
    out = {
        r.node: r.component
        for r in connected_components(
            _edges(spark, [(i, i + 1) for i in range(7)])
        ).collect()
    }
    assert set(out.values()) == {0} and len(out) == 8


def test_dedup_clusters_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a bigint, doc_b bigint"
    )
    out = {r.doc_id: (r.component, r.cluster_size) for r in dedup_clusters(pairs).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[7] == (7, 2) and out[9] == (7, 2)


def test_hash_split_deterministic_and_exhaustive(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    a = {r.doc_id: r.split for r in with_split(df, "doc_id").collect()}
    # repartitioning must not change any assignment (the whole point vs rand)
    b = {r.doc_id: r.split for r in with_split(df.repartition(7), "doc_id").collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in a.values() if v == "train")
    assert 300 < n_train < 480  # ~80% of 500, loose band


def test_hash_bucket_range(spark):
    rows = (
        spark.createDataFrame([(i,) for i in range(200)], "k bigint")
        .select(hash_bucket("k").alias("b"))
        .collect()
    )
    assert all(0 <= r.b < 100 for r in rows)


def test_stratified_sample_respects_fractions_and_salt(spark):
    from yfinance_etl_spark.operators.sampling import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, stratum string")
    out = stratified_sample(df, "stratum", {"a": 0.5}, "doc_id", default_fraction=0.1)
    got = out.groupBy("stratum").count().collect()
    by = {r.stratum: r["count"] for r in got}
    assert 400 < by.get("a", 0) < 600  # ~50% of 1000
    assert 50 < by.get("b", 0) < 160  # ~10% of 1000
    # repartition-stable (the determinism contract)
    again = stratified_sample(
        df.repartition(13), "stratum", {"a": 0.5}, "doc_id", default_fraction=0.1
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # a different salt draws a different sample (split-independence knob)
    other = stratified_sample(
        df, "stratum", {"a": 0.5}, "doc_id", default_fraction=0.1, salt="other"
    )
    assert {r.doc_id for r in other.collect()} != {r.doc_id for r in out.collect()}


def test_pack_shards_matches_sequential_prefix_sum(spark):
    from yfinance_etl_spark.operators.sampling import pack_shards

    weights = [(i, 10 + (i * 7) % 50) for i in range(500)]
    df = spark.createDataFrame(weights, "k bigint, w bigint")
    out = {r.k: r.shard_id for r in pack_shards(df, "w", "k", budget=300, num_ranges=8).collect()}
    run, expect = 0, {}
    for k, w in weights:  # already in key order
        expect[k] = run // 300
        run += w
    assert out == expect
    # shard ids are contiguous from 0
    assert set(out.values()) == set(range(max(out.values()) + 1))


def test_pack_shards_exact_at_partial_sampling_scale(spark):
    # 200k rows / 16 ranges: repartitionByRange samples only a SUBSET of
    # rows for its boundaries and re-samples per execution. Round 5 shipped
    # without the localCheckpoint pin and assigned wrong shard ids to ~2/3
    # of rows at this size (offsets from execution 1 applied to execution
    # 2's different partitioning) — this is the regression test for that.
    from yfinance_etl_spark.operators.sampling import pack_shards

    n, budget = 200_000, 9_999
    df = (
        spark.range(n, numPartitions=16)
        .withColumnRenamed("id", "k")
        .withColumn("w", (F.col("k") * 7919 % 97 + 1).cast("long"))
    )
    out = pack_shards(df, "w", "k", budget=budget, num_ranges=16).collect()
    run, expect = 0, {}
    for k in range(n):  # key order
        expect[k] = run // budget
        run += k * 7919 % 97 + 1
    got = {r.k: r.shard_id for r in out}
    wrong = sum(1 for k, s in got.items() if expect[k] != s)
    assert wrong == 0, f"{wrong}/{n} rows got a wrong shard id"


def test_tfidf_scores_match_hand_computation(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date date")],
        "doc_id bigint, text string",
    )
    out = {(r.doc_id, r.term): (r.tf, r.tfidf) for r in tfidf_top_terms(docs, k=2).collect()}
    # 'apple' appears in 1 doc → idf = ln(3/1); tf=2
    assert out[(1, "apple")] == (2, round(2 * math.log(3.0), 6))
    # 'banana' in 2 docs → idf = ln(3/2)
    assert out[(1, "banana")] == (1, round(math.log(1.5), 6))
    # every doc returns at most k terms
    docs_terms = {}
    for (d, _t), _ in out.items():
        docs_terms[d] = docs_terms.get(d, 0) + 1
    assert all(v <= 2 for v in docs_terms.values())


def test_salted_join_equals_plain_join(spark):
    # skewed facts: key 1 is hot
    facts = spark.createDataFrame(
        [(1, float(i)) for i in range(50)] + [(2, 5.0), (3, 7.0)], "k bigint, v double"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (4, "unmatched")], "k bigint, lbl string")
    plain = facts.join(dim, "k").groupBy("lbl").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 3).alias("s")
    )
    salted = salted_join(facts, dim, "k", n_salt=4).groupBy("lbl").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 3).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_connected_components_raises_on_non_convergence(spark):
    import pytest

    # chain 1-2-3 needs 2 propagation rounds; max_iter=1 must raise, not
    # return half-propagated labels
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, [(1, 2), (2, 3)]), max_iter=1)


def test_kmeans_seeds_from_sparse_offset_ids(spark):
    from yfinance_etl_spark.operators.clustering import kmeans

    # ids 100,200,...,600: filter(vec_id < k) would seed ZERO centroids;
    # the order-by-limit seed must yield exactly k
    rows = [(100 * (i + 1), [float(i), float(i % 3)]) for i in range(6)]
    embs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assigned, centroids = kmeans(embs, k=2, iters=1)
    assert centroids.count() == 2
    assert assigned.count() == 6
    assert {r.cent_id for r in centroids.select("cent_id").collect()} <= {100, 200}


def test_kmeans_preserves_k_when_a_cluster_starves(spark):
    # r9 (ADVICE/verdict): duplicate seed vectors — the two smallest
    # vec_ids carry IDENTICAL coordinates, so round 1's tie-break sends
    # EVERY point to cent_id 0 and cluster 1 captures nothing. The old
    # code silently returned k-1 centroids; the farthest-point reseed must
    # keep k=2 with the starved id re-used, and the reseeded centroid must
    # be the max-d2 point (vec_id tie-break)
    from yfinance_etl_spark.operators.clustering import kmeans

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),  # duplicate of seed 0 -> cluster 1 starves
        (2, [5.0, 5.0]),
        (3, [6.0, 6.0]),  # farthest from centroid 0 -> the reseed target
    ]
    embs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assigned, centroids = kmeans(embs, k=2, iters=2)
    cents = {r.cent_id: list(r.cent) for r in centroids.collect()}
    assert set(cents) == {0, 1}, f"k collapsed: {cents}"
    # after the round-2 recompute under reseeded c1=(6,6): c0 captures
    # {0,1,2}, c1 captures {3} — both clusters populated, k preserved
    members = {
        r.cent_id
        for r in assigned.select("cent_id").distinct().collect()
    }
    assert members == {0, 1}


def test_kmeans_starvation_reseed_is_deterministic(spark):
    # same adversarial input twice -> bit-identical centroids (no RNG in
    # the reseed path)
    from yfinance_etl_spark.operators.clustering import kmeans

    rows = [
        (0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [6.0, 6.0]),
    ]
    embs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    runs = [
        {r.cent_id: list(r.cent) for r in kmeans(embs, k=2, iters=2)[1].collect()}
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_kmeans_tol_converges_to_the_fixed_iter_answer(spark):
    # two tight, well-separated blobs: Lloyd converges after one round, so
    # tol-mode must stop early AND land on the same centroids the fixed
    # 5-round run reaches
    from yfinance_etl_spark.operators.clustering import kmeans

    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(4)] + [
        (10 + i, [5.0 + 0.01 * i, 5.0]) for i in range(4)
    ]
    embs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    _, fixed = kmeans(embs, k=2, iters=5)
    _, early = kmeans(embs, k=2, iters=5, tol=1e-9)
    as_map = lambda df: {  # noqa: E731
        r.cent_id: list(r.cent) for r in df.collect()
    }
    assert as_map(fixed) == as_map(early)


def test_salted_join_rejects_dim_preserving_how(spark):
    import pytest

    facts = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, lbl string")
    for how in ("right", "full", "outer", "full_outer", "rightouter", "cross"):
        with pytest.raises(ValueError, match="not fact-preserving"):
            salted_join(facts, dim, "k", n_salt=4, how=how)
    # left outer keeps working (fact-preserving): unmatched FACT rows survive once
    facts2 = spark.createDataFrame([(1, 1.0), (9, 2.0)], "k bigint, v double")
    out = salted_join(facts2, dim, "k", n_salt=4, how="left").collect()
    assert len(out) == 2


def test_salted_join_spreads_hot_key(spark):
    facts = spark.createDataFrame([(1, float(i)) for i in range(40)], "k bigint, v double")
    dim = spark.createDataFrame([(1, "hot")], "k bigint, lbl string")
    salted = "__salt"
    row_fp = F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in facts.columns]))
    n_salts = (
        facts.withColumn(salted, F.pmod(row_fp, F.lit(4)))
        .select(salted)
        .distinct()
        .count()
    )
    assert n_salts > 1  # the hot key's rows really do take multiple sub-keys


def test_connected_components_rejects_nonpositive_max_iter(spark):
    # max_iter=0 used to skip the loop, leave `changed` None, and return
    # every node as its own component — silently, past the convergence
    # guard the docstring promises
    import pytest

    with pytest.raises(ValueError, match="max_iter"):
        connected_components(_edges(spark, [(1, 2)]), max_iter=0)


def test_null_keys_get_deterministic_buckets_not_silent_drops(spark):
    # md5(NULL) is NULL, so before the sentinel a NULL-keyed row fell out
    # of every split and every sample — even at fraction 1.0
    from yfinance_etl_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(None, "a"), (1, "a"), (None, "b")], "doc_id bigint, stratum string"
    )
    kept = stratified_sample(df, "stratum", {"a": 1.0, "b": 1.0}, "doc_id").collect()
    assert len(kept) == 3  # fraction 1.0 keeps EVERY row, NULL keys included

    none_dropped = stratified_sample(df, "stratum", {"a": 0.0}, "doc_id",
                                     default_fraction=0.0).count()
    assert none_dropped == 0  # and fraction 0 still drops them

    splits = with_split(df, key="doc_id").select("split").collect()
    assert all(r.split in ("train", "val", "test") for r in splits)


def test_pack_shards_exact_past_double_precision(spark):
    # cumulative weights beyond 2^53: the old float division rounded the
    # prefix, putting boundary rows one shard off; integer `div` is exact
    from yfinance_etl_spark.operators.sampling import pack_shards

    big = 1 << 53
    rows = [(0, big), (1, 1), (2, 1)]  # prefixes: 0, 2^53, 2^53 + 1
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    got = {r.k: r.shard_id for r in pack_shards(df, "w", "k", budget=1).collect()}
    # float(2^53 + 1) == float(2^53) would collapse rows 1 and 2 into the
    # same shard; exact arithmetic keeps them distinct
    assert got == {0: 0, 1: big, 2: big + 1}


# ---------------------------------------------------------------------------
# Weighted deterministic sampling (Efraimidis-Spirakis on md5 uniforms)
# ---------------------------------------------------------------------------


def _es_key(doc_id: int, w: float, salt: str = "ws") -> float:
    import hashlib
    import math

    h = int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8], 16)
    return math.log((h + 1) / 4294967296.0) / w


def test_weighted_sample_matches_reference_topk(spark):
    from yfinance_etl_spark.operators.sampling import weighted_sample

    rows = [(i, float(10 + 7 * (i % 13))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = [r.doc_id for r in weighted_sample(df, "w", "doc_id", k=20).collect()]
    want = sorted(rows, key=lambda r: (-_es_key(r[0], r[1]), r[0]))[:20]
    assert got == [i for i, _ in want]


def test_weighted_sample_partition_invariant(spark):
    from yfinance_etl_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 + (i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    one = [r.doc_id for r in weighted_sample(df.coalesce(1), "w", "doc_id", k=25).collect()]
    many = [r.doc_id for r in weighted_sample(df.repartition(13), "w", "doc_id", k=25).collect()]
    assert one == many


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    from yfinance_etl_spark.operators.sampling import weighted_sample

    rows = [(0, 5.0), (1, 0.0), (2, -3.0), (3, None), (4, 2.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = {r.doc_id for r in weighted_sample(df, "w", "doc_id", k=10).collect()}
    assert got == {0, 4}


def test_weighted_sample_is_weight_proportional(spark):
    """Statistical sanity on the A-ES math itself: with one doc 50× the
    weight of the rest, it must appear in a small sample (its inclusion
    probability ≈ 1), and a k=n sample returns everything."""
    from yfinance_etl_spark.operators.sampling import weighted_sample

    rows = [(i, 50.0 if i == 7 else 1.0) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    top5 = {r.doc_id for r in weighted_sample(df, "w", "doc_id", k=5).collect()}
    assert 7 in top5
    assert weighted_sample(df, "w", "doc_id", k=40).count() == 40


def test_temperature_rates_hand_computed(spark):
    """Skewed two-strata fixture at T=2, budget 0.8N: rates follow
    B·sqrt(n)/Z/n with the tail stratum boosted past the cap."""
    import math

    from yfinance_etl_spark.operators.sampling import temperature_rates

    counts = spark.createDataFrame(
        [("head", 900), ("tail", 100)], "stratum string, n_docs long"
    )
    got = {
        r.stratum: (r.n_docs, r.rate_ppm)
        for r in temperature_rates(counts, "stratum").collect()
    }
    z = math.sqrt(900) + math.sqrt(100)
    b = 0.8 * 1000
    exp_head = round(1e6 * b * math.sqrt(900) / z / 900)
    exp_tail = min(1_000_000, round(1e6 * b * math.sqrt(100) / z / 100))
    assert got == {"head": (900, exp_head), "tail": (100, exp_tail)}
    assert got["tail"][1] == 1_000_000  # boosted past the cap
    assert got["head"][1] < 1_000_000


def test_temperature_one_is_uniform_downsample(spark):
    # T=1: q_s = p_s, so every stratum gets the same per-row rate B/N
    from yfinance_etl_spark.operators.sampling import temperature_rates

    counts = spark.createDataFrame(
        [("a", 700), ("b", 200), ("c", 100)], "stratum string, n_docs long"
    )
    rates = {
        r.stratum: r.rate_ppm
        for r in temperature_rates(counts, "stratum", temperature=1.0,
                                   budget_frac=0.5).collect()
    }
    assert len(set(rates.values())) == 1
    assert abs(next(iter(rates.values())) - 500_000) <= 1


def test_temperature_mix_partition_invariant_and_tail_boosted(spark):
    from yfinance_etl_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang"
    )
    base = {r.doc_id for r in temperature_mix(docs, "lang", "doc_id").collect()}
    re = {
        r.doc_id
        for r in temperature_mix(docs.repartition(17), "lang", "doc_id").collect()
    }
    assert base == re  # membership derives from (salt, key) alone
    # flattening must lift the tail's sampled SHARE above its natural share
    import collections

    nat = collections.Counter(r.lang for r in docs.collect())
    samp = collections.Counter(
        r.lang for r in temperature_mix(docs, "lang", "doc_id").collect()
    )
    tail = min(nat, key=nat.get)
    head = max(nat, key=nat.get)
    assert samp[tail] / nat[tail] > samp[head] / nat[head]


def test_dsir_log_weights_hand_computed(spark):
    """Tiny two-vocabulary corpus: replicate the hashed-unigram DSIR
    formula in Python (same md5 buckets, Laplace smoothing, 6dp
    quantization) and check values + ordering."""
    import hashlib
    import math

    from yfinance_etl_spark.operators.sampling import dsir_log_weights

    rows = [
        (0, "en", "alpha alpha alpha"),
        (1, "en", "alpha beta"),
        (2, "de", "beta beta beta beta"),
        (3, "de", "alpha beta beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    from pyspark.sql import functions as F

    got = {
        r.doc_id: (r.n_toks, r.logw)
        for r in dsir_log_weights(docs, F.col("lang") == "en").collect()
    }

    def f(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16)

    c_raw, c_tgt = {}, {}
    for _, lang, text in rows:
        for tok in text.split():
            c_raw[f(tok)] = c_raw.get(f(tok), 0) + 1
            if lang == "en":
                c_tgt[f(tok)] = c_tgt.get(f(tok), 0) + 1
    t_raw, t_tgt = sum(c_raw.values()), sum(c_tgt.values())
    lr = {
        k: round(
            math.log(((c_tgt.get(k, 0) + 1) / (t_tgt + 256))
                     / ((c_raw[k] + 1) / (t_raw + 256))), 6)
        for k in c_raw
    }
    for doc_id, lang, text in rows:
        n, w = got[doc_id]
        assert n == len(text.split())
        exp = round(sum(lr[f(tok)] for tok in text.split()), 6)
        assert abs(w - exp) < 1e-6, (doc_id, w, exp)
    # the all-target-vocabulary doc outranks the all-raw-vocabulary doc
    assert got[0][1] > got[2][1]


def test_dsir_null_predicate_counts_as_nontarget(spark):
    """r9 advice: `(lang == 'en')` is NULL for NULL lang; a bare
    .cast('int') propagated that NULL into SUM(__tgt), poisoning every
    feature bucket the row touches (NULL log-ratio → NULL logw for ALL
    docs sharing the bucket) while the oracle's CASE WHEN ... ELSE 0
    stayed finite. NULL-pred rows must count as plain non-target."""
    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.sampling import dsir_log_weights

    rows = [
        (0, "en", "alpha alpha"),
        (1, None, "alpha beta"),  # NULL lang shares both vocab buckets
        (2, "de", "beta beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {r.doc_id: r.logw for r in dsir_log_weights(docs, F.col("lang") == "en").collect()}
    assert set(got) == {0, 1, 2}
    assert all(w is not None for w in got.values())
    # identical weights to an explicitly-false predicate for the NULL row
    want = {
        r.doc_id: r.logw
        for r in dsir_log_weights(
            docs, F.coalesce(F.col("lang") == "en", F.lit(False))
        ).collect()
    }
    assert got == want


def test_dsir_partition_invariant(spark):
    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.sampling import dsir_log_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    a = {(r.doc_id, r.n_toks, r.logw)
         for r in dsir_log_weights(docs, F.col("lang") == "en").collect()}
    b = {(r.doc_id, r.n_toks, r.logw)
         for r in dsir_log_weights(
             docs.repartition(13), F.col("lang") == "en").collect()}
    assert a == b


def test_temperature_mix_samples_null_strata(spark):
    """NULL-stratum rows must stay sampleable (r9 review: the plain
    equi-join silently dropped them while their count still inflated the
    budget and normalizer)."""
    from pyspark.sql import functions as F

    from yfinance_etl_spark.operators.sampling import temperature_mix

    rows = [(i, "a" if i % 2 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = temperature_mix(df, "lang", "doc_id", budget_frac=0.9)
    by = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    # both strata (including NULL) contribute sampled rows
    assert by.get("a", 0) > 0 and by.get(None, 0) > 0
    # rates carried through are per-stratum: 100 docs each
    assert {r.n_docs for r in out.select("n_docs").distinct().collect()} == {100}


def test_temperature_mix_oracle_agrees_on_null_strata(spark):
    """r9 advice: _TMIX_SQL's old `JOIN r USING (lang)` dropped NULL-lang
    rows from sampling while still counting them into c/z, so operator
    and oracle diverged the moment a fixture gained a NULL lang. The
    IS NOT DISTINCT FROM join must replay the operator's \\x00-sentinel
    semantics exactly — pinned here on a NULL-bearing mini-corpus."""
    import duckdb
    import pandas as pd

    from yfinance_etl_spark.operators.sampling import temperature_mix
    from yfinance_etl_spark.plans.queries import _TMIX_FRAC, _TMIX_SQL, _TMIX_T

    rows = [(i, ["en", "de", None][i % 3]) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    sampled = temperature_mix(
        docs, "lang", "doc_id", temperature=_TMIX_T, budget_frac=_TMIX_FRAC
    )
    got = {
        (r.lang, r.n_docs, r.rate_ppm, r.n_sampled)
        for r in sampled.groupBy("lang", "n_docs", "rate_ppm")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .collect()
    }
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "lang"])
    )
    want = {tuple(r) for r in con.execute(_TMIX_SQL).fetchall()}
    con.close()
    assert got == want
    assert any(r[0] is None and r[3] > 0 for r in got)  # NULL stratum sampled


def test_pack_documents_boundaries_and_order(spark):
    """Hand-checkable sequence assembly: doc_id order inside each shard,
    separator arithmetic in the boundary offsets, singleton shards, and
    the seq reconstructing exactly from (boundaries, texts)."""
    from yfinance_etl_spark.operators.sampling import pack_documents

    df = spark.createDataFrame(
        [(0, "aaa bb", 2), (1, "cccc", 1), (2, "dd ee ff", 3), (3, "g", 1)],
        "doc_id bigint, text string, n_tokens int",
    )
    got = {r.shard_id: r for r in pack_documents(df, budget=3).collect()}
    assert set(got) == {0, 1, 2}
    r0 = got[0]
    assert (r0.n_docs, r0.seq_text, r0.boundaries) == (2, "aaa bb\n\ncccc", "0|8")
    assert (got[1].n_docs, got[1].seq_text, got[1].boundaries) == (1, "dd ee ff", "0")
    assert (got[2].n_docs, got[2].seq_text, got[2].boundaries) == (1, "g", "0")
    # reconstruction: each boundary offset points at its doc's first char
    for r in got.values():
        offs = [int(x) for x in r.boundaries.split("|")]
        docs = r.seq_text.split("\n\n")
        pos = 0
        for off, d in zip(offs, docs):
            assert off == pos and r.seq_text[off : off + len(d)] == d
            pos += len(d) + 2


def test_pack_documents_raises_loudly_on_null_text(spark):
    """The enforced non-NULL contract (r11 ADVICE): a NULL text must
    raise at execution naming the doc — never vanish silently from
    seq_text while its boundary offsets go missing."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    from yfinance_etl_spark.operators.sampling import pack_documents

    df = spark.createDataFrame(
        [(0, "aaa bb", 2), (1, None, 1), (2, "dd", 1)],
        "doc_id bigint, text string, n_tokens int",
    )
    with pytest.raises(
        (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException)
    ) as exc:
        pack_documents(df, budget=3).collect()
    assert "NULL text at doc_id=1" in str(exc.value)


def test_pagerank_quantized_recursion_hand_replayed(spark):
    """pagerank on a path graph 1-2-3, replayed exactly in Python with
    the same quantization schedule (9 dp contributions, decimal-exact
    sums, 9 dp ranks, 9 dp-quantized teleport): the center must
    out-rank the leaves, the leaves tie by symmetry, mass stays ~1, and
    every value matches the quantized recursion bit-for-bit — the same
    determinism contract the DuckDB oracle relies on."""
    import pytest as _pytest

    from yfinance_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src bigint, dst bigint"
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}

    # python replay of the exact quantized recursion
    deg = {1: 1, 2: 2, 3: 1}
    n = 3
    # quantized to the shared 9 dp grid, same as the engine + oracle
    teleport = round((1.0 - 0.85) / n, 9)
    ranks = {v: round(1.0 / n, 9) for v in deg}
    sym = [(1, 2), (2, 1), (2, 3), (3, 2)]
    for _ in range(3):
        c = {v: round(ranks[v] / deg[v], 9) for v in deg}
        s = {v: 0.0 for v in deg}
        for a, b in sym:
            s[b] += c[a]  # contributions are 9dp-quantized: sums exact
        ranks = {v: round(teleport + 0.85 * s[v], 9) for v in deg}

    assert got == ranks, (got, ranks)
    assert got[2] > got[1] and got[1] == got[3]
    assert abs(sum(got.values()) - 1.0) < 1e-5
    with _pytest.raises(ValueError, match="iters"):
        pagerank(edges, iters=0)


def test_quota_sample_largest_remainder_exact_counts(spark):
    """Hand-checkable Hamilton apportionment: strata of 64/16/4 docs give
    sqrt weights 8/4/2 (Z=14 exactly). total=10 -> quotas 5.714/2.857/
    1.428, floors 5/2/1, two leftovers to the largest fractions (B .857,
    A .714) -> EXACT allocs 6/3/1. total=80 -> C's quota (11.4) exceeds
    its 4 docs: the cap binds, C contributes everything it has, and the
    shortfall is visible (alloc > picked, total picked < 80) instead of
    silently reshuffled. Deterministic across runs; total<0 fails."""
    import pytest as _pytest

    from yfinance_etl_spark.operators.sampling import quota_sample

    rows = (
        [(i, "A") for i in range(64)]
        + [(100 + i, "B") for i in range(16)]
        + [(200 + i, "C") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out10 = quota_sample(df, "source", key="doc_id", total=10)
    c10 = {r.source: r["count"] for r in out10.groupBy("source").count().collect()}
    assert c10 == {"A": 6, "B": 3, "C": 1}
    allocs = {r.source: r.alloc for r in out10.select("source", "alloc").distinct().collect()}
    assert allocs == {"A": 6, "B": 3, "C": 1}

    out80 = quota_sample(df, "source", key="doc_id", total=80)
    c80 = {r.source: r["count"] for r in out80.groupBy("source").count().collect()}
    assert c80["C"] == 4 and c80["B"] == 16  # caps bind: all they have
    assert c80["A"] == 46  # 45 + 1 largest-remainder leftover
    assert sum(c80.values()) == 66 < 80  # shortfall visible, not hidden
    alloc_c = out80.filter(F.col("source") == "C").select("alloc").first()[0]
    assert alloc_c > 4  # the unmet quota stays visible next to the 4 picked

    # deterministic: identical doc_id set on a second run
    again = {r.doc_id for r in quota_sample(df, "source", key="doc_id", total=10).collect()}
    assert again == {r.doc_id for r in out10.collect()}

    with _pytest.raises(ValueError, match="total"):
        quota_sample(df, "source", key="doc_id", total=-1)


def test_quota_sample_prefilter_is_exact_and_fallback_covers_undershoot(
    spark, monkeypatch
):
    """The r15 two-phase pick must be invisible in the OUTPUT: rows AND
    pick ranks equal an independent full-sort reference (hashlib md5 over
    the whole stratum), because hex-prefix order is string order — every
    row preceding a survivor is itself a survivor, so survivor ranks are
    full ranks. Then the margins are shrunk to force the gate: margin 0
    undershoots ~half the strata, margin -1e9 kills EVERY survivor —
    both must route through the fallback and still produce the identical
    result (the gate is a correctness guarantee, not a heuristic)."""
    import hashlib

    from yfinance_etl_spark.operators import sampling
    from yfinance_etl_spark.operators.sampling import quota_sample

    rows = (
        [(i, "A") for i in range(300)]
        + [(1000 + i, "B") for i in range(60)]
        + [(2000 + i, "C") for i in range(9)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def reference(total):
        by_stratum: dict[str, list[tuple[str, int]]] = {}
        for i, s in rows:
            by_stratum.setdefault(s, []).append(
                (hashlib.md5(f"quota:{i}".encode()).hexdigest(), i)
            )
        # alloc straight from the operator's own stratum-sized arithmetic
        # (tested independently above); what's under test here is the PICK
        allocs = {
            r.source: r.alloc
            for r in quota_sample(df, "source", key="doc_id", total=total)
            .select("source", "alloc")
            .distinct()
            .collect()
        }
        out = set()
        for s, lst in by_stratum.items():
            for rank, (_, i) in enumerate(sorted(lst), start=1):
                if rank <= allocs.get(s, 0):
                    out.add((i, rank))
        return out

    want = reference(total=40)
    got = {
        (r.doc_id, r.pick)
        for r in quota_sample(df, "source", key="doc_id", total=40).collect()
    }
    assert got == want

    # margin 0: the survivor count is ~Binomial(n, alloc/n) — roughly
    # half the strata undershoot and take the gated fallback
    monkeypatch.setattr(sampling, "_PICK_MARGIN_SQRT", 0.0)
    monkeypatch.setattr(sampling, "_PICK_MARGIN_ABS", 0.0)
    got0 = {
        (r.doc_id, r.pick)
        for r in quota_sample(df, "source", key="doc_id", total=40).collect()
    }
    assert got0 == want

    # negative margin: bound <= 0 keeps nothing, every stratum fails the
    # gate, the result is pure-fallback — and still identical
    monkeypatch.setattr(sampling, "_PICK_MARGIN_ABS", -1e9)
    gotneg = {
        (r.doc_id, r.pick)
        for r in quota_sample(df, "source", key="doc_id", total=40).collect()
    }
    assert gotneg == want
