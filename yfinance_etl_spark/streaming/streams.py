"""Structured Streaming surface — SURVEY.md §2.10 (St1-St5).

The reference is batch-only (its "incremental" mode is re-running the ETL,
src/etl.py:16-40); this module is the engine's forward-looking streaming
path over the same event model. Idiomatic shape:

    readStream (file source, explicit schema)
      → event-time watermark
      → tumbling / sliding / session windows, stateful dedup
      → writeStream (memory sink here; parquet/Kafka in production)
    with Trigger.AvailableNow so a fixture directory is processed to
    completion and the result is deterministic — which is what lets the
    DuckDB batch oracle check it (streams and batch share semantics on
    bounded input; that equivalence IS the correctness claim).

Scale notes (1000-executor reality, not local[32]):
* The file source lists + partitions input files across executors; state
  (window aggs, dedup keys) lives in the executor-local state store keyed
  by the shuffle partition — so both data AND state scale horizontally.
* Watermarks bound state: without them, windowed agg state grows without
  limit. Every stateful query here sets one.
* The memory sink is for tests/fixtures only — it collects results to the
  driver. Production sinks (parquet via ``sink.write_partitioned``, Kafka)
  keep output distributed.
"""

from __future__ import annotations

import itertools
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yfinance_etl_spark.catalog import _enable_nanos_as_long, event_time, ns_ts_to_micros
from yfinance_etl_spark.functions.scalar import STAT_SCALE, davg, dsum, r6
from yfinance_etl_spark.scratch import scratch_dir

_uid = itertools.count()

#: serializes the session-global shuffle-partition set/start/restore window
#: in run_to_memory (see its docstring)
_SHUFFLE_CONF_LOCK = threading.Lock()


def _stage_dir(path: str) -> str:
    """The file-stream source monitors a DIRECTORY; the fixture table is a
    bare parquet file. Stage it behind a symlink in a scratch dir (a real
    deployment points the source at the landing directory itself)."""
    d = scratch_dir("yfinance_etl_stream", path)
    link = os.path.join(d, os.path.basename(path))
    # lexists, not exists: exists() follows the symlink, so a BROKEN link
    # (fixture regenerated/moved since the scratch dir was created) reads
    # as absent and the re-symlink raises FileExistsError; unlink stale
    # links first
    if os.path.lexists(link) and not os.path.exists(link):
        os.unlink(link)
    if not os.path.lexists(link):
        os.symlink(path, link)
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St1: streaming scan of the events table.

    File-source streams require an explicit schema (no inference at start);
    we take it from a metadata-only batch read of the same path, which also
    inherits the nanosAsLong handling, then apply the catalog's ns→µs
    conversion (legacy nanos-as-long fixtures) and the NTZ→TIMESTAMP cast
    (current micros/NTZ fixtures) so event time is watermark-legal.
    """
    path = f"{sf_dir}/events.parquet"
    _enable_nanos_as_long(spark)
    schema = spark.read.parquet(path).schema
    src = path if os.path.isdir(path) else _stage_dir(path)
    return event_time(ns_ts_to_micros(spark.readStream.schema(schema).parquet(src)))


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """St1 for the document corpus: streaming scan of the documents table
    — the ingest side of the continuous (streaming) delta-dedup pipeline.
    Same explicit-schema + staged-directory handling as the events
    stream; documents carry no event time, so no watermark plumbing."""
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    src = path if os.path.isdir(path) else _stage_dir(path)
    return spark.readStream.schema(schema).parquet(src)


def run_to_memory(df: DataFrame, mode: str, state_partitions: int | None = 4) -> DataFrame:
    """Execute a streaming plan to completion (AvailableNow) into a memory
    sink and return the result as a batch DataFrame.

    ``state_partitions`` scopes ``spark.sql.shuffle.partitions`` around the
    run (restored after): a stateful query materializes one state store
    PER shuffle partition PER stateful operator, and on the bounded fixture
    streams that per-store setup overhead dominates — 8 stores run the
    tumbling fixture 3× faster than 32, and 4 shaves a further 0.3-0.8 s
    per query (measured r7; ≥2 kept so multi-partition state stays
    exercised). The right number tracks key
    cardinality × event rate, NOT the batch shuffle default: a production
    deployment at real rate passes None (keep the session value) or sizes
    it to executor-cores × a small factor. Results are identical for any
    value — partitioning is physical only.

    The conf scoping mutates SESSION-global state, so the set/start/restore
    window is serialized behind a module lock: two overlapping calls (or a
    concurrent batch query on the same session) could otherwise observe or
    restore the temporary value and permanently lower the session default.
    The lock covers this helper only — callers running batch queries
    concurrently on the same session during a streaming run still see the
    temporary value, which is physical-only (results unaffected).
    """
    spark = df.sparkSession
    name = f"stream_result_{next(_uid)}"
    with _SHUFFLE_CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def run_update_processing_trigger(
    df: DataFrame,
    interval: str = "50 milliseconds",
    state_partitions: int | None = 4,
    drained_state_rows: int | None = None,
    timeout_sec: float = 60.0,
) -> DataFrame:
    """Execute a stateful streaming plan under a REAL processing-time
    trigger into a memory sink and return the published rows as a batch
    frame — the runner the TTL'd ``ema_stream`` form needs, because
    ProcessingTimeTimeout eviction only fires under a continuous
    trigger (AvailableNow loops forever in its "no new data but
    cleaning up state" phase — measured, see ``ema_stream``).

    Stop policy: poll progress until the source is EXHAUSTED (a trigger
    with zero input rows after at least one that carried data — the
    file source hands out files in order, so an empty tick means none
    are pending), then, when ``drained_state_rows`` is given, keep
    ticking until the state store holds at most that many rows (TTL
    eviction observed) or ``timeout_sec`` elapses. Published output is
    complete at exhaustion either way — eviction removes state, never
    un-publishes — so the timeout degrades the state OBSERVATION, not
    the result. Same shuffle-conf scoping + lock discipline as
    ``run_to_memory``."""
    import time as _time

    spark = df.sparkSession
    name = f"stream_result_{next(_uid)}"
    with _SHUFFLE_CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(processingTime=interval)
                .start()
            )
            deadline = _time.time() + timeout_sec
            while _time.time() < deadline:
                prog = list(q.recentProgress)
                fed = any(p["numInputRows"] > 0 for p in prog)
                empty_after = fed and prog[-1]["numInputRows"] == 0
                if empty_after:
                    if drained_state_rows is None:
                        break
                    ops = prog[-1]["stateOperators"]
                    if ops and ops[0]["numRowsTotal"] <= drained_state_rows:
                        break
                _time.sleep(0.2)
            q.stop()
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """St2: tumbling event-time window per event_type with a 1h watermark."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r6(dsum("value", STAT_SCALE)).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_avg(events: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """St2: sliding (overlapping) event-time windows — each event lands in
    width/slide windows."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r6(davg("value", STAT_SCALE)).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "avg_value")
    )


def session_rollup(events: DataFrame, gap: str = "6 hours") -> DataFrame:
    """St4: gap-based session windows per user — a session closes after
    ``gap`` of inactivity; session end = last event + gap."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r6(dsum("value", STAT_SCALE)).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def ema_stream(
    events: DataFrame, alpha: float = 0.1, ttl_ms: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator (the W5 EMA as a stream): per-key
    exponential moving average maintained in ``applyInPandasWithState``.

    This is the engine's template for stateful logic Spark's built-ins
    can't express: Arrow-batched groups in, explicit GroupState carrying
    (ema, count) across micro-batches, update-mode emission. On bounded
    input the final state equals the batch EMA — which is what the DuckDB
    ``list_reduce`` oracle checks. Rows fold in (ts, event_id) order so
    the recursion is deterministic.

    ``ttl_ms`` is the production eviction policy (r12 verdict item 5):
    per-key EMA state is inherent, but on an UNBOUNDED key population
    (a crawl's users) NoTimeout state grows with every key ever seen,
    forever. With a TTL, each update arms a ProcessingTimeTimeout; a key
    with no arrivals for ``ttl_ms`` has its state REMOVED on a later
    trigger (no emission — the last published row already carries its
    final EMA), so the store tracks ACTIVE keys, not stream history.
    Eviction resets the recursion: a key that returns after its TTL
    starts a fresh EMA over post-eviction rows only — the stated
    semantics of an activity-windowed metric, test-pinned against the
    batch twin on the active window. ttl_ms=None (the registered
    query's form) keeps NoTimeout: bit-identical to pre-r13 behavior,
    and the bounded-fixture oracle requires the full-history fold.

    CONSTRAINT (measured, not theoretical): ProcessingTimeTimeout is a
    continuous-trigger feature — under Trigger.AvailableNow the engine
    enters a "no new data but cleaning up state" phase that never
    drains (hundreds of empty batches observed). Run TTL'd streams with
    a processing-time trigger; the fixture/oracle path uses ttl_ms=None
    precisely so it stays AvailableNow-terminable.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # computed once, outside the fold. For the registry's alpha=0.1 this is
    # bit-identical to the oracle lambda's 0.9 literal (1.0 - 0.1 rounds to
    # exactly the double 0.9), and for any other alpha the weights actually
    # sum to 1 — the previous hardcoded 0.9 made every non-default alpha a
    # non-EMA, guarded only by an assert that python -O strips
    comp = 1.0 - alpha

    def update(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # TTL fired with no new data: drop the key's state entirely.
            # Nothing is emitted — update mode already published the
            # key's last EMA when it last changed.
            state.remove()
            return
        ema, n = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for v in rows["value"]:
            ema = float(v) if ema is None else alpha * float(v) + comp * ema
        n += len(rows)
        state.update((ema, n))
        if ttl_ms is not None:
            # re-arm on every arrival: the clock measures INACTIVITY
            state.setTimeoutDuration(ttl_ms)
        # no Python round() here: banker's rounding differs from SQL ROUND
        # at .5 boundaries — callers round with F.round (HALF_UP, oracle-equal)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ema_value": [ema]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        "user_id long, n_events long, ema_value double",
        "ema double, n long",
        "update",
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_foreachbatch(
    df: DataFrame,
    batch_fn,
    checkpoint_dir: str,
    state_partitions: int | None = 4,
) -> list:
    """Execute a streaming plan to completion (AvailableNow) through
    ``foreachBatch`` — the per-micro-batch production shape for
    compositions whose aggregation must be BATCH-LOCAL rather than
    stream-lifetime stateful. ``batch_fn(batch_df, batch_id)`` receives
    each micro-batch as a plain BATCH DataFrame (every batch operator is
    legal inside — multi-pass joins, groupBy, even localCheckpoint) and
    is responsible for its own idempotent writes (append to a parquet
    dir here; MERGE into a table store in production — the checkpoint's
    write-ahead offsets give at-least-once per batch, so the sink write
    carries the exactly-once contract).

    The point of this runner over ``run_to_memory(..., "complete")``: a
    groupBy inside ``batch_fn`` is a plain batch aggregation over ONE
    micro-batch — no streaming state store is created at all, so state
    is bounded by the micro-batch BY CONSTRUCTION, not by a watermark or
    TTL policy. On a continuous crawl that distinction is the difference
    between O(batch) and O(stream lifetime) memory. The returned
    progress list (one dict per micro-batch) lets tests pin exactly
    that: ``progress["stateOperators"] == []`` for every batch.

    Same session-global shuffle-conf scoping (and lock) as
    ``run_to_memory`` — here it sizes the per-batch shuffles, not state
    stores.
    """
    spark = df.sparkSession
    with _SHUFFLE_CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        try:
            q = (
                df.writeStream.foreachBatch(batch_fn)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return list(q.recentProgress)


def run_to_parquet(df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Execute a streaming plan to completion into a PARQUET sink with a
    real checkpoint — the production write path (exactly-once via the
    checkpoint's write-ahead offsets + file-sink manifest), in contrast to
    the driver-side memory sink used for fixtures."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_static_join(events: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream joins
    a BATCH dimension table — the streaming analog of J5's broadcast
    lookup. Stateless (no join state is kept: the dim side is re-resolved
    per micro-batch, so a slowly-changing dimension is picked up on the
    next trigger). The broadcast hint keeps it a map-side hash join — at
    1000 executors the dim ships once per executor, the stream never
    shuffles."""
    return events.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    left_wm: str = "1 hour",
    right_wm: str = "1 hour",
    time: str = "ts",
    left_payload: tuple[str, ...] = ("event_id",),
    right_payload: tuple[str, ...] = ("event_id", "value"),
) -> DataFrame:
    """Stream-stream interval join: match right-side rows that occur on the
    same key within [left.ts, left.ts + within]. Payload columns come back
    prefixed ``l_`` / ``r_`` (defaults match the events-table shape).

    Both sides carry a watermark and the join condition bounds event time
    in BOTH directions — that is what lets Spark evict join state: a
    buffered left row can be dropped once the right watermark passes
    ts + within, and vice versa. Without the time bound the state store
    grows forever; with it, state is O(rate × window) regardless of total
    stream length — the 100 TB/day-safe shape.
    """
    l = left.withWatermark(time, left_wm).select(
        F.col(key).alias("l_key"),
        F.col(time).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left_payload],
    )
    r = right.withWatermark(time, right_wm).select(
        F.col(key).alias("r_key"),
        F.col(time).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_payload],
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    )


def dedup_within_watermark(events: DataFrame, keys: list[str]) -> DataFrame:
    """St5: stateful streaming dedup — first occurrence per key wins; state
    for a key is dropped once the watermark passes it (bounded state, the
    production-correct form of ``dropDuplicates`` on a stream)."""
    return events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(keys)
