"""Join-family operators Spark lacks natively — SURVEY.md §2.3 extensions.

The headline is the **as-of join** (align each left row to the LATEST
right row at-or-before its timestamp, per key) — the workhorse of finance
data (trade↔quote alignment) and attribution pipelines. Spark has no
native ASOF; the naive formulation (per-left-row correlated max) is a
range join that degenerates to a quadratic nested-loop.

The scalable shape used here is union + sort + carry-forward:

    tag sides → unionByName → one Window.partitionBy(key)
      .orderBy(time, side_tag) → last(right_payload, ignorenulls=True)
      over unbounded-preceding → keep left rows

ONE shuffle on the key, one sort — identical cost profile to any keyed
window op, no matter how many right rows precede each left row. The
side-tag sorts right rows BEFORE a left row at the same timestamp, giving
inclusive (ts >= right.ts) semantics, matching DuckDB's native ASOF JOIN
(which the oracle uses, making this one of the few operators checked
against a *native* implementation of itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time: str,
    right_payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_payload`` columns from
    the latest right row with ``right.time <= left.time`` on the same key
    (null-filled when no right row precedes). Payload columns come back
    named ``{prefix}{col}``.

    The payload travels as ONE struct column under a single
    ``last(ignorenulls=True)`` — carrying each column independently would
    stitch values from *different* right rows whenever the matched row has
    a NULL in one payload column, diverging from native ASOF semantics
    (the matched row's NULL must win). A right row whose payload fields
    are all NULL still forms a non-null struct, so it matches and carries
    its NULLs, exactly like DuckDB's ASOF JOIN.

    When several right rows share the same (key, time), the one with the
    LARGEST payload struct (lexicographic over ``right_payload``) wins —
    the payload joins the window's orderBy as the tie-break. Without it,
    ``last(ignorenulls)`` picked whichever tied row the shuffle happened
    to order later: a run-to-run coin flip. (DuckDB's native ASOF leaves
    ties unspecified; this operator chooses to be deterministic.)
    """
    tag = "__is_left"
    pay = "__asof_payload"
    r = right.select(
        F.col(key).alias(key),
        F.col(time).alias(time),
        F.lit(0).alias(tag),
        F.struct(*[F.col(c) for c in right_payload]).alias(pay),
    )
    l_cols = left.columns
    lt = left.select(
        *l_cols,
        F.lit(1).alias(tag),
        F.lit(None).cast(r.schema[pay].dataType).alias(pay),
    )
    u = lt.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time).asc(), F.col(tag).asc(), F.col(pay).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *l_cols,
        F.col(tag),
        F.last(pay, ignorenulls=True).over(w).alias(pay),
    )
    return (
        carried.filter(F.col(tag) == 1)
        .select(
            *l_cols,
            *[F.col(f"{pay}.{c}").alias(f"{prefix}{c}") for c in right_payload],
        )
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: identical results to ``facts.join(dim, key)``,
    different physical layout.

    A hot key (one customer with 10⁹ fact rows) lands an entire join key's
    rows on ONE reducer in a plain shuffle join — the straggler that defines
    the job's wall time at 100 TB. Salting splits each key into ``n_salt``
    sub-keys: facts take a deterministic salt from a hash of the row's key
    (uniform within each hot key is not needed — crc32 of the key value is
    constant per key, so we hash a secondary column when present; here we
    spread via spark_partition_id-free, row-content crc32), and the dim side
    replicates each row ``n_salt`` ways so every (key, salt) pair finds its
    match. Hot-key rows now spread across ``n_salt`` reducers.

    This is the manual form of what AQE skew-join does adaptively
    (``spark.sql.adaptive.skewJoin.enabled``); keep AQE on and reach for
    explicit salting only when the skew is known ahead of time (e.g. a
    power-law user-id distribution) or the join sits under an operator AQE
    can't split.

    Only fact-preserving join types are legal: the dim side is REPLICATED
    ``n_salt`` ways, so any ``how`` that emits unmatched dim rows
    (``right``/``full`` outer) would return each of them ``n_salt`` times —
    silently wrong multiplicity. Those raise instead.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving — the replicated "
            f"dim side would return unmatched dim rows {n_salt}×; use one of "
            "inner/left/left_semi/left_anti (or an unsalted join)"
        )
    salt = "__salt"
    # deterministic per-row salt: crc32 over ALL fact columns, so rows of
    # the same hot key still spread; mod keeps it in [0, n_salt)
    row_fp = F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in facts.columns]))
    salted_facts = facts.withColumn(salt, F.pmod(row_fp, F.lit(n_salt)).cast("int"))
    salted_dim = dim.withColumn(
        salt, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_facts.join(salted_dim, [key, salt], how).drop(salt)


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Range (band) join: each fact row matched to the band whose
    [lo, hi) interval contains its value.

    With a small band table (the overwhelmingly common case) the right
    side broadcasts and the BETWEEN predicate evaluates map-side — no
    shuffle at all. For a LARGE interval table the scale path is interval
    bucketing: explode each interval into the fixed-width buckets it
    covers, bucket the fact value, equi-join on bucket, re-filter the
    exact bounds — turning the nested-loop range join into a hash join.
    """
    cond = (facts[value] >= bands[lo]) & (facts[value] < bands[hi])
    return facts.join(F.broadcast(bands), cond, "left")
