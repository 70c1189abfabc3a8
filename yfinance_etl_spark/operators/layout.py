"""Z-order (Morton-curve) data layout: multi-dimensional file clustering
for scan pruning.

The missing half of scan efficiency at 100 TB is LAYOUT: predicate
pushdown can only skip a parquet file/row-group whose footer min/max
excludes the predicate, and a table range-partitioned by one key gives
zero pruning for selective filters on any OTHER column. Interleaving the
bits of two sort dimensions into one Morton value and range-partitioning
on THAT gives every file a small min/max box in (x, y) space, so boxes
on either dimension — or both — prune files (the technique behind
Delta/Iceberg ``ZORDER BY`` / ``sort_order(z)``; Morton 1966).

Spark-first shape: the z-value is an unrolled pure-JVM bit expression
(whole-stage codegen, no UDF), the layout is one
``repartitionByRange(zval)`` + ``sortWithinPartitions`` — a single
shuffle that replaces the linear sort's identical shuffle, i.e. z-order
costs NOTHING extra at write time. ``files_intersecting_box`` measures
the payoff from the written parquet footers — the same stats a scan's
file/row-group skipping consults — so the pruning claim is a measured
number, not an argument (tests/test_layout.py).

Reference scope note: the reference has no layout surface (it re-reads
whole per-ticker frames, streamlit_app.py's session cache); this is part
of the brief-mandated 100 TB extension family.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: x's bit b lands at z-bit 2b, y's at 2b+1. Unrolled
    into a flat codegen-friendly arithmetic expression (2*bits terms);
    callers reduce wider domains first (e.g. ``col % (1 << bits)``, or a
    min/max rescale) — the reduction choice is data-dependent and must
    match whatever the query's oracle mirrors."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftright(x, b).bitwiseAND(F.lit(1)).cast("long") * F.lit(
            1 << (2 * b)
        )
        z = z + F.shiftright(y, b).bitwiseAND(F.lit(1)).cast("long") * F.lit(
            1 << (2 * b + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    xcol: str,
    ycol: str,
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Morton curve of (xcol, ycol): one range shuffle on the z-value plus a
    partition-local sort — the same I/O a single-column sorted write
    costs. The transient zval column is dropped before writing so the
    on-disk schema is unchanged."""
    z = zorder_value(xcol, ycol, bits).alias("__zval")
    (
        df.withColumn("__zval", z)
        .repartitionByRange(n_files, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def _file_minmax(fpath: str, col: str) -> tuple:
    """(min, max) of ``col`` across a parquet file's row groups, read
    from footer statistics — the same numbers scan-time skipping uses."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath).metadata
    idx = md.schema.names.index(col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return (None, None)  # stats missing: the file can never be skipped
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (lo, hi)


def files_intersecting_box(
    path: str, xcol: str, xr: tuple, ycol: str, yr: tuple
) -> tuple[int, int]:
    """(files a box-predicate scan must read, total files) for a written
    parquet directory, judged purely by footer min/max — files whose
    stats are absent count as must-read (a skipper cannot prune them)."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        xlo, xhi = _file_minmax(f, xcol)
        ylo, yhi = _file_minmax(f, ycol)
        if xlo is None or ylo is None:
            hit += 1
            continue
        if xlo <= xr[1] and xr[0] <= xhi and ylo <= yr[1] and yr[0] <= yhi:
            hit += 1
    return hit, len(files)
