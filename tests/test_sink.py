"""S10 sink: partitioned layout, file counts, value fidelity."""

from __future__ import annotations

import glob

from yfinance_etl_spark.sources.sink import read_back, write_partitioned


def test_roundtrip_values_and_partition_type(spark, tmp_path):
    rows = [(1, "a", 1.5), (2, "a", 2.5), (3, "b", 3.5)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = str(tmp_path / "t")
    write_partitioned(df, out, partition_by=("grp",))
    back = read_back(spark, out)
    got = sorted((r.id, r.grp, r.v) for r in back.collect())
    assert got == rows
    # partition column recovered from directory names, still usable as a key
    assert back.filter("grp = 'a'").count() == 2


def test_one_file_per_partition_key(spark, tmp_path):
    df = spark.createDataFrame([(i, f"g{i % 3}") for i in range(300)], "id long, grp string")
    out = str(tmp_path / "t")
    write_partitioned(df, out, partition_by=("grp",))
    for g in ("g0", "g1", "g2"):
        files = glob.glob(f"{out}/grp={g}/*.parquet")
        assert len(files) == 1, f"expected exactly one file for {g}, got {files}"


def test_salted_split_for_big_partitions(spark, tmp_path):
    df = spark.createDataFrame([(i, "hot") for i in range(1000)], "id long, grp string")
    out = str(tmp_path / "t")
    write_partitioned(df, out, partition_by=("grp",), files_per_partition=4)
    files = glob.glob(f"{out}/grp=hot/*.parquet")
    assert 1 < len(files) <= 4
    assert read_back(spark, out).count() == 1000


def test_compact_merges_small_files_and_preserves_values(spark, tmp_path):
    from yfinance_etl_spark.sources.sink import compact

    out = str(tmp_path / "frag")
    df = spark.createDataFrame([(i, float(i)) for i in range(5000)], "id long, v double")
    df.repartition(16).write.parquet(out)
    assert len(glob.glob(f"{out}/*.parquet")) == 16
    n = compact(spark, out)  # tiny table → one ~512MB-target task
    assert n == 1
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    back = read_back(spark, out)
    assert back.count() == 5000
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(range(5000))
    # no leftover staging/backup directories from the atomic swap
    assert glob.glob(str(tmp_path / "frag__*")) == []


def test_compact_keeps_hive_partitions(spark, tmp_path):
    from yfinance_etl_spark.sources.sink import compact

    out = str(tmp_path / "part")
    df = spark.createDataFrame([(i, f"g{i % 2}") for i in range(400)], "id long, grp string")
    df.repartition(8).write.partitionBy("grp").parquet(out)
    assert len(glob.glob(f"{out}/grp=g0/*.parquet")) > 1
    compact(spark, out, partition_by=("grp",))
    for g in ("g0", "g1"):
        assert len(glob.glob(f"{out}/grp={g}/*.parquet")) == 1
    assert read_back(spark, out).filter("grp = 'g1'").count() == 200


def test_incremental_overwrites_only_delta_partitions(spark, tmp_path):
    from yfinance_etl_spark.sources.sink import write_incremental

    out = str(tmp_path / "mv")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-02", 999.0), (3, "2024-02", 999.0)],
        "id long, m string, v double",
    )
    write_partitioned(base, out, partition_by=("m",))
    # refresh ONLY 2024-02 with the corrected rows (one fewer than stale)
    delta = spark.createDataFrame([(2, "2024-02", 20.0)], "id long, m string, v double")
    write_incremental(delta, out, partition_by=("m",))
    got = sorted((r.id, r.m, r.v) for r in read_back(spark, out).collect())
    # 2024-01 untouched; 2024-02 REPLACED (not appended: id 3 gone)
    assert got == [(1, "2024-01", 10.0), (2, "2024-02", 20.0)]


def test_compact_recovers_table_stranded_by_crash_between_renames(spark, tmp_path):
    # simulate a driver death between the two swap renames: the data sits
    # at path__precompact and nothing is at path. The next compact must
    # restore it and complete instead of crashing on the missing dir.
    import os

    from yfinance_etl_spark.sources.sink import compact

    out = str(tmp_path / "t")
    spark.createDataFrame([(i,) for i in range(100)], "id long").repartition(
        4
    ).write.parquet(out)
    os.rename(out, out + "__precompact")  # the crash window state
    assert not os.path.exists(out)
    n = compact(spark, out)
    assert n == 1
    assert read_back(spark, out).count() == 100
    assert glob.glob(str(tmp_path / "t__*")) == []


def test_compact_clears_stale_backup_and_staging_dirs(spark, tmp_path):
    # a crash AFTER the swap leaves path__precompact beside a healthy
    # path; a crashed rewrite leaves path__compacting. Either used to make
    # the next compact's os.rename raise ENOTEMPTY / pollute the read.
    import os

    from yfinance_etl_spark.sources.sink import compact

    out = str(tmp_path / "t")
    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    df.repartition(2).write.parquet(out)
    df.write.parquet(out + "__precompact")  # stale backup (post-swap crash)
    df.write.parquet(out + "__compacting")  # half-written staging dir
    n = compact(spark, out)
    assert n == 1
    assert read_back(spark, out).count() == 50
    assert glob.glob(str(tmp_path / "t__*")) == []
    assert not os.path.exists(out + "__precompact")


def test_compact_returns_actual_file_count_under_partition_by(spark, tmp_path):
    # the old return value was ceil(bytes/target) — a number unrelated to
    # the partitioned rewrite, which emits one file per key
    from yfinance_etl_spark.sources.sink import compact

    out = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(300)], "id long, grp string"
    )
    df.repartition(8).write.partitionBy("grp").parquet(out)
    n = compact(spark, out, partition_by=("grp",))
    assert n == 3  # one file per key, and the return value says so
