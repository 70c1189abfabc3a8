"""Meta-verification of the oracle gate itself: the comparator must
actually CATCH each mismatch class, or every green gate run is vacuous.
Pure-python tests over tools/compare_oracle.compare — no Spark session."""

from __future__ import annotations

import importlib.util
import pathlib
import sys

_TOOL = pathlib.Path(__file__).resolve().parents[1] / "tools" / "compare_oracle.py"


def _compare():
    spec = importlib.util.spec_from_file_location("compare_oracle", str(_TOOL))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("compare_oracle", mod)
    spec.loader.exec_module(mod)
    return mod.compare


def test_gate_passes_identical_results():
    compare = _compare()
    rows = [(1, "a", 1.5), (2, "b", 2.5)]
    assert compare("t", rows, ["k", "s", "v"], rows, ["k", "s", "v"])


def test_gate_is_order_insensitive_for_rows_and_columns():
    compare = _compare()
    spark = [(1, 1.5), (2, 2.5)]
    duck = [(2.5, 2), (1.5, 1)]  # rows reversed, columns swapped
    assert compare("t", spark, ["k", "v"], duck, ["v", "k"])


def test_gate_catches_value_mismatch():
    compare = _compare()
    assert not compare("t", [(1, 1.5)], ["k", "v"], [(1, 1.6)], ["k", "v"])


def test_gate_catches_rowcount_mismatch():
    compare = _compare()
    assert not compare("t", [(1,)], ["k"], [(1,), (2,)], ["k"])


def test_gate_catches_schema_mismatch():
    compare = _compare()
    assert not compare("t", [(1,)], ["k"], [(1,)], ["other"])


def test_gate_catches_float_beyond_tolerance_but_not_epsilon():
    compare = _compare()
    # 1e-9-relative noise passes loose (with a WARN); 1e-6 fails
    assert compare("t", [(1.0,)], ["v"], [(1.0 + 1e-12,)], ["v"])
    assert not compare("t", [(1.0,)], ["v"], [(1.0 + 1e-6,)], ["v"])


def test_gate_catches_null_vs_value():
    compare = _compare()
    assert not compare("t", [(None,)], ["v"], [(0,)], ["v"])
    assert compare("t", [(None,)], ["v"], [(None,)], ["v"])


def _mod():
    spec = importlib.util.spec_from_file_location("compare_oracle", str(_TOOL))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dtype_check_catches_hugeint_vs_bigint():
    # the r6 funnel_conversions red row: DuckDB typed SUM(CASE…) as
    # HUGEINT, Spark emitted BIGINT — identical VALUES, type-sensitive
    # driver hash red. The gate must now catch this class locally.
    m = _mod()
    bad = m.dtype_mismatches([("n", "bigint")], ["n"], ["HUGEINT"])
    assert bad and "HUGEINT" in bad[0]


def test_dtype_check_catches_decimal_vs_double():
    m = _mod()
    assert m.dtype_mismatches([("v", "double")], ["v"], ["DECIMAL(38,2)"])


def test_dtype_check_accepts_matching_families():
    m = _mod()
    spark = [("k", "bigint"), ("v", "double"), ("s", "string"),
             ("d", "date"), ("ts", "timestamp"), ("b", "boolean"),
             ("a", "array<double>")]
    duck_cols = ["k", "v", "s", "d", "ts", "b", "a"]
    duck_types = ["BIGINT", "DOUBLE", "VARCHAR", "DATE",
                  "TIMESTAMP", "BOOLEAN", "DOUBLE[]"]
    assert m.dtype_mismatches(spark, duck_cols, duck_types) == []


def test_boundary_proximity_flags_near_half_boundary_cells():
    # r8 verdict item 8: observability for the residual rounding-boundary
    # exposure. A 6-dp-rounded cell sits ON the 1e-6 grid -> dist ~0.5
    # (safe); a cell one step from the half boundary must report ~0.
    m = _mod()
    assert abs(m.half_boundary_dist(0.123456) - 0.5) < 1e-6
    assert abs(m.half_boundary_dist(42.0) - 0.5) < 1e-9
    # 1.0000005 = exactly on a 6-dp half boundary (up to double repr)
    assert m.half_boundary_dist(1.0000005) < 1e-3
    assert m.half_boundary_dist(-1.0000005) < 1e-3  # sign-symmetric


def test_min_boundary_proximity_picks_the_nearest_cell_and_skips_non_floats():
    m = _mod()
    rows = [(1, "a", 0.25, 7.0000004), (2, "b", 3.123456, None)]
    got = m.min_boundary_proximity(rows, ["k", "s", "v1", "v2"])
    d, col, val = got
    assert col == "v2" and val == 7.0000004 and d < 0.11
    # no float cells -> None
    assert m.min_boundary_proximity([(1, "x")], ["k", "s"]) is None


def test_dtype_check_int_widths_share_a_family():
    # Spark int vs DuckDB INTEGER/BIGINT: the driver compares collected
    # python ints, so width differences inside int64 are not hash-visible
    m = _mod()
    assert m.dtype_mismatches([("n", "int")], ["n"], ["BIGINT"]) == []
