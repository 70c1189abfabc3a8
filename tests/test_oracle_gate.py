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


def test_effective_decimals_reads_shortest_repr():
    m = _mod()
    assert m.effective_decimals(1.0922905) == 7      # ROUND(x, 8) output
    assert m.effective_decimals(0.123456) == 6
    assert m.effective_decimals(42.0) == 1
    assert m.effective_decimals(1e20) == 0
    assert m.effective_decimals(0.1 + 0.2) > m.MAX_ROUND_DP  # raw FP
    # the leak the 12-dp first guess missed: a raw sqrt of magnitude ~3e4
    # needs only ~12 fractional digits — it must still classify unquantized
    assert m.effective_decimals(31426.310338631865) > m.MAX_ROUND_DP


def test_max_round_dp_tracks_the_finest_round_in_the_source():
    # Meta-test: if a future query ROUNDs finer than MAX_ROUND_DP, its
    # cells would alarm as unquantized (noise); if MAX_ROUND_DP drifts
    # above the true max, genuinely raw cells near that precision would be
    # silently excused. Pin the constant to the source.
    import os
    import re

    m = _mod()

    def round_precisions(src: str):
        # walk balanced parens from each ROUND-ish call; last top-level
        # comma argument, when a bare int, is the precision
        for match in re.finditer(r"(?:\bROUND|\br6|F\.round)\s*\(", src):
            depth, i = 1, match.end()
            last_comma = match.end() - 1
            while i < len(src) and depth:
                c = src[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "," and depth == 1:
                    last_comma = i
                i += 1
            arg = src[last_comma + 1:i - 1].strip()
            if re.fullmatch(r"\d+", arg):
                yield int(arg)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    precisions = set()
    pkg = os.path.join(root, "yfinance_etl_spark")
    for dirpath, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                precisions.update(round_precisions(
                    open(os.path.join(dirpath, fn)).read()))
    assert precisions, "no ROUND sites found — pattern drift"
    assert max(precisions) == m.MAX_ROUND_DP


def test_quantized_cells_are_excluded_from_the_boundary_alarm():
    # The r9 tri run's first alarm was this exact aliasing false positive:
    # sortino.mean_excess = 1.0922905, an 8-dp ROUND whose 7th decimal is
    # 5 — ON the 6-dp half grid, yet safe by its own quantization. The
    # scan must not alarm on it.
    m = _mod()
    rows = [(1, 1.0922905), (2, 0.123456)]
    got = m.min_boundary_proximity(rows, ["k", "v"])
    best, n_unq, unq_cols = got
    assert best is None and n_unq == 0 and unq_cols == []


def test_min_boundary_proximity_picks_the_nearest_unquantized_cell():
    m = _mod()
    near_half = 7.000000500000031      # unquantized AND near the half grid
    rows = [(1, "a", 0.25, near_half), (2, "b", 0.30000000000000004, None)]
    got = m.min_boundary_proximity(rows, ["k", "s", "v1", "v2"])
    best, n_unq, unq_cols = got
    d, col, val = best
    assert col == "v2" and val == near_half and d < 1e-3
    assert n_unq == 2 and unq_cols == ["v1", "v2"]
    # no float cells -> None
    assert m.min_boundary_proximity([(1, "x")], ["k", "s"]) is None


def test_dtype_check_int_widths_share_a_family():
    # Spark int vs DuckDB INTEGER/BIGINT: the driver compares collected
    # python ints, so width differences inside int64 are not hash-visible
    m = _mod()
    assert m.dtype_mismatches([("n", "int")], ["n"], ["BIGINT"]) == []
