"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every query in the registry at a given sf dir, runs its oracle SQL in
DuckDB over the same parquet files, and compares:
  * row count
  * column name set
  * order-insensitive values (rows sorted, columns sorted by name),
    exact equality for non-floats, exact-first then 1e-9-relative for floats
    (exact mismatches are reported loudly — the driver may hash exact).

Usage:
  python tools/compare_oracle.py [sf_dir] [query ...]     one sf, optional subset
  python tools/compare_oracle.py --json                   full gate + correctness_full.json
  python tools/compare_oracle.py --tri [testdata_base]    full gate at sf0.001, sf0.01, sf0.1
                                                          in ONE command (r6 verdict item 7);
                                                          the sf0.01 leg refreshes
                                                          correctness_full.json
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yfinance_etl_spark.catalog import TABLES  # noqa: E402
from yfinance_etl_spark.plans.queries import REGISTRY  # noqa: E402
from yfinance_etl_spark.session import get_spark  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


# ---------------------------------------------------------------------------
# dtype parity: the driver's value hash is TYPE-sensitive (r6: funnel's
# SUM(CASE…) came back HUGEINT from DuckDB vs BIGINT from Spark — values
# identical, hash red). Map both engines' types onto canonical families
# and fail on mismatch, so that class of bug dies locally, not in a round
# artifact. HUGEINT and DECIMAL deliberately map to families Spark never
# produces: the oracle must CAST them explicitly.
# ---------------------------------------------------------------------------

def duck_family(t: str) -> str:
    t = t.upper()
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    if t == "HUGEINT" or t == "UHUGEINT":
        return "int128"  # pandas/arrow widen to float64/object → hash splits
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "VARCHAR":
        return "string"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BOOLEAN":
        return "bool"
    return t.lower()


def spark_family(t: str) -> str:
    if t.startswith(("array", "struct", "map")):
        return "nested"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t == "string":
        return "string"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "boolean":
        return "bool"
    return t


def dtype_mismatches(spark_dtypes: list[tuple[str, str]],
                     duck_cols: list[str], duck_types: list) -> list[str]:
    s = {name: spark_family(t) for name, t in spark_dtypes}
    out = []
    for name, dt in zip(duck_cols, duck_types):
        df_, sf_ = duck_family(str(dt)), s.get(name)
        if sf_ is not None and df_ != sf_:
            out.append(f"{name}: duck {dt} ({df_}) vs spark {sf_}")
    return out


def half_boundary_dist(v: float) -> float:
    """Distance — in units of 1e-6, range [0, 0.5] — of a float cell from
    the nearest 6-dp ROUNDING HALF BOUNDARY (k + 0.5)·1e-6.

    Residual-exposure observability (r8 verdict item 8 / COVERAGE.md): a
    cell produced by ``round(x, 6)`` (or coarser) sits ON the 1e-6 grid,
    so its distance is ~0.5 — safely quantized, both engines provably
    agree. A cell far from the grid relies on BIT-EXACT FP replay between
    Spark and DuckDB instead of grid quantization; the smaller this
    distance, the closer that cell sits to the boundary where a 1-ulp
    cross-engine difference would flip a 6-dp rounding."""
    frac = math.fmod(abs(v) * 1e6, 1.0)
    return abs(frac - 0.5)


def effective_decimals(v: float) -> int:
    """Decimal digits after the point in the float's SHORTEST repr.

    Python's repr is the shortest decimal string that round-trips, so a
    cell produced by ``ROUND(x, p)`` reprs with ≤ p decimals; a raw
    quotient (never rounded) needs ~16-17 significant digits. This is the
    discriminator the proximity scan needs: the FIRST full-registry run of
    the r9 boundary metric alarmed dist=0 at sortino.mean_excess =
    1.0922905 — an 8-dp ROUND whose 7th decimal happens to be 5, aliasing
    exactly onto the 6-dp half grid (~1-in-10 odds per 7-dp cell; certain
    to fire somewhere across thousands of cells). That cell is safe by
    8-dp quantization; the 6-dp boundary never applies to it. Conditioning
    on shortest-repr decimals scopes the metric to the documented residual
    class only: never-ROUNDed cells, whose cross-engine hash equality
    rests on bit-exact FP replay."""
    exp = Decimal(repr(v)).as_tuple().exponent
    return max(0, -exp) if isinstance(exp, int) else 0


# The finest ROUND anywhere in either engine's query legs is 9 dp (the
# k-means centroid cval; everything else rounds at 0-8). A cell with more
# fractional repr digits than MAX_ROUND_DP therefore cannot be the output
# of any deliberate quantization and is compared on raw FP bits. The
# threshold must track the source (meta-tested in tests/test_oracle_gate.py):
# 12 was the first guess and it leaked — a raw sqrt of magnitude ~3e4 needs
# only ~12 fractional digits (17 significant − 5 integer), so at sf0.01
# every audio rms cell masqueraded as "quantized" while sf0.1's
# smaller-magnitude cells flagged. (Residual blind spot, documented: a raw
# double of magnitude ≥ 1e8 could repr with ≤ 9 fractional digits and be
# missed; no registry float column reaches that magnitude unrounded.)
MAX_ROUND_DP = 9


def min_boundary_proximity(rows: list[tuple], cols: list[str]):
    """Scan float cells, split by inferred quantization (shortest-repr
    decimals ≤ MAX_ROUND_DP → deliberately ROUNDed → cross-engine safe by
    grid membership, excluded from the alarm).

    Returns ``(best, n_unquantized, unquantized_cols)`` where ``best`` is
    the ``(dist, col, value)`` of the UNQUANTIZED cell nearest a 6-dp half
    boundary (None when every float cell is quantized), ``n_unquantized``
    counts cells relying on bit-exact replay, and ``unquantized_cols`` is
    the sorted set of their column names. Returns None when the result
    carries no finite float cells at all."""
    best = None
    n_unq = 0
    unq_cols: set[str] = set()
    saw_float = False
    for row in rows:
        for col, v in zip(cols, row):
            if isinstance(v, float) and math.isfinite(v):
                saw_float = True
                if effective_decimals(v) <= MAX_ROUND_DP:
                    continue
                n_unq += 1
                unq_cols.add(col)
                d = half_boundary_dist(v)
                if best is None or d < best[0]:
                    best = (d, col, v)
    if not saw_float:
        return None
    return best, n_unq, sorted(unq_cols)


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(row[i] for i in order) for row in rows]
    return sorted(out, key=lambda r: tuple((v is None, str(v)) for v in r))


def cells_equal(a, b) -> tuple[bool, bool]:
    """(equal_loose, equal_exact)"""
    if a is None or b is None:
        return (a is None and b is None,) * 2
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if a == b or (math.isnan(a) and math.isnan(b)):
                return True, True
            tol = 1e-9 * max(1.0, abs(a), abs(b))
            return abs(a - b) <= tol, False
        try:
            af, bf = float(a), float(b)
            return (af == bf, af == bf)
        except (TypeError, ValueError):
            return False, False
    return (a == b,) * 2


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> bool:
    ok = True
    if sorted(spark_cols) != sorted(duck_cols):
        print(f"  FAIL schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return False
    if len(spark_rows) != len(duck_rows):
        print(f"  FAIL rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
        return False
    s = normalize(spark_rows, spark_cols)
    d = normalize(duck_rows, duck_cols)
    n_inexact = 0
    first_bad = None
    for i, (sr, dr) in enumerate(zip(s, d)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            loose, exact = cells_equal(sv, dv)
            if not loose:
                ok = False
                if first_bad is None:
                    first_bad = (i, j, sv, dv)
            elif not exact:
                n_inexact += 1
    if first_bad:
        i, j, sv, dv = first_bad
        print(f"  FAIL value row {i} col {sorted(spark_cols)[j]}: spark={sv!r} duck={dv!r}")
    elif n_inexact:
        print(f"  WARN {n_inexact} cells match only to 1e-9 (exact-hash would fail!)")
    return ok


def run_gate(spark, sf_dir: str, only: set[str]) -> tuple[int, int, dict, dict | None]:
    """Full (or subset) registry-vs-oracle pass at one sf dir."""
    con = duck_connect(sf_dir)
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    nearest = None  # (dist, query, col, value): min over UNQUANTIZED cells
    total_unq = 0
    unq_sites: set[str] = set()  # "query.col" relying on bit-exact replay
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_dtypes = sdf.dtypes
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            results[name] = {"status": "spark_error", "err": str(e)[:200]}
            n_fail += 1
            continue
        prox = min_boundary_proximity(spark_rows, spark_cols)
        if prox is not None:
            best, n_unq, unq_cols = prox
            total_unq += n_unq
            unq_sites.update(f"{name}.{c}" for c in unq_cols)
            if best and (nearest is None or best[0] < nearest[0]):
                nearest = (best[0], name, best[1], best[2])
        if q.oracle is None:
            print(f"{name}: rows-only ({len(spark_rows)} rows) — no oracle")
            results[name] = {"status": "rows_only", "spark_rows": len(spark_rows)}
            n_pass += 1
            continue
        try:
            rel = con.sql(q.oracle)
            duck_cols = list(rel.columns)
            duck_types = list(rel.types)
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {e}")
            results[name] = {"status": "duckdb_error", "err": str(e)[:200]}
            n_fail += 1
            continue
        print(f"{name}: {len(spark_rows)} rows", end="")
        ok = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        bad_types = dtype_mismatches(spark_dtypes, duck_cols, duck_types)
        if bad_types:
            print(f"  FAIL dtype (driver hash is type-sensitive): {bad_types}")
            ok = False
        results[name] = {"status": "pass" if ok else "fail", "spark_rows": len(spark_rows)}
        if ok:
            print("  PASS")
            n_pass += 1
        else:
            n_fail += 1
    # full-registry runs must actually have attested every entry
    if not only:
        missing = [n for n in REGISTRY if n not in results]
        assert not missing, f"gate skipped registry entries: {missing}"
    proximity = {
        "n_unquantized_cells": total_unq,
        "unquantized_sites": sorted(unq_sites),
    }
    if nearest:
        d, qname, col, val = nearest
        print(
            f"boundary proximity: {total_unq} unquantized cells (bit-exact "
            f"replay) across {len(unq_sites)} site(s); min dist to a 6-dp "
            f"half boundary among them = {d:.3g} (x 1e-6) at "
            f"{qname}.{col} = {val!r}"
        )
        proximity.update({
            "min_dist_1e6": round(d, 6),
            "query": qname,
            "col": col,
            "value": val,
        })
    else:
        print("boundary proximity: every compared float cell is quantized "
              f"(shortest-repr decimals <= {MAX_ROUND_DP}) — no "
              "bit-exact-replay exposure")
    return n_pass, n_fail, results, proximity


def write_snapshot(sf_dir: str, n_pass: int, n_fail: int, results: dict,
                   proximity: dict | None = None) -> None:
    import json

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "results": results,
        "boundary_proximity": proximity,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "correctness_full.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


def main() -> int:
    argv = sys.argv[1:]
    write_json = "--json" in argv
    tri = "--tri" in argv
    args = [a for a in argv if a not in ("--json", "--tri")]
    spark = get_spark("oracle-compare")

    if tri:
        # one-command tri-sf gate: same registry, same oracles, three data
        # scales — catches sf-dependent logic (thresholds tuned to one
        # corpus size, overflow at larger sums, empty-input edge cases,
        # rounding-boundary hits whose probability grows with group count)
        import json

        base = args[0] if args else "/root/testdata"
        totals = []
        tri_out: dict[str, dict] = {}
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sf_dir = os.path.join(base, sf)
            print(f"\n=== {sf_dir} ===")
            n_pass, n_fail, results, proximity = run_gate(spark, sf_dir, set())
            if sf == "sf0.01":  # the driver's gate scale → canonical snapshot
                write_snapshot(sf_dir, n_pass, n_fail, results, proximity)
            totals.append((sf, n_pass, n_fail))
            tri_out[sf] = {
                "n_pass": n_pass,
                "n_fail": n_fail,
                "failed": sorted(n for n, r in results.items()
                                 if r["status"] not in ("pass", "rows_only")),
                "rows_only": sorted(n for n, r in results.items()
                                    if r["status"] == "rows_only"),
                "boundary_proximity": proximity,
            }
            print(f"{sf}: {n_pass} pass, {n_fail} fail")
        tri_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "correctness_tri.json")
        with open(tri_path, "w") as f:
            json.dump({"n_queries": len(REGISTRY), "per_sf": tri_out}, f,
                      indent=1, sort_keys=True)
        print(f"wrote {tri_path}")
        print("\n" + " | ".join(f"{sf}: {p}p/{f}f" for sf, p, f in totals))
        return 1 if any(f for _, _, f in totals) else 0

    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    n_pass, n_fail, results, proximity = run_gate(spark, sf_dir, only)
    if write_json and not only:
        write_snapshot(sf_dir, n_pass, n_fail, results, proximity)
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
