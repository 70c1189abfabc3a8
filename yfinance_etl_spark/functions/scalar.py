"""Scalar expression library (SURVEY.md §2.8, F1-F13) + determinism helpers.

Everything here is a *Catalyst expression builder* — pure ``pyspark.sql.functions``
composition, JVM-side, whole-stage-codegen friendly. No Python UDFs.

Determinism helpers (``dsum``/``davg``/``r6``): the driver's correctness gate
hash-compares Spark output against a DuckDB oracle. Floating-point SUM/AVG over
doubles is order-dependent, and Spark/DuckDB will visit rows in different orders,
so a naive ``F.sum(double)`` can hash-mismatch even when both engines are
"correct". Summing through a wide decimal is exact and order-insensitive; casting
the exact decimal back to double is a single, deterministic rounding. This costs
one extra cast per row — negligible next to the shuffle — and at 100 TB it also
makes results *reproducible across partitionings*, which plain double sums are not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# determinism helpers
# ---------------------------------------------------------------------------

#: decimal scale for money-magnitude values (|x| < 1e20)
MONEY_SCALE = 12
#: decimal scale for O(1) statistics (returns, ratios)
STAT_SCALE = 18


def dsum(c: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Order-insensitive exact sum of a double column, returned as double."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


#: per-row quantization for money PRODUCTS (price*discount: true width 4-6
#: decimals). The grid must sit far ABOVE the double's representation error
#: (~1e-11 at 1e5 magnitude) so Spark's shortest-repr cast and DuckDB's
#: exact-binary cast round a product to the SAME decimal — at scale 12 they
#: disagree by 1e-12/row (Spark gets the clean 4-dp value, DuckDB keeps a
#: binary tail like .664999999998) and a 6000-row sum can flip a 2-dp
#: rounding boundary (observed: dividend_yield at sf0.1 only).
PRODUCT_SCALE = 6


def dsum_r(c: Column | str, places: int = 2, scale: int = PRODUCT_SCALE) -> Column:
    """Exact decimal sum rounded IN DECIMAL SPACE, then cast to double —
    for money products that are then rounded at 2 decimals.

    Two cross-engine traps, both observed at sf0.1 and invisible at
    sf0.01, force this shape for sums of values wider than ``places``:

    * rounding AFTER a cast to double splits engines when the sum lands
      exactly on the half boundary: double(550831.075) ≈ …0749…, DuckDB
      rounds the binary value down, Spark's ROUND goes through the
      shortest decimal repr and rounds up;
    * summing at scale 12 splits engines because double→decimal
      conversion itself differs (see PRODUCT_SCALE) — the per-row snap to
      the coarse grid makes both engines sum the TRUE decimal values.

    HALF_UP (Spark) == half-away-from-zero (DuckDB) for the positive
    sums here. ``r6(dsum(c), 2)`` stays correct for sums of ≤2-decimal
    COLUMNS, which cannot reach a 3rd-decimal boundary.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(c.cast(f"decimal(38,{scale})")), places).cast("double")


def davg(c: Column | str, scale: int = MONEY_SCALE) -> Column:
    """Deterministic mean: exact decimal sum → double → / count."""
    c = F.col(c) if isinstance(c, str) else c
    return dsum(c, scale) / F.count(c)


def r6(c: Column, places: int = 6) -> Column:
    """Round a float output to a fixed number of decimals (hash stability)."""
    return F.round(c, places)


# ---------------------------------------------------------------------------
# F1-F13 scalar operators (references cite the behavior being re-expressed)
# ---------------------------------------------------------------------------


def clean_ticker(c: Column | str) -> Column:
    """F1/P3: upper+trim ticker cleanup (reference src/utils.py:14-18)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.upper(F.trim(c))


def date_str(c: Column | str) -> Column:
    """F2: date → 'yyyy-MM-dd' string at the sink only (reference src/etl.py:34)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.date_format(c, "yyyy-MM-dd")


def parse_pct(c: Column | str) -> Column:
    """F4: strip %/$/B decorations and cast to double
    (reference fund_comp2.py:884-885,934-935). try_cast, not cast: Spark 4's
    ANSI mode makes a plain cast THROW on malformed input, while the reference
    (and the DuckDB TRY_CAST oracle) yields null/NaN."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(c, r"[%$B,]", "").try_cast("double")


def coalesce_default(c: Column | str, default) -> Column:
    """F12: dict.get(key, default) → coalesce (reference src/etl.py:29-33)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(c, F.lit(default))


def fmt_num(c: Column | str, places: int = 2) -> Column:
    """F6: '{:.2f}'-style display formatting (reference
    streamlit_app.py:846-857's display map), JVM-side via format_string.

    Cross-engine determinism, measured against DuckDB printf before this
    shipped: (a) the input is rounded to ``places`` FIRST, so the double
    handed to the formatter sits within ~1e-13 of the k/10^places grid
    point and Java's HALF_UP decimal formatting agrees with C printf's
    binary-value rounding on every cell — formatting an unrounded quotient
    directly reopens the formatter-divergence class; (b) ``+ 0.0``
    normalizes IEEE negative zero, because Spark's ROUND returns +0.0
    where DuckDB's keeps -0.0 and printf then renders '-0.00'. The
    internal round does NOT absolve money inputs from the dsum_r decimal
    quantization contract: a double crossing a 2-dp half boundary
    (550831.075 — observed) still splits engines at the ROUND itself."""
    c = F.col(c) if isinstance(c, str) else c
    return F.format_string(f"%.{places}f", F.round(c, places) + F.lit(0.0))


def fmt_pct(c: Column | str, places: int = 2) -> Column:
    """F6: '{:.2%}'-style percent display — ratio × 100, rounded ONCE at
    ``places``, then formatted with a literal '%' (same pre-round and
    negative-zero contract as fmt_num). Single-round on purpose: rounding
    the ratio at 6 dp first and again at 2 dp after ×100 puts ~1e-4 of
    cells on an exact double-rounding boundary, vs ~1e-9 for one round of
    a generic quotient."""
    c = F.col(c) if isinstance(c, str) else c
    return F.format_string(f"%.{places}f%%", F.round(c * 100, places) + F.lit(0.0))


def parse_ticker_list(c: Column | str) -> Column:
    """P11: 'spy, qqq , ,vti' → ['SPY','QQQ','VTI'] — split on comma, trim,
    upper, drop empties, all as HOFs (reference streamlit_app.py:781-782)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(
        F.transform(F.split(c, ","), lambda x: F.upper(F.trim(x))),
        lambda x: F.length(x) > 0,
    )


def sentiment_bucket(score: Column | str) -> Column:
    """F8: >0.1 positive / <-0.1 negative / else neutral
    (reference streamlit_app.py:272-273)."""
    score = F.col(score) if isinstance(score, str) else score
    return (
        F.when(score > 0.1, F.lit("positive"))
        .when(score < -0.1, F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )


def status_label(status: Column | str) -> Column:
    """F7: status → labeled string, chained CASE WHEN
    (reference fund_comp2.py:979-994)."""
    status = F.col(status) if isinstance(status, str) else status
    return (
        F.when(status == "critical", F.lit("[CRIT] critical"))
        .when(status == "warning", F.lit("[WARN] warning"))
        .when(status == "good", F.lit("[OK] good"))
        .otherwise(F.concat(F.lit("[INFO] "), status))
    )
