from yfinance_etl_spark.functions.scalar import (  # noqa: F401
    davg,
    dsum,
    r6,
    clean_ticker,
    coalesce_default,
    date_str,
    parse_pct,
    sentiment_bucket,
    status_label,
)
