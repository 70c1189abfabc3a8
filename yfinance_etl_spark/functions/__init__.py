from yfinance_etl_spark.functions.scalar import (  # noqa: F401
    clean_ticker,
    coalesce_default,
    date_str,
    davg,
    dsum,
    parse_pct,
    parse_ticker_list,
    r6,
    sentiment_bucket,
    status_label,
)
from yfinance_etl_spark.functions.semistructured import (  # noqa: F401
    extract_json_object,
    json_field,
    parse_json,
)
