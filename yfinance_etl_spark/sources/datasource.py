"""S1: yfinance-shaped Python DataSource (Spark 4 ``pyspark.sql.datasource``).

The reference's only connector is the yfinance client
(src/interface/yfinance_client.py:11-32): ``fetch(tickers, start, end,
interval)`` loops tickers and returns one daily-history frame per ticker.
This re-expresses that contract as a first-class Spark source:

    spark.dataSource.register(MarketDataSource)
    spark.read.format("marketdata")
         .option("path", sf_dir).option("tickers", "1,2,3")
         .option("start", "1994-01-01").option("end", "1996-12-31")
         .load()

* **One InputPartition per ticker** — the reference's per-ticker fetch
  loop becomes source parallelism: 1000 tickers = 1000 concurrent reads
  on a cluster, not a driver-side loop.
* **Option pushdown** — tickers/start/end are applied INSIDE the
  partition reader (DuckDB predicate on the parquet footer), so a
  3-ticker request never deserializes the other tickers' rows. This is
  the connector analog of PushedFilters.
* **Offline by construction** — the "exchange" is the fixture lineitem
  table (suppkey = ticker, daily decimal-exact mean price = close), so
  tests never touch a network. A real deployment swaps ``_fetch_bars``
  for the HTTP call; the Spark surface is unchanged.

The per-partition read uses DuckDB (Arrow-native, vectorized) rather than
row-at-a-time Python — the same engine the correctness oracle runs on,
which makes the source's aggregation bit-identical to the oracle's.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("ticker", StringType()),
        StructField("ddate", DateType()),
        StructField("price", DoubleType()),
        StructField("qty", DoubleType()),
    ]
)


#: interval option → date_trunc unit (None = raw daily bars), mirroring the
#: reference's ``interval='1d'`` pass-through (yfinance_client.py:19)
INTERVALS = {"1d": None, "1w": "week", "1mo": "month"}


def _fetch_bars(
    path: str,
    ticker: str,
    start: str | None,
    end: str | None,
    interval: str = "1d",
):
    """Worker-side per-ticker history fetch (the yfinance_client.fetch
    analog), pushed down to a DuckDB scan of the parquet footprint.

    ``interval`` coarsens the bars inside the reader — a monthly request
    aggregates at the source and ships ~21× fewer rows, the connector
    analog of aggregate pushdown.

    Date-range contract matches yfinance's ``download(start, end)``:
    ``start`` inclusive, ``end`` EXCLUSIVE (midnight of ``end`` is not
    returned). Option values are bound as prepared-statement parameters,
    never interpolated into the SQL text; the only interpolated pieces
    are the whitelisted trunc unit and the validated-int ticker."""
    import duckdb

    trunc = INTERVALS[interval]
    date_expr = (
        "CAST(l_shipdate AS DATE)"
        if trunc is None
        else f"CAST(date_trunc('{trunc}', l_shipdate) AS DATE)"
    )
    preds, params = [f"l_suppkey = {int(ticker)}"], [f"{path}/lineitem.parquet"]
    if start:
        preds.append("l_shipdate >= CAST(? AS TIMESTAMP)")
        params.append(f"{start} 00:00:00")
    if end:
        preds.append("l_shipdate < CAST(? AS TIMESTAMP)")  # exclusive, like yf.download
        params.append(f"{end} 00:00:00")
    q = f"""
        SELECT CAST(l_suppkey AS VARCHAR) AS ticker,
               {date_expr} AS ddate,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS qty
        FROM read_parquet(?)
        WHERE {' AND '.join(preds)}
        GROUP BY 1, 2
    """
    from yfinance_etl_spark.sources.retry import call_with_retries

    con = duckdb.connect()
    try:
        # retry the request itself (reference streamlit_app.py:300-309);
        # once the batch stream is open, failures fall through to Spark's
        # task retry (the right layer for a partially-consumed partition)
        reader = call_with_retries(lambda: con.execute(q, params).fetch_record_batch())
        yield from reader
    finally:
        con.close()


def _resolve_fetch(spec: str | None):
    """Resolve the ``fetch_impl`` option (``"module:function"``) to the
    worker-side fetch implementation; default is the offline fixture scan.

    String-spec + worker-side import is deliberate: Spark 4 plans Python
    data sources in a separate Python worker process, so driver-side
    module state (monkeypatched globals, closures over live sessions)
    never reaches the reader — an import path does, everywhere. The live
    HTTP fetcher ships at ``yfinance_etl_spark.sources.live:fetch_bars_http``
    (smoke-tested behind SPARK_GRAFT_LIVE=1)."""
    if not spec:
        return _fetch_bars
    mod, sep, attr = spec.partition(":")
    if not sep or not mod or not attr:
        raise ValueError(f"fetch_impl must be 'module:function', got {spec!r}")
    import importlib

    return getattr(importlib.import_module(mod), attr)


class _TickerPartition(InputPartition):
    def __init__(self, ticker: str):
        self.ticker = ticker


class MarketReader(DataSourceReader):
    def __init__(self, options: dict):
        self._fetch_spec = options.get("fetch_impl")
        if self._fetch_spec and ":" not in self._fetch_spec:
            raise ValueError(
                f"fetch_impl must be 'module:function', got {self._fetch_spec!r}"
            )
        self.path = options.get("path")
        if not self.path:
            raise ValueError("marketdata source requires option 'path'")
        tickers = options.get("tickers", "")
        self.tickers = [t.strip() for t in tickers.split(",") if t.strip()]
        if not self.tickers:
            raise ValueError("marketdata source requires option 'tickers'")
        self.start = options.get("start")
        self.end = options.get("end")
        self.interval = options.get("interval", "1d")
        if self.interval not in INTERVALS:
            raise ValueError(
                f"interval must be one of {sorted(INTERVALS)}, got {self.interval!r}"
            )

    def partitions(self):
        return [_TickerPartition(t) for t in self.tickers]

    def read(self, partition: _TickerPartition):
        # yielding Arrow RecordBatches keeps the transfer vectorized
        fetch = _resolve_fetch(self._fetch_spec)
        yield from fetch(
            self.path, partition.ticker, self.start, self.end, self.interval
        )


class MarketDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "marketdata"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> MarketReader:
        return MarketReader(self.options)
