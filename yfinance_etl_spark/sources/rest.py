"""S6/S7: REST-shaped feed DataSource (NewsAPI / symbol-search analog).

The reference calls NewsAPI over HTTP with a query string and page size
(streamlit_app.py:464-476 ``fetch_news``: q=<ticker>, pageSize=5, sorted
newest-first) and a symbol-search endpoint (S7). This source re-expresses
that contract Spark-side:

    spark.read.format("newsfeed")
         .option("path", sf_dir).option("query", "fast")
         .option("page_size", "100").option("max_pages", "3")
         .load()

* **One InputPartition per page** — REST pagination becomes source
  parallelism; each partition fetches exactly one page.
* **Query pushdown** — the keyword filter and LIMIT/OFFSET run inside the
  partition reader, so unmatched articles never cross the wire.
* **Deterministic order** — pages are ordered by doc_id (the fixture's
  publish-order stand-in), so page boundaries are stable and the whole
  scan is oracle-reproducible.
* **Offline by construction** — "the API" is the documents fixture; a
  real deployment swaps ``_fetch_page`` for the HTTP call (auth header,
  retry/backoff) and the Spark surface is unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("text", StringType()),
    ]
)


def _fetch_page(path: str, query: str, page: int, page_size: int):
    """Worker-side page fetch (the ``requests.get(..., page=N)`` analog),
    pushed down to a DuckDB scan with LIMIT/OFFSET.

    Scale note: OFFSET pagination re-evaluates the filtered scan per page —
    O(pages × corpus) in this OFFLINE emulation, where this source IS the
    server. In the real deployment the HTTP endpoint bears that cost and
    each partition only downloads its page; if the backing store is local
    at scale, switch to keyset pagination (WHERE doc_id > :last) or range
    partitioning instead."""
    import duckdb

    # the path binds as a prepared-statement parameter like everything
    # else (datasource.py's parameterize-everything convention) — an
    # interpolated path with a quote in it (/data/o'brien) broke the SQL
    q = f"""
        SELECT doc_id, lang, source, text
        FROM read_parquet(?)
        WHERE contains(text, ?)
        ORDER BY doc_id
        LIMIT {int(page_size)} OFFSET {int(page) * int(page_size)}
    """
    from yfinance_etl_spark.sources.retry import call_with_retries

    con = duckdb.connect()
    try:
        # bounded retry on the page request (streamlit_app.py:300-309 parity)
        yield from call_with_retries(
            lambda: con.execute(
                q, [f"{path}/documents.parquet", query]
            ).fetch_record_batch()
        )
    finally:
        con.close()


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class NewsFeedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("newsfeed source requires option 'path'")
        self.query = options.get("query", "")
        if not self.query:
            raise ValueError("newsfeed source requires option 'query'")
        self.page_size = int(options.get("page_size", "100"))
        self.max_pages = int(options.get("max_pages", "10"))

    def partitions(self):
        return [_PagePartition(p) for p in range(self.max_pages)]

    def read(self, partition: _PagePartition):
        yield from _fetch_page(self.path, self.query, partition.page, self.page_size)


def symbol_search(symbols, query: str):
    """S7: symbol-search scan (reference ``search_stocks(query)`` →
    ``/search?q=``, streamlit_app.py:484-497) over a symbols DataFrame
    with ``symbol`` and ``description`` columns.

    Same contract as the Finnhub endpoint the reference wraps: empty /
    missing query → empty result (``len(query) < 1`` guard); otherwise a
    case-insensitive substring match on EITHER the symbol or the
    description, each hit formatted as ``"SYMBOL - description"``
    (the reference's display string) alongside the raw columns.

    Scale: a pure Catalyst filter + projection — predicate evaluates
    map-side in whole-stage codegen, no shuffle; on a partitioned symbols
    table the contains() filter still prunes columns at the scan.
    """
    from pyspark.sql import functions as F

    if not query:
        return symbols.select(
            "symbol", "description",
            F.concat_ws(" - ", "symbol", "description").alias("label"),
        ).limit(0)
    q = F.lit(query.lower())
    return (
        symbols.filter(
            F.lower(F.col("symbol")).contains(q)
            | F.lower(F.col("description")).contains(q)
        )
        .select(
            "symbol",
            "description",
            F.concat_ws(" - ", "symbol", "description").alias("label"),
        )
    )


class NewsFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "newsfeed"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> NewsFeedReader:
        return NewsFeedReader(self.options)
