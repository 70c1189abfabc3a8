"""Live HTTP fetchers for the ``marketdata`` source (reference
yfinance_client.py:11-32 — ``yf.download`` per ticker).

The offline fixture scan is the default (SURVEY M2: connectors must
degrade to fixture parquet and never touch a network in tests); a live
deployment opts in per-read:

    spark.read.format("marketdata")
         .option("fetch_impl", "yfinance_etl_spark.sources.live:fetch_bars_http")
         .option("tickers", "AAPL,MSFT") ...

Every fetcher has the ``_fetch_bars`` signature — ``(path, ticker, start,
end, interval)`` yielding Arrow RecordBatches in the source SCHEMA — and
is imported WORKER-side from its string spec (see
``datasource._resolve_fetch``), so a 1000-ticker read does 1000
partition-parallel HTTP fetches with per-request retry, not a driver loop.
"""

from __future__ import annotations

import datetime as dt


def _to_batch(recs: list[tuple]):
    """rows of (ticker, ddate, price, qty) → one Arrow RecordBatch in the
    marketdata SCHEMA (empty list yields a typed empty batch)."""
    import pyarrow as pa

    return pa.RecordBatch.from_pydict(
        {
            "ticker": [r[0] for r in recs],
            "ddate": [r[1] for r in recs],
            "price": [r[2] for r in recs],
            "qty": [r[3] for r in recs],
        },
        schema=pa.schema(
            [
                ("ticker", pa.string()),
                ("ddate", pa.date32()),
                ("price", pa.float64()),
                ("qty", pa.float64()),
            ]
        ),
    )


#: daily-bars CSV endpoint (Date,...,Close,...,Volume header row). Any
#: service speaking this shape works — the template is overridable per
#: read (see ``fetch_bars_http``), which is also how the CI loopback
#: test drives the real urllib/CSV/retry path without external network.
STOOQ_URL = "https://stooq.com/q/d/l/?s={sym}.us&i=d&d1={d1}&d2={d2}"


def fetch_bars_http(path, ticker, start, end, interval="1d"):
    """Real-network per-ticker OHLCV fetch: yfinance when installed
    (optional import), else a daily-bars CSV endpoint (stooq.com shape)
    via stdlib urllib. ``ticker`` is the real symbol (e.g. ``AAPL``).
    ``path`` is unused on the yfinance leg; on the CSV leg, a ``path``
    that is itself an http(s) URL overrides ``STOOQ_URL`` as the
    endpoint template (``{sym}``/``{d1}``/``{d2}`` placeholders) — the
    seam a self-hosted bar service or the offline loopback test plugs
    into, reaching the worker through the ordinary option plumbing
    (driver-side monkeypatching cannot — the reader imports this module
    in a separate process). Close → price, Volume → qty."""
    import importlib.util

    from yfinance_etl_spark.sources.retry import call_with_retries

    url_template = (
        path if path and path.startswith(("http://", "https://")) else STOOQ_URL
    )
    if importlib.util.find_spec("yfinance"):

        def pull():
            import yfinance as yf

            hist = yf.download(
                ticker, start=start, end=end, interval=interval, progress=False
            )
            return [
                (ticker, idx.date(), float(row["Close"]), float(row["Volume"]))
                for idx, row in hist.iterrows()
            ]

    else:

        def pull():
            import csv
            import io
            import urllib.request

            d1 = (start or "1990-01-01").replace("-", "")
            d2 = (end or dt.date.today().isoformat()).replace("-", "")
            url = url_template.format(sym=ticker.lower(), d1=d1, d2=d2)
            with urllib.request.urlopen(url, timeout=30) as resp:
                text = resp.read().decode()
            return [
                (
                    ticker,
                    dt.date.fromisoformat(r["Date"]),
                    float(r["Close"]),
                    float(r["Volume"]),
                )
                for r in csv.DictReader(io.StringIO(text))
            ]

    yield _to_batch(call_with_retries(pull))


def fetch_bars_demo(path, ticker, start, end, interval="1d"):
    """Deterministic in-memory feed: exercises the fetch_impl injection
    seam (worker-side import, Arrow transfer, per-ticker partitions)
    offline — used by the always-run injection test and as the smallest
    template for writing a custom fetcher."""
    base = float(sum(ord(c) for c in ticker) % 100) + 1.0
    recs = [
        (ticker, dt.date(2024, 1, 2) + dt.timedelta(days=i), base + i, 10.0 + i)
        for i in range(3)
    ]
    yield _to_batch(recs)
