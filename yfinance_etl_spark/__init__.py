"""PySpark-native analytics engine with the capabilities of Tarkeshwagh123/yfinance-etl.

A brand-new, Spark-first rebuild (NOT a port) of the reference's pandas analytics:
every operator in SURVEY.md §2 is re-expressed as a lazy DataFrame/SQL plan that
Catalyst can optimize (predicate pushdown, broadcast joins, whole-stage codegen),
plus scale-oriented LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) and a Structured Streaming surface.

Layout:
    session.py    SparkSession bootstrap tuned for local[32] + 100 TB posture notes
    catalog.py    table loaders for the driver's parquet testdata
    functions/    scalar expression library (F1-F13) + determinism helpers
    operators/    windows (W1-W8), metrics (A1-A14), joins (J1-J5), dedup,
                  similarity, text analysis, top-k
    plans/        the query registry consumed by __spark_entry__ (queries + oracles)
    sources/      yfinance-shaped Python DataSource, REST source, parquet sink
    streaming/    Structured Streaming over the events feed (§2.10)
    multimodal/   binary-column decode/feature plumbing (stubbed codecs)
"""

__version__ = "0.1.0"
