"""ntripmonitor_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of SDFIdk/NTRIPmonitor, re-expressed
Spark-first (DataFrame/SQL + Catalyst + Structured Streaming).

Layout:
    session    — SparkSession factory tuned for the harness (local[N])
    tables     — loaders/views for the synthetic test tables
    schemas    — logical schemas of the reference's relational model
    functions/ — scalar/vectorized kernels (CRC-24Q, bitfields, GNSS time)
    sources/   — framing + replay/streaming sources, sourcetable parsing
    operators/ — decode, flatten, dedup, simsearch, text, multimodal
    plans/     — the declared query set (Spark callable + DuckDB oracle SQL)
    streaming/ — Structured Streaming jobs and sinks
"""

__version__ = "0.1.0"
