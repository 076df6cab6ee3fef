"""nowdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of toschoo/nowdb (graph-flavored time-series
DB speaking a SQL subset; see /root/reference and SURVEY.md).

Design stance (SURVEY.md §7): reproduce nowdb's *semantics and API
surface* on idiomatic PySpark — DataFrame/SQL plans optimized by
Catalyst, Parquet columnar storage, Structured Streaming for ingest —
and do NOT reproduce its storage engine (pages, background sorters,
B-tree indexes, text dictionaries), each of which is dominated by a
built-in Spark/Parquet mechanism.

Layout:
    session     — tuned SparkSession factory
    timeutil    — nanosecond time policy helpers (nowdb stamps are i64 ns)
    functions/  — nowdb scalar op + aggregate surface as Column builders
    catalog/    — scopes / vertex types / edge types (metadata registry)
    sql/        — the nowdb SQL dialect front-end (lexer, parser, binder)
    engine      — Engine.execute(sql) -> Result, mirroring pynow client
    sources/    — CSV loader (LOAD statement), parquet-backed contexts
    operators/  — dedup / similarity / text-analysis / multimodal / graph
    streaming/  — Structured Streaming ingest + windowed aggregation
    workload/   — the oracle-checked query battery (driver contract)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level API: from nowdb_spark import Engine / get_spark /
    # connect / NowServer  (lazy so importing the package stays cheap
    # and avoids pyspark import cost for metadata-only uses)
    if name == "Engine":
        from nowdb_spark.engine import Engine
        return Engine
    if name == "get_spark":
        from nowdb_spark.session import get_spark
        return get_spark
    if name == "connect":
        from nowdb_spark.client import connect
        return connect
    if name == "NowServer":
        from nowdb_spark.server import NowServer
        return NowServer
    raise AttributeError(name)
