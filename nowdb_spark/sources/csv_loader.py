"""Typed-CSV bulk loader — the LOAD statement
(reference: scope/loader.c, handler query/stmt.c:1182).

`load 'file.csv' into <ctx> [ignore|use header] [as <type>|as edge <e>]
 [set errors='err.csv']`

Semantics carried over:
  - the model supplies the schema (declared prop order and types);
    CSV columns are positional unless `use header` maps them by name
  - malformed rows do not abort the load: they are diverted to the
    errors file (reference writes a per-load error file); counts are
    reported in the load report
  - delimiter is ';' like the reference's fixtures (db.py:195-199),
    falling back to ',' when the header/first line has no ';'

Spark-first: this is `spark.read.csv` with an explicit schema in
PERMISSIVE mode + a corrupt-record column — a single distributed scan,
no driver-side row loop; at 100 TB this is the same plan as any other
parquet-bound ingest.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nowdb_spark.catalog import NOWDB_TO_SPARK, TypeDef

_CORRUPT = "__corrupt"


def _detect_delimiter(path: str) -> str:
    try:
        with open(path, "r", encoding="utf-8", errors="replace") as fh:
            first = fh.readline()
        return ";" if ";" in first else ","
    except OSError:
        return ";"


def load_csv(spark: SparkSession, path: str, tdef: TypeDef,
             header: str | None = None,
             errors_path: str | None = None) -> tuple[DataFrame, int]:
    """Read a typed CSV for context `tdef`.

    Returns (good_rows_df, error_count); error rows are written to
    errors_path when given.
    """
    schema = T.StructType(
        list(tdef.spark_schema().fields)
        + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    delim = _detect_delimiter(path)
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("sep", delim)
        # both header modes skip exactly one physical line per file:
        # with a user-supplied schema, header=true only consumes the
        # first line (enforceSchema ignores its names) — the
        # reference's "skip line 1" semantics (scope/loader.c). A
        # value-based filter would wrongly drop data rows that happen
        # to equal the header token.
        .option("header", "true" if header in ("use", "ignore") else "false")
        .option("nullValue", "")
    )
    # cache: Spark disallows queries touching only the corrupt-record
    # column on a raw CSV scan; caching also makes the good/bad split
    # a single file pass
    df = reader.csv(path).cache()

    bad = df.filter(F.col(_CORRUPT).isNotNull())
    n_bad = bad.count()
    if n_bad and errors_path:
        bad.select(_CORRUPT).write.mode("overwrite").text(str(errors_path))
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return good, n_bad


def load_structured(spark: SparkSession, path: str, tdef: TypeDef,
                    fmt: str,
                    errors_path: str | None = None) -> tuple[DataFrame, int]:
    """LOAD extension beyond the reference's csv-only loader: ingest
    parquet, ORC or JSON-lines into a context with the same
    malformed-row-diversion contract.

    parquet/ORC are self-describing — columns are matched by name and
    cast to the model's types (a missing model column loads as NULL,
    like a short CSV row would); there is no corrupt-record concept.
    JSON uses the same PERMISSIVE + corrupt-record plan as CSV.
    """
    if fmt in ("parquet", "orc"):
        from nowdb_spark.timeutil import normalize_stamps
        # timestamp-typed columns become Long ns stamps first;
        # a direct timestamp→long cast would yield epoch SECONDS.
        raw = (spark.read.parquet(path) if fmt == "parquet"
               else spark.read.orc(path))
        df = normalize_stamps(raw)
        schema = tdef.spark_schema()
        cols = [
            (F.col(p.name).cast(schema[p.name].dataType)
             if p.name in df.columns else
             F.lit(None).cast(schema[p.name].dataType)).alias(p.name)
            for p in tdef.props
        ]
        return df.select(*cols), 0
    schema = T.StructType(
        list(tdef.spark_schema().fields)
        + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    df = (spark.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", _CORRUPT)
          .json(path).cache())
    bad = df.filter(F.col(_CORRUPT).isNotNull())
    n_bad = bad.count()
    if n_bad and errors_path:
        bad.select(_CORRUPT).write.mode("overwrite").text(str(errors_path))
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return good, n_bad


def write_context(df: DataFrame, ctx_dir: Path, tdef: TypeDef,
                  mode: str = "append", n: int | None = None,
                  codec: str | None = None) -> int:
    """Append rows into a context's parquet store.

    Stamped contexts are partitioned by day bucket of the stamp
    (i64 ns → day index) — the Spark image of the reference's
    per-file [from,to) time periods (io/file.h:59-60): range
    predicates on the stamp prune whole partitions.

    `codec` carries the context's storage compression option
    (reference: CREATE STORAGE ... SET compression='zstd',
    store/comp.h:27-38); parquet supports zstd natively.
    """
    if n is None:
        n = df.count()
    stamp = tdef.stamp_prop
    writer = df.write.mode(mode)
    if codec:
        writer = writer.option("compression", codec)
    if stamp is not None:
        from nowdb_spark.timeutil import day_bucket
        df = df.withColumn("__tb", day_bucket(F.col(stamp)))
        writer = df.write.mode(mode)
        if codec:
            writer = writer.option("compression", codec)
        writer.partitionBy("__tb").parquet(str(ctx_dir))
    else:
        writer.parquet(str(ctx_dir))
    return n
