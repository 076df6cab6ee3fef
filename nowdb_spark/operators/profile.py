"""Dataset profiling: one-pass per-column statistics.

The "what is in this table" primitive every analytics engine ships
(nowdb's DESC shows the schema; this shows the DATA). One aggregation
job computes, for every column: row/null counts, distinct count
(exact or HLL), min/max, and for numeric columns mean and stddev —
all as a long-format (column, metric) frame that is stable as the
schema evolves.

Shape at 100 TB: a single full scan with map-side partial aggregation
— every statistic here is algebraic or sketchable, so the shuffle
carries one partial state per column per partition. Use
``approx=True`` (HLL distinct) at scale; exact distinct shuffles per
column and is the oracle-checkable default at gate sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile(df: DataFrame, columns: list | None = None,
            approx: bool = False) -> DataFrame:
    """Long-format per-column profile: (column, n_rows, n_nulls,
    n_distinct, min_str, max_str, mean, stddev) — one row per column,
    computed in ONE aggregation pass. min/max are cast to string so
    every column type fits one output schema; mean/stddev are NULL for
    non-numeric columns. ``approx`` swaps exact distinct counts for
    HLL++ (rsd 5%) — the 100 TB path."""
    cols = columns or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (F.approx_count_distinct(c) if approx
                    else F.count_distinct(F.col(c)))
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            # min/max over the NATIVE type, cast after — a
            # lexicographic string min would order "10" < "9"
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
        if isinstance(fields[c], _NUMERIC):
            aggs += [
                F.round(F.avg(F.col(c)), 6).alias(f"{c}__mean"),
                F.round(F.coalesce(F.stddev_samp(F.col(c)), F.lit(0.0)),
                        6).alias(f"{c}__stddev"),
            ]
    row = df.agg(*aggs)
    spark = df.sparkSession
    out = []
    r = row.first()
    for c in cols:
        out.append((
            c, int(r["__n"]), int(r[f"{c}__nulls"]),
            int(r[f"{c}__distinct"]),
            r[f"{c}__min"], r[f"{c}__max"],
            float(r[f"{c}__mean"]) if f"{c}__mean" in r.asDict()
            and r[f"{c}__mean"] is not None else None,
            float(r[f"{c}__stddev"]) if f"{c}__stddev" in r.asDict()
            and r[f"{c}__stddev"] is not None else None,
        ))
    return spark.createDataFrame(
        out, "column string, n_rows long, n_nulls long, "
             "n_distinct long, min_str string, max_str string, "
             "mean double, stddev double")
