"""Streaming ingest + windowed aggregation over nowdb-style contexts.

Mapping (SURVEY §2.6, §7 step 7):
  insert path + background sorter  →  writeStream into the context's
      parquet dir (exactly-once via checkpoint; compaction = OPTIMIZE
      job, not needed for correctness)
  time-partitioned files [from,to)  →  day-bucket partition column
  (new) watermarked windows         →  tumbling / sliding / session
      windows over the ns stamp converted to TimestampType at the
      window boundary only

Scale stance: state size is bounded by the watermark horizon; the
shuffle key is (window, group keys) which AQE re-balances; no
collect/driver loops.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nowdb_spark import timeutil as TU
from nowdb_spark.catalog import TypeDef


def stream_from_context(spark: SparkSession, ctx_dir: str,
                        tdef: TypeDef) -> DataFrame:
    """readStream over a context's parquet dir (new files = new data,
    exactly how the reference's pending files become visible)."""
    schema = tdef.spark_schema()
    df = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 16)
          .parquet(str(ctx_dir)))
    return df


def stream_into_context(df: DataFrame, ctx_dir: str, checkpoint: str,
                        stamp_col: Optional[str] = None):
    """writeStream appending into a context dir; day-bucket partitioned
    when stamped. Returns the StreamingQuery."""
    if stamp_col is not None:
        df = df.withColumn("__tb", TU.day_bucket(F.col(stamp_col)))
        writer = df.writeStream.partitionBy("__tb")
    else:
        writer = df.writeStream
    return (writer.format("parquet")
            .option("path", str(ctx_dir))
            .option("checkpointLocation", str(checkpoint))
            .outputMode("append")
            .start())


def _with_event_time(df: DataFrame, stamp_col: str) -> DataFrame:
    """ns-Long stamp → TimestampType event-time column `__et`."""
    return df.withColumn("__et", TU.ns_to_ts(F.col(stamp_col)))


def windowed_agg(df: DataFrame, stamp_col: str, keys: list[str],
                 aggs: list, window: str = "5 minutes",
                 slide: Optional[str] = None,
                 watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling (or sliding, if `slide`) window aggregate.

    Works on both streaming and batch frames (batch ignores the
    watermark) — the batch run is the differential oracle for the
    streaming run in tests.

    Output: window_start/window_end as i64 ns (engine time policy),
    the keys, and the aggregate columns.
    """
    et = _with_event_time(df, stamp_col)
    if et.isStreaming:
        et = et.withWatermark("__et", watermark)
    win = (F.window("__et", window, slide) if slide
           else F.window("__et", window))
    out = (et.groupBy(win.alias("__w"), *keys).agg(*aggs))
    return out.select(
        TU.ts_to_ns(F.col("__w.start")).alias("window_start_ns"),
        TU.ts_to_ns(F.col("__w.end")).alias("window_end_ns"),
        *keys,
        *[c for c in out.columns if c not in ("__w", *keys)],
    )


def session_window_agg(df: DataFrame, stamp_col: str, keys: list[str],
                       aggs: list, gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Session windows (gap-based), watermarked for streaming state
    cleanup; batch-compatible like windowed_agg."""
    et = _with_event_time(df, stamp_col)
    if et.isStreaming:
        et = et.withWatermark("__et", watermark)
    win = F.session_window("__et", gap)
    out = et.groupBy(win.alias("__w"), *keys).agg(*aggs)
    return out.select(
        TU.ts_to_ns(F.col("__w.start")).alias("window_start_ns"),
        TU.ts_to_ns(F.col("__w.end")).alias("window_end_ns"),
        *keys,
        *[c for c in out.columns if c not in ("__w", *keys)],
    )


def stream_dedup(df: DataFrame, stamp_col: str, keys: list[str],
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming EXACT DEDUPLICATION on an identity key — the
    dedup-at-ingest front door. Streaming path: watermarked
    ``dropDuplicatesWithinWatermark`` (state is one entry per live
    key, evicted once the watermark passes it — bounded state at
    100 TB/day ingest). Batch path: plain dropDuplicates — the batch
    run is the differential oracle for the streaming run. Output =
    the distinct key tuples."""
    et = _with_event_time(df, stamp_col)
    if et.isStreaming:
        et = (et.withWatermark("__et", watermark)
              .dropDuplicatesWithinWatermark(keys))
    else:
        et = et.dropDuplicates(keys)
    return et.select(*keys)


def run_stream_to_memory(sdf: DataFrame, query_name: str,
                         output_mode: str = "complete"):
    """Drive a streaming frame to completion against the memory sink
    (local testing harness; production sinks are parquet/kafka)."""
    q = (sdf.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name).start())
    q.processAllAvailable()
    return q


def stateful_running_totals(df: DataFrame, key_col: str, value_col: str,
                            stamp_col: str,
                            watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator: per-key running count/sum emitted per
    micro-batch (applyInPandasWithState) — the pattern for operators
    Spark's built-ins can't express (reference analogue: the vertex
    cache keeping per-key state on the insert path).

    State = (count, sum) per key; bounded by key cardinality.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (f"{key_col} long, n long, total double")
    state_schema = "n long, total double"

    def fn(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    et = _with_event_time(df, stamp_col).withWatermark("__et", watermark)
    return (et.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key_col: str, stamp_col: str,
                         lookback: str = "6 hours",
                         watermark: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: each left row pairs with right
    rows of the same key whose stamp falls within
    [left.stamp − lookback, left.stamp] (the streaming twin of the
    batch as-of/interval correlation, e.g. purchases ⋈ recent views).

    Both sides carry watermarks, and the time-range condition bounds
    the join state: Spark retains right-side rows only for
    lookback + watermark before dropping them — state is O(rate ×
    horizon), never the full history. Works unchanged on batch frames
    (the differential tests exploit this).

    Output: left columns + right columns suffixed `_r` (stamps stay
    ns Longs; the internal event-time columns are dropped).
    """
    lt = _with_event_time(left, stamp_col)
    rt = _with_event_time(right, stamp_col)
    if lt.isStreaming:
        lt = lt.withWatermark("__et", watermark)
    if rt.isStreaming:
        rt = rt.withWatermark("__et", watermark)
    rt = rt.select(*[F.col(c).alias(f"{c}_r") for c in rt.columns])
    cond = ((lt[key_col] == rt[f"{key_col}_r"])
            & (rt["__et_r"] >= lt["__et"] - F.expr(f"INTERVAL {lookback}"))
            & (rt["__et_r"] <= lt["__et"]))
    return lt.join(rt, cond, "inner").drop("__et", "__et_r")


def stream_ewma(df: DataFrame, key_col: str, value_col: str,
                stamp_col: str, alpha: float,
                watermark: str = "1 hour") -> DataFrame:
    """Streaming EWMA: the stateful twin of operators/timeseries.ewma
    (same recurrence y = (1-α)·y + α·v, same IEEE op order, so batch
    backfill and streaming ingest agree bit-for-bit when events arrive
    in event-time order).

    State per key = (initialized, last_y) — O(keys), not O(events).
    Rows are folded in (stamp, value) order WITHIN each micro-batch;
    cross-batch order is arrival order, the honest semantics of a
    one-pass streaming recurrence (reorder-buffering late data would
    need the full watermark horizon in state — that variant is the
    batch operator over a compacted context).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (f"{key_col} long, {stamp_col} long, "
                  f"{value_col} double, ewma double")
    state_schema = "initialized boolean, y double"

    def fn(key, pdf_iter, state):
        init, y = state.get if state.exists else (False, 0.0)
        frames = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values([stamp_col, value_col])
            out = []
            for v in pdf[value_col].to_numpy():
                y = v if not init else (1 - alpha) * y + alpha * v
                init = True
                out.append(y)
            frames.append(pd.DataFrame({
                key_col: pdf[key_col].to_numpy(),
                stamp_col: pdf[stamp_col].to_numpy(),
                value_col: pdf[value_col].to_numpy(),
                "ewma": out,
            }))
        state.update((init, float(y)))
        yield from frames

    et = _with_event_time(df, stamp_col).withWatermark("__et", watermark)
    return (et.drop("__et").groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))
