"""SparkSession factory tuned for this engine.

Local testing runs on local[N] with one JVM; the configuration is
chosen so the same code scales to a multi-executor cluster:
  - AQE on (runtime re-plan: partition coalescing, skew-join splitting)
  - shuffle partitions sized to cores locally (cluster: leave to AQE)
  - Arrow enabled for every pandas interchange (Pandas UDFs, toPandas)
  - session timezone pinned to UTC so timestamp semantics match the
    DuckDB oracle and stay machine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nowdb_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    `cores` defaults to $SPARK_GRAFT_CPUS or 32 (the driver contract).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # bytes-based coalescing misjudges CPU-heavy, highly
        # compressible shuffles (e.g. 8.7M packed pair rows compress
        # to ~2MB and get squeezed onto 2 tasks, serializing the
        # aggregate — measured 2x slowdown on g01). A small floor only
        # raises parallelism when shuffle bytes are tiny; at real
        # scale partitions never shrink to 64KB, so the cluster
        # behavior is unchanged.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "64KB")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # nowdb stamps are i64 nanoseconds (reference types/types.h:70-71);
        # read parquet TIMESTAMP(NANOS) columns as ns-Longs and convert at
        # the presentation edge via nowdb_spark.timeutil.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
