"""Skew mitigation primitives.

AQE's skew-join splitting (enabled in session.py) handles most
shuffle-join skew at runtime. These helpers cover the cases AQE
cannot: skewed *aggregation* keys (one reducer owns the hot key) and
joins where the skewed side must meet a non-broadcastable build side.

  salted_agg   — two-phase aggregation: map-side salt → partial agg on
                 (key, salt) → final agg on key. The hot key's rows
                 spread over `n_salts` reducers; the second phase
                 touches only n_salts rows per key.
  salted_join  — explode the small side ×n_salts, salt the big side
                 randomly-but-deterministically (hash of a row id) —
                 the hot key's probe rows spread across reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, n_salts: int) -> Column:
    """Deterministic pseudo-random salt in [0, n_salts) from a column."""
    return F.pmod(F.xxhash64(col), F.lit(n_salts))


def salted_agg(df: DataFrame, key_col: str, salt_source: str,
               n_salts: int, partial_aggs: list, final_aggs: list
               ) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs aggregate within (key, salt); final_aggs combine the
    partials per key (e.g. partial sum+count → final sum/sum for avg).
    """
    salted = df.withColumn("__salt", _salt(F.col(salt_source), n_salts))
    partial = salted.groupBy(key_col, "__salt").agg(*partial_aggs)
    return partial.groupBy(key_col).agg(*final_aggs)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, salt_source: str | None = None,
                how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: big side salted on a row-level column,
    small side replicated ×n_salts. Correct for any `how` on the big
    side ('inner', 'left'); the small side must be the build side."""
    src = salt_source or key
    big_s = big.withColumn("__salt", _salt(F.col(src), n_salts))
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = big_s.join(small_r, [key, "__salt"], how)
    return out.drop("__salt")


def hot_key_split_join(big: DataFrame, small: DataFrame, key: str,
                       hot_threshold: int = 1_000_000,
                       hot_keys: list | None = None,
                       how: str = "inner") -> DataFrame:
    """Split equi-join for keys too hot even for AQE's partition
    splitting: the hot slice joins by broadcasting the matching build
    rows (no shuffle of the hot rows at all), the cold remainder
    shuffle-joins normally.

    Hot keys are detected with one counting pass over `big` unless the
    caller supplies them. Both branches re-read `big` — inherent to a
    split join; on a parquet source that is two pruned scans, the
    price for never materializing a single monster partition.
    Supported `how`: 'inner' and 'left' (classification covers every
    big row exactly once, so the union is exact)."""
    if how not in ("inner", "left"):
        raise ValueError(f"hot_key_split_join supports inner/left: {how}")
    if hot_keys is not None:
        hot = big.sparkSession.createDataFrame(
            [(k,) for k in hot_keys], f"{key} {dict(big.dtypes)[key]}")
    else:
        hot = (big.groupBy(key)
               .agg(F.count(F.lit(1)).alias("__n"))
               .filter(F.col("__n") >= hot_threshold)
               .select(key))
    hot = F.broadcast(hot.localCheckpoint(eager=True))
    big_hot = big.join(hot, key, "left_semi")
    big_cold = big.join(hot, key, "left_anti")
    small_hot = small.join(hot, key, "left_semi")
    out_hot = big_hot.join(F.broadcast(small_hot), key, how)
    out_cold = big_cold.join(small, key, how)
    return out_hot.unionByName(out_cold)
