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
