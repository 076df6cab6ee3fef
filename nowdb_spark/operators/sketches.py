"""Mergeable sketch aggregates: HyperLogLog, Count-Min, KLL quantiles,
Bloom membership.

The reference engine computes exact aggregates only (fun/fun.c:
count/sum/min/max/avg/median/...); at 100 TB several of those stop
being affordable (exact COUNT DISTINCT shuffles every key; exact
median shuffles every value). This module adds the standard mergeable
sketches as first-class operators, built so that

  * every register update is a deterministic md5-derived integer —
    the SAME bucket/rank arithmetic is expressible in ANSI SQL, so
    DuckDB replays the whole sketch and the gate compares value-exact
    (no "approximately equal" escape hatch);
  * all register sums are INTEGER-scaled (e.g. ``sum(2^(21-rank))``
    with 4096 registers is < 2^33), so floating-point summation order
    — the classic cross-engine hash-breaker — cannot appear;
  * the per-row work is pure Column expressions (JVM-side, inside
    WholeStageCodegen); the only shuffle is the tiny
    ``groupBy(register)`` whose key domain is the sketch width.

Shape at 100 TB: each sketch is algebraic — partial registers combine
by max (HLL), sum (CMS), bit-or (Bloom), or compaction (KLL) — so a
full-table sketch is one map-side-combined aggregation over a few
thousand keys.  Compare ``profile.profile(approx=True)`` which uses
Spark's built-in HLL++; this module exists for when the sketch itself
must be a queryable, mergeable, persistable artifact (union of daily
sketches, heavy-hitter monitors, quantile registries).

No counterpart in the reference (beyond exact median at fun/fun.c);
this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet/Fusy/Gandouet/Meunier 2007)
# ---------------------------------------------------------------------------

HLL_P = 12                     # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
HLL_RANK_BITS = 20             # rank in 1..21; see note below
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)   # standard alpha_m, m >= 128

# Register geometry: md5 hex chars [0:3] -> 12-bit register id, hex
# chars [3:8] -> 20-bit rank field w; rank = (leading zeros of w) + 1,
# capped at 21.  A 32-bit hash caps reliable cardinality around ~10^8
# per sketch — the register max() merge is what matters at 100 TB
# (sketch-per-day, union across days).  The integer-scaled register
# sum  S* = sum over registers of 2^(21 - rank)  (empty register ->
# 2^21) is <= 4096 * 2^21 = 2^33: exact in int64 AND exact in any
# summation order, which is what makes the DuckDB oracle hash-match.


def _hex_to_int(hexpr: str, dialect: str) -> str:
    """hex-string -> BIGINT, per engine: Spark has conv(s,16,10) but
    will not cast '0x..' strings; DuckDB has no conv but casts
    '0x..' literals-as-strings.  Same VALUE either way."""
    if dialect == "spark":
        return f"CAST(conv({hexpr}, 16, 10) AS BIGINT)"
    return f"CAST(('0x' || {hexpr}) AS BIGINT)"


def _hll_rank_case_sql(w: str) -> str:
    """rank = clz(w over 20 bits) + 1 as a pure integer CASE chain —
    identical text runs on Spark SQL and DuckDB (no log2 float risk)."""
    branches = " ".join(
        f"WHEN {w} >= {1 << (HLL_RANK_BITS - r)} THEN {r}"
        for r in range(1, HLL_RANK_BITS + 1))
    return f"(CASE {branches} ELSE {HLL_RANK_BITS + 1} END)"


def _hll_register_exprs(key_sql: str, dialect: str) -> tuple[str, str]:
    """(register_sql, rank_sql) over a string-typed key expression.
    Same arithmetic on the Spark side and in the DuckDB oracle; only
    the hex->int spelling differs per engine."""
    h = f"md5(CAST({key_sql} AS STRING))"
    # DuckDB and Spark both expose substring(s, start, len) 1-based.
    reg = _hex_to_int(f"substring({h}, 1, 3)", dialect)
    w = _hex_to_int(f"substring({h}, 4, 5)", dialect)
    return reg, _hll_rank_case_sql(w)


def hll_sketch(df: DataFrame, col: str) -> DataFrame:
    """Build the HLL register table: (register, max_rank), one row per
    non-empty register.  Mergeable: union two sketches and re-take
    ``max(max_rank)`` per register.  NULLs are skipped (SQL COUNT
    DISTINCT semantics)."""
    reg_sql, rank_sql = _hll_register_exprs(col, "spark")
    return (df.where(F.col(col).isNotNull())
              .select(F.expr(reg_sql).alias("register"),
                      F.expr(rank_sql).alias("rank"))
              .groupBy("register")
              .agg(F.max("rank").alias("max_rank")))


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """One-row estimate frame from a register table:
    (n_registers_set, s_scaled, estimate).  ``s_scaled`` is the exact
    integer  sum 2^(21-max_rank) + (m - set) * 2^21 ; the estimate is
    the standard bias-corrected harmonic mean with the small-range
    linear-counting correction, rounded to 4 decimals."""
    top = HLL_RANK_BITS + 1     # 21
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_registers_set"),
        # empty sketch: SUM over zero rows is NULL — coalesce keeps
        # s_scaled at its well-defined all-empty value m*2^top and the
        # estimate at 0.0 (linear branch, ln(m/m))
        F.coalesce(
            F.sum(F.expr(f"CAST(pow(2, {top} - max_rank) AS BIGINT)")),
            F.lit(0)).alias("s_set"))
    scale = float(1 << top)
    est_raw = (F.lit(HLL_ALPHA * HLL_M * HLL_M * scale)
               / F.col("s_scaled").cast("double"))
    zeros = F.lit(HLL_M) - F.col("n_registers_set")
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    est = F.when((est_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), linear) \
           .otherwise(est_raw)
    return (agg
            .withColumn("s_scaled",
                        F.col("s_set")
                        + (F.lit(HLL_M) - F.col("n_registers_set"))
                        * F.lit(1 << top))
            .select("n_registers_set", "s_scaled",
                    F.round(est, 4).alias("estimate")))


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """Convenience: sketch + estimate in one call."""
    return hll_estimate(hll_sketch(df, col))


def hll_oracle_sql(table: str, col: str,
                   where: str = "1=1") -> str:
    """The unrolled DuckDB replay of hll_distinct — same md5 register
    arithmetic, same integer-scaled sum, same correction branch."""
    reg_sql, rank_sql = _hll_register_exprs(col, "duckdb")
    top = HLL_RANK_BITS + 1
    m = HLL_M
    # one pre-multiplied double literal: DuckDB would otherwise parse
    # the alpha constant as DECIMAL and overflow the multiplication
    num = repr(HLL_ALPHA * HLL_M * HLL_M * float(1 << top))
    return f"""
WITH regs AS (
  SELECT {reg_sql} AS register, MAX({rank_sql}) AS max_rank
  FROM {table}
  WHERE {col} IS NOT NULL AND ({where})
  GROUP BY 1
), agg AS (
  SELECT COUNT(*) AS n_registers_set,
         CAST(COALESCE(SUM(CAST(pow(2, {top} - max_rank) AS BIGINT)), 0)
              + ({m} - COUNT(*)) * {1 << top} AS BIGINT) AS s_scaled
  FROM regs
)
SELECT n_registers_set, s_scaled,
       ROUND(CASE WHEN ({num} / CAST(s_scaled AS DOUBLE)) <= {2.5 * m}
                   AND ({m} - n_registers_set) > 0
             THEN {float(m)} * ln({float(m)}
                                  / CAST({m} - n_registers_set AS DOUBLE))
             ELSE {num} / CAST(s_scaled AS DOUBLE) END, 4) AS estimate
FROM agg
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode/Muthukrishnan 2005) + heavy hitters
# ---------------------------------------------------------------------------

CMS_WIDTH = 1024
CMS_DEPTH = 4


def _cms_cell_sql(key_sql: str, j: int, dialect: str) -> str:
    """Row-j cell index for a key: 28 md5 bits mod width — exact
    integer arithmetic on both engines."""
    h = f"md5(concat(CAST({key_sql} AS STRING), '#cms{j}'))"
    return f"({_hex_to_int(f'substring({h}, 1, 7)', dialect)} % {CMS_WIDTH})"


def cms_sketch(df: DataFrame, col: str) -> DataFrame:
    """Build the (depth x width) counter table as rows
    (row_id, cell, cnt).  d register updates per input row are emitted
    via an inline array (no join, no d-fold scan); one groupBy over at
    most depth*width = 4096 keys.  Mergeable by summing cnt."""
    pairs = ", ".join(
        f"named_struct('row_id', {j}, 'cell', {_cms_cell_sql(col, j, 'spark')})"
        for j in range(CMS_DEPTH))
    return (df.where(F.col(col).isNotNull())
              .select(F.explode(F.expr(f"array({pairs})")).alias("u"))
              .select("u.row_id", "u.cell")
              .groupBy("row_id", "cell")
              .agg(F.count(F.lit(1)).alias("cnt")))


CMS_HH_BUCKETS = 1 << 16


def _hh_bucket_sql(key_sql: str, dialect: str,
                   n_buckets: int = CMS_HH_BUCKETS) -> str:
    """Candidate-pruning bucket for a key: 28 md5 bits (a seed
    disjoint from the CMS rows) mod n_buckets — exact integer
    arithmetic on both engines."""
    h = f"md5(concat(CAST({key_sql} AS STRING), '#hhb'))"
    return f"({_hex_to_int(f'substring({h}, 1, 7)', dialect)} % {n_buckets})"


def cms_heavy_hitters(df: DataFrame, col: str, min_count: int,
                      candidates: DataFrame | None = None,
                      n_buckets: int = CMS_HH_BUCKETS) -> DataFrame:
    """Keys whose CMS estimate (min over depth rows of the addressed
    cell) reaches ``min_count``: (key, est).

    CMS guarantees est >= true count, so no true heavy hitter is
    missed; collisions can only over-count.

    The candidate set is BOUNDED: it never shuffles the full distinct
    key domain.  Either the caller passes ``candidates`` (a one-column
    frame from a prior pass), or a deterministic bucket pre-pass runs:
    keys hash into ``n_buckets`` groups, only groups whose TOTAL row
    count reaches ``min_count`` can contain a heavy hitter (a key's
    count <= its bucket's count — no false negatives), and only keys
    in those groups are probed.  Heavy buckets number at most
    N/min_count, and the probed key set shrinks by ~(heavy buckets /
    n_buckets) — the distinct() runs over that residue, not the
    domain.  Fully deterministic (md5 bucket hash), so the DuckDB
    oracle replays the identical pre-pass."""
    sketch = cms_sketch(df, col)
    keys = (df.where(F.col(col).isNotNull())
              .select(F.col(col).cast("string").alias("key")))
    if candidates is not None:
        cand_keys = (candidates
                     .select(F.col(candidates.columns[0])
                             .cast("string").alias("key"))
                     .where(F.col("key").isNotNull()).distinct())
    else:
        b = _hh_bucket_sql("key", "spark", n_buckets)
        with_b = keys.select("key", F.expr(b).alias("__b"))
        heavy = (with_b.groupBy("__b")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .where(F.col("__n") >= min_count).select("__b"))
        cand_keys = (with_b.join(F.broadcast(heavy), "__b", "left_semi")
                     .select("key").distinct())
    cells = ", ".join(
        f"named_struct('row_id', {j}, 'cell', {_cms_cell_sql('key', j, 'spark')})"
        for j in range(CMS_DEPTH))
    cand = (cand_keys
            .select("key", F.explode(F.expr(f"array({cells})")).alias("u"))
            .select("key", "u.row_id", "u.cell"))
    probed = (cand.join(F.broadcast(sketch), ["row_id", "cell"], "left")
                  .groupBy("key")
                  .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                        .alias("est")))
    return probed.where(F.col("est") >= min_count).select("key", "est")


def cms_oracle_sql(table: str, col: str, min_count: int,
                   where: str = "1=1",
                   n_buckets: int = CMS_HH_BUCKETS,
                   candidates_sql: str | None = None) -> str:
    """DuckDB replay of cms_heavy_hitters (same seeds, same cells,
    same heavy-bucket candidate pre-pass — or, when ``candidates_sql``
    is given, the same explicit candidate set)."""
    updates = " UNION ALL ".join(
        f"SELECT {j} AS row_id, {_cms_cell_sql(col, j, 'duckdb')} AS cell "
        f"FROM {table} WHERE {col} IS NOT NULL AND ({where})"
        for j in range(CMS_DEPTH))
    probes = " UNION ALL ".join(
        f"SELECT key, {j} AS row_id, {_cms_cell_sql('key', j, 'duckdb')} AS cell "
        f"FROM cand" for j in range(CMS_DEPTH))
    bsql = _hh_bucket_sql("key", "duckdb", n_buckets)
    if candidates_sql is not None:
        cand_ctes = f"cand AS ({candidates_sql})"
    else:
        cand_ctes = f"""keys AS (
  SELECT CAST({col} AS STRING) AS key, {bsql} AS b
  FROM {table} WHERE {col} IS NOT NULL AND ({where})
), heavy AS (
  SELECT b FROM keys GROUP BY b HAVING COUNT(*) >= {min_count}
), cand AS (
  SELECT DISTINCT key FROM keys WHERE b IN (SELECT b FROM heavy)
)"""
    return f"""
WITH sketch AS (
  SELECT row_id, cell, COUNT(*) AS cnt FROM ({updates}) GROUP BY 1, 2
), {cand_ctes}, probe AS ({probes})
SELECT key, MIN(COALESCE(s.cnt, 0)) AS est
FROM probe p LEFT JOIN sketch s USING (row_id, cell)
GROUP BY key
HAVING MIN(COALESCE(s.cnt, 0)) >= {min_count}
"""


# ---------------------------------------------------------------------------
# KLL-style quantile sketch (Karnin/Lang/Liberty 2016, deterministic coin)
# ---------------------------------------------------------------------------

def _kll_coin(level: int, epoch: int) -> bool:
    """Deterministic replacement for KLL's random compaction coin:
    md5 parity of (level, epoch).  Keeps the sketch reproducible run
    to run (same input partitioning -> same sketch), which the tests
    rely on; the KLL error analysis only needs the coin to be
    unbiased across compactions, which a hash parity is."""
    import hashlib
    d = hashlib.md5(f"kll:{level}:{epoch}".encode()).digest()
    return bool(d[0] & 1)


class _KLL:
    """Single-machine KLL state: one sorted-ish buffer per level;
    weight of an item at level l is 2^l.  Capacity ``k`` bounds every
    level's buffer; total memory O(k log(n/k))."""

    def __init__(self, k: int):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.epochs = 0

    def add(self, v: float) -> None:
        self.levels[0].append(v)
        if len(self.levels[0]) >= self.k:
            self._compact(0)

    def _compact(self, lvl: int) -> None:
        buf = sorted(self.levels[lvl])
        if len(self.levels) == lvl + 1:
            self.levels.append([])
        self.epochs += 1
        keep = buf[1::2] if _kll_coin(lvl, self.epochs) else buf[0::2]
        self.levels[lvl + 1].extend(keep)
        self.levels[lvl] = []
        if len(self.levels[lvl + 1]) >= self.k:
            self._compact(lvl + 1)

    def merge(self, other: "_KLL") -> None:
        for lvl, buf in enumerate(other.levels):
            while len(self.levels) <= lvl:
                self.levels.append([])
            self.levels[lvl].extend(buf)
            if len(self.levels[lvl]) >= self.k:
                self._compact(lvl)

    def items(self) -> list[tuple[float, int]]:
        out = []
        for lvl, buf in enumerate(self.levels):
            out.extend((v, 1 << lvl) for v in buf)
        return out

    def quantile(self, q: float):
        it = sorted(self.items())
        if not it:               # empty / all-NULL input -> NULL
            return None
        total = sum(w for _, w in it)
        # type-1 (lower) order statistic at rank ceil(q * n)
        target = max(1, math.ceil(q * total))
        acc = 0
        for v, w in it:
            acc += w
            if acc >= target:
                return v
        return it[-1][0]


def kll_quantiles(df: DataFrame, col: str, qs: Sequence[float],
                  k: int = 4096) -> DataFrame:
    """Distributed KLL: per-partition sketches built in Arrow batches
    (mapInPandas, narrow), then TREE-merged: with P input partitions,
    an intermediate level of ~sqrt(P) merge tasks combines partial
    sketches before the single final task, so no task ever holds more
    than ~sqrt(P) * k * log items — at ~10k tasks the flat
    coalesce(1) merge would concentrate all P partials in one task.
    Small inputs (P <= 4) skip the intermediate shuffle.

    With k >= n the sketch degenerates to exact order statistics,
    which is what the oracle-exact gate row uses (exact under ANY
    merge tree); the compacting regime is property-tested against a
    rank error bound.
    """
    import pandas as pd  # noqa: F401  (executor-side)

    kk = int(k)

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        sk = _KLL(kk)
        for b in batches:
            for v in b["v"].dropna().to_numpy():
                sk.add(float(v))
        items = sk.items()
        if items:
            yield pd.DataFrame({"v": [v for v, _ in items],
                                "w": [w for _, w in items]})

    src = df.select(F.col(col).cast("double").alias("v"))
    parts = src.mapInPandas(build, "v double, w long")

    def merge_batches(batches) -> _KLL:
        sk = _KLL(kk)
        for b in batches:
            m = _KLL(kk)
            # re-inject weighted items at their level (w = 2^l)
            for v, w in zip(b["v"].to_numpy(), b["w"].to_numpy()):
                lvl = int(w).bit_length() - 1
                while len(m.levels) <= lvl:
                    m.levels.append([])
                m.levels[lvl].append(float(v))
            sk.merge(m)
        return sk

    def mid(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        items = merge_batches(batches).items()
        if items:
            yield pd.DataFrame({"v": [v for v, _ in items],
                                "w": [w for _, w in items]})

    def final(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        sk = merge_batches(batches)
        yield pd.DataFrame({"q": list(qs),
                            "value": [sk.quantile(q) for q in qs]})

    nparts = src.rdd.getNumPartitions()
    if nparts > 4:
        fanin = max(2, math.isqrt(nparts))
        parts = parts.repartition(fanin).mapInPandas(mid,
                                                     "v double, w long")
    return (parts.coalesce(1)
                 .mapInPandas(final, "q double, value double")
                 .orderBy("q"))


def kll_oracle_sql(table: str, col: str, qs: Sequence[float],
                   where: str = "1=1") -> str:
    """Exact type-1 order statistics — valid oracle whenever the gate
    row runs with k >= n (exact regime)."""
    q_rows = ", ".join(f"({q})" for q in qs)
    return f"""
WITH ranked AS (
  SELECT CAST({col} AS DOUBLE) AS v,
         ROW_NUMBER() OVER (ORDER BY CAST({col} AS DOUBLE)) AS r,
         COUNT(*) OVER () AS n
  FROM {table} WHERE {col} IS NOT NULL AND ({where})
)
SELECT CAST(q AS DOUBLE) AS q, v AS value
FROM (VALUES {q_rows}) AS qs(q)
JOIN ranked ON r = GREATEST(1, CAST(ceil(CAST(q AS DOUBLE) * n) AS BIGINT))
ORDER BY q
"""


# ---------------------------------------------------------------------------
# Bloom filter membership (Bloom 1970)
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 16      # 65536-bit filter
BLOOM_HASHES = 5


def _bloom_pos_sql(key_sql: str, j: int, dialect: str = "spark",
                   bits: int = BLOOM_BITS) -> str:
    # 7 hex chars = 28 uniform bits; % by a power of two <= 1<<28
    # keeps the position exactly uniform (callers must respect that)
    h = f"md5(concat(CAST({key_sql} AS STRING), '#bf{j}'))"
    return f"({_hex_to_int(f'substring({h}, 1, 7)', dialect)} % {bits})"


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """Set-bit table (pos) of a Bloom filter over ``col`` — the
    relational representation (distinct positions) merges by UNION
    and broadcasts at ~a few thousand rows."""
    poss = ", ".join(_bloom_pos_sql(col, j) for j in range(BLOOM_HASHES))
    return (df.where(F.col(col).isNotNull())
              .select(F.explode(F.expr(f"array({poss})")).alias("pos"))
              .distinct())


def bloom_probe(df: DataFrame, col: str, bloom: DataFrame) -> DataFrame:
    """Rows of ``df`` whose key passes the filter (all k positions
    set).  Guarantees no false negatives; FP rate ~ (1-e^{-kn/m})^k.

    Membership is a function of the KEY, so the probe runs over the
    distinct keys (groupBy on the raw rows would merge duplicate rows
    and miscount their position hits — a false negative) and the
    verdict rejoins the big side as a semi join; the bloom bit table
    itself is broadcast, and AQE is free to broadcast the passing-key
    set too when it is small."""
    poss = ", ".join(_bloom_pos_sql("__key", j)
                     for j in range(BLOOM_HASHES))
    keys = (df.select(F.col(col).alias("__key")).distinct()
              .withColumn("__pos", F.expr(f"array({poss})")))
    passing = (keys.select("__key", F.explode("__pos").alias("pos"))
                   .join(F.broadcast(bloom), "pos", "inner")
                   .groupBy("__key")
                   .agg(F.count(F.lit(1)).alias("__hits"))
                   .where(F.col("__hits") == BLOOM_HASHES)
                   .select("__key"))
    return df.join(passing, df[col] == passing["__key"], "left_semi")


# ---------------------------------------------------------------------------
# KMV / theta sketch (Bar-Yossef et al. 2002) — distinct counts WITH
# set operations (union / intersection), which HLL registers cannot do
# ---------------------------------------------------------------------------

KMV_K = 256
KMV_DOMAIN = float(1 << 52)     # 13 md5 hex chars -> [0, 2^52)


def _kmv_hash_sql(key_sql: str, dialect: str) -> str:
    h = f"md5(CAST({key_sql} AS STRING))"
    return _hex_to_int(f"substring({h}, 1, 13)", dialect)


def kmv_sketch(df: DataFrame, col: str, k: int = KMV_K) -> DataFrame:
    """The k smallest 52-bit hashes of the column's distinct values —
    one column ``h``.  Mergeable: union two sketches, keep the k
    smallest again.  The heavy lifting is a distinct + top-k
    (TakeOrderedAndProject — no global sort); everything downstream
    operates on <= k rows."""
    return (df.where(F.col(col).isNotNull())
              .select(F.expr(_kmv_hash_sql(col, "spark")).alias("h"))
              .distinct()
              .orderBy("h").limit(int(k)))


def kmv_estimate_expr(k: int):
    """Distinct-count estimator over a sketch aggregated to
    (n = rows, hmax = kth smallest): exact when the sketch is not
    full, else (k-1) * domain / h_k."""
    n, hmax = F.col("n"), F.col("hmax")
    return (F.when(n < k, n.cast("double"))
             .otherwise(F.lit(float(k - 1)) * F.lit(KMV_DOMAIN)
                        / hmax.cast("double")))


def kmv_set_overlap(df_a: DataFrame, col_a: str,
                    df_b: DataFrame, col_b: str,
                    k: int = KMV_K) -> DataFrame:
    """One-row estimate frame for two key sets:
    (n_x, n_shared, jaccard, d_union, d_inter) — the
    theta-sketch intersection: X = k smallest hashes of the hash
    UNION, J = |X ∩ A ∩ B| / |X|, D_inter = J * D_union.

    Every input is deterministic integer arithmetic, so the DuckDB
    oracle (kmv_overlap_oracle_sql) replays it value-exact.  All joins
    happen on <= k-row frames (broadcast)."""
    sa, sb = kmv_sketch(df_a, col_a, k), kmv_sketch(df_b, col_b, k)
    # the union sketch is reused three times below; it is <= k rows by
    # construction, so materialize it once to the driver instead of
    # .persist() (which would leak cached blocks in long-lived
    # sessions — there is no post-return hook to unpersist on)
    spark = df_a.sparkSession
    x_rows = (sa.unionAll(sb).distinct().orderBy("h").limit(int(k))
                .collect())
    x = spark.createDataFrame(x_rows, schema="h long") if x_rows \
        else spark.createDataFrame([], schema="h long")
    shared = (x.join(F.broadcast(sa), "h", "left_semi")
                .join(F.broadcast(sb), "h", "left_semi"))
    agg = (x.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hmax"))
             .crossJoin(shared.agg(F.count(F.lit(1)).alias("n_shared"))))
    d_union = kmv_estimate_expr(k)
    jac = F.col("n_shared").cast("double") / F.col("n").cast("double")
    return agg.select(
        F.col("n").alias("n_x"), "n_shared",
        F.round(jac, 6).alias("jaccard"),
        F.round(d_union, 4).alias("d_union"),
        F.round(jac * d_union, 4).alias("d_inter"))


def kmv_set_difference(df_a: DataFrame, col_a: str,
                       df_b: DataFrame, col_b: str,
                       k: int = KMV_K) -> DataFrame:
    """One-row estimate frame for the set difference A \\ B — the
    theta-sketch a-not-b operation (the one set algebra HLL cannot
    express at all and inclusion-exclusion gets catastrophically
    wrong for small differences): X = k smallest hashes of the hash
    union, frac = |X ∩ A \\ B| / |X|, D_diff = frac · D_union.
    Returns (n_x, n_a_only, frac_a_only, d_union, d_diff).

    Same deterministic integer-hash construction as kmv_set_overlap,
    so the DuckDB oracle replays it value-exact; all joins are on
    <= k-row frames (broadcast)."""
    sa, sb = kmv_sketch(df_a, col_a, k), kmv_sketch(df_b, col_b, k)
    spark = df_a.sparkSession
    x_rows = (sa.unionAll(sb).distinct().orderBy("h").limit(int(k))
                .collect())
    x = spark.createDataFrame(x_rows, schema="h long") if x_rows \
        else spark.createDataFrame([], schema="h long")
    a_only = (x.join(F.broadcast(sa), "h", "left_semi")
                .join(F.broadcast(sb), "h", "left_anti"))
    agg = (x.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hmax"))
             .crossJoin(a_only.agg(
                 F.count(F.lit(1)).alias("n_a_only"))))
    d_union = kmv_estimate_expr(k)
    frac = F.col("n_a_only").cast("double") / F.col("n").cast("double")
    return agg.select(
        F.col("n").alias("n_x"), "n_a_only",
        F.round(frac, 6).alias("frac_a_only"),
        F.round(d_union, 4).alias("d_union"),
        F.round(frac * d_union, 4).alias("d_diff"))


def kmv_difference_oracle_sql(table_a: str, col_a: str,
                              table_b: str, col_b: str,
                              k: int = KMV_K) -> str:
    """DuckDB replay of kmv_set_difference (same hashes, same
    k-smallest sets, same estimator branch)."""
    ha = _kmv_hash_sql(col_a, "duckdb")
    hb = _kmv_hash_sql(col_b, "duckdb")
    return f"""
WITH sa AS (SELECT DISTINCT {ha} AS h FROM {table_a}
            WHERE {col_a} IS NOT NULL ORDER BY 1 LIMIT {k}),
sb AS (SELECT DISTINCT {hb} AS h FROM {table_b}
       WHERE {col_b} IS NOT NULL ORDER BY 1 LIMIT {k}),
x AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL
                              SELECT h FROM sb) ORDER BY 1 LIMIT {k}),
agg AS (SELECT COUNT(*) AS n, MAX(h) AS hmax,
               (SELECT COUNT(*) FROM x
                WHERE h IN (SELECT h FROM sa)
                  AND h NOT IN (SELECT h FROM sb)) AS n_a_only
        FROM x)
SELECT n AS n_x, n_a_only,
       ROUND(CAST(n_a_only AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS frac_a_only,
       ROUND(CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
             ELSE {float(k - 1) * KMV_DOMAIN!r} / CAST(hmax AS DOUBLE)
             END, 4) AS d_union,
       ROUND((CAST(n_a_only AS DOUBLE) / CAST(n AS DOUBLE))
             * CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
               ELSE {float(k - 1) * KMV_DOMAIN!r} / CAST(hmax AS DOUBLE)
               END, 4) AS d_diff
FROM agg
"""


def kmv_overlap_oracle_sql(table_a: str, col_a: str,
                           table_b: str, col_b: str,
                           k: int = KMV_K) -> str:
    """DuckDB replay of kmv_set_overlap (same hashes, same k-smallest
    sets, same estimator branch)."""
    ha = _kmv_hash_sql(col_a, "duckdb")
    hb = _kmv_hash_sql(col_b, "duckdb")
    return f"""
WITH sa AS (SELECT DISTINCT {ha} AS h FROM {table_a}
            WHERE {col_a} IS NOT NULL ORDER BY 1 LIMIT {k}),
sb AS (SELECT DISTINCT {hb} AS h FROM {table_b}
       WHERE {col_b} IS NOT NULL ORDER BY 1 LIMIT {k}),
x AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL
                              SELECT h FROM sb) ORDER BY 1 LIMIT {k}),
agg AS (SELECT COUNT(*) AS n, MAX(h) AS hmax,
               (SELECT COUNT(*) FROM x
                WHERE h IN (SELECT h FROM sa)
                  AND h IN (SELECT h FROM sb)) AS n_shared
        FROM x)
SELECT n AS n_x, n_shared,
       ROUND(CAST(n_shared AS DOUBLE) / CAST(n AS DOUBLE), 6) AS jaccard,
       ROUND(CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
             ELSE {float(k - 1) * KMV_DOMAIN!r} / CAST(hmax AS DOUBLE)
             END, 4) AS d_union,
       ROUND((CAST(n_shared AS DOUBLE) / CAST(n AS DOUBLE))
             * CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
               ELSE {float(k - 1) * KMV_DOMAIN!r} / CAST(hmax AS DOUBLE)
               END, 4) AS d_inter
FROM agg
"""
