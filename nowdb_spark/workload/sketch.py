"""Sketch-aggregate gate rows (sk01-sk04).

Every row is value-exact against DuckDB because the sketches are
deterministic md5 arithmetic (see operators/sketches.py): the oracle
REPLAYS the sketch — registers, collisions, corrections and all —
rather than comparing against the exact answer with a tolerance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.operators import sketches as sk
from nowdb_spark.workload import register, table


# --- sk01: HyperLogLog distinct --------------------------------------------

@register(
    "sk01_hll_distinct",
    sk.hll_oracle_sql("orders", "o_custkey"),
    doc="HLL(p=12) distinct o_custkey: md5 registers, integer-scaled "
        "harmonic sum, linear-counting correction — oracle replays "
        "the sketch exactly",
)
def sk01_hll_distinct(spark, sf_dir):
    return sk.hll_distinct(table(spark, sf_dir, "orders"), "o_custkey")


# --- sk02: Count-Min heavy hitters ------------------------------------------

_CMS_MIN = 620  # avg l_suppkey freq is ~600 at every SF ratio; CMS
                # over-counts only, so the qualifying set is stable
                # and identical on both engines (collisions included)


@register(
    "sk02_cms_heavy_hitters",
    sk.cms_oracle_sql("lineitem", "l_suppkey", _CMS_MIN),
    doc="Count-Min (d=4, w=1024) heavy hitters over l_suppkey — "
        "oracle replays every cell update, the deterministic "
        "heavy-bucket candidate pre-pass, and the min-probe",
)
def sk02_cms_heavy_hitters(spark, sf_dir):
    return sk.cms_heavy_hitters(
        table(spark, sf_dir, "lineitem"), "l_suppkey", _CMS_MIN)


_SK02B_CAND = ("SELECT DISTINCT CAST(s_suppkey AS STRING) AS key "
               "FROM supplier WHERE s_nationkey < 5")


@register(
    "sk02b_cms_targeted_probe",
    sk.cms_oracle_sql("lineitem", "l_suppkey", _CMS_MIN,
                      candidates_sql=_SK02B_CAND),
    doc="CMS probe with an EXPLICIT candidate frame (suppliers from "
        "five nations) — the bounded-candidates path a 100 TB monitor "
        "uses when the watchlist comes from a prior pass; oracle "
        "replays the identical candidate SQL",
)
def sk02b_cms_targeted_probe(spark, sf_dir):
    sup = table(spark, sf_dir, "supplier")
    cand = sup.where(F.col("s_nationkey") < 5).select("s_suppkey")
    return sk.cms_heavy_hitters(
        table(spark, sf_dir, "lineitem"), "l_suppkey", _CMS_MIN,
        candidates=cand)


# --- sk03: KLL quantile sketch ----------------------------------------------

_QS = (0.1, 0.25, 0.5, 0.75, 0.9)
# k >= n at gate/bench scales -> the sketch is provably exact (no
# compaction fires), so exact order statistics are a true oracle.
# The compacting regime (k=200 over 50k rows) is property-tested for
# the KLL rank-error bound in tests/test_sketches.py.
_KLL_K = 1_000_000


@register(
    "sk03_kll_quantiles",
    sk.kll_oracle_sql("lineitem", "l_extendedprice", _QS),
    doc="KLL quantile sketch (deterministic compaction coin) over "
        "l_extendedprice; exact regime at gate scale",
)
def sk03_kll_quantiles(spark, sf_dir):
    return sk.kll_quantiles(
        table(spark, sf_dir, "lineitem"), "l_extendedprice", _QS,
        k=_KLL_K)


# --- sk04: Bloom-filter membership ------------------------------------------

def _bloom_oracle() -> str:
    build = " UNION ALL ".join(
        f"SELECT {sk._bloom_pos_sql('p_partkey', j, 'duckdb')} AS pos "
        f"FROM part WHERE p_size <= 5"
        for j in range(sk.BLOOM_HASHES))
    probe = " UNION ALL ".join(
        f"SELECT l_partkey, {j} AS j, "
        f"{sk._bloom_pos_sql('l_partkey', j, 'duckdb')} AS pos FROM keys"
        for j in range(sk.BLOOM_HASHES))
    return f"""
WITH bits AS (SELECT DISTINCT pos FROM ({build})),
keys AS (SELECT DISTINCT l_partkey FROM lineitem),
probe AS ({probe})
SELECT p.l_partkey AS partkey
FROM probe p JOIN bits b USING (pos)
GROUP BY p.l_partkey
HAVING COUNT(*) = {sk.BLOOM_HASHES}
ORDER BY partkey
"""


@register(
    "sk04_bloom_membership",
    _bloom_oracle(),
    doc="Bloom filter (m=65536, k=5) built on small-size parts, "
        "probed by distinct lineitem partkeys — false positives are "
        "part of the contract and replayed by the oracle",
)
def sk04_bloom_membership(spark, sf_dir):
    part = table(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    bloom = sk.bloom_build(part, "p_partkey")
    keys = (table(spark, sf_dir, "lineitem")
            .select(F.col("l_partkey").alias("partkey")).distinct())
    return (sk.bloom_probe(keys, "partkey", bloom)
            .select("partkey").orderBy("partkey"))


# --- fz01: fuzzy (edit-distance) pairs --------------------------------

@register(
    "fz01_fuzzy_name_pairs",
    """
    WITH n AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
    SELECT a.p_name AS v1, b.p_name AS v2,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM n a, n b
    WHERE a.p_name < b.p_name
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    doc="edit-distance pairs over distinct part names — Spark runs "
        "the length-banded equality join (operators/fuzzy.py), the "
        "oracle brute-forces; both engines' levenshtein are unit-cost",
)
def fz01_fuzzy_name_pairs(spark, sf_dir):
    from nowdb_spark.operators.fuzzy import fuzzy_pairs
    return fuzzy_pairs(table(spark, sf_dir, "part"), "p_name",
                       max_dist=2)


# --- sk05: KMV/theta set-overlap sketch -------------------------------

_KMV_K = 64  # below the ~150 distinct users per side, so the gate
             # exercises the (k-1)*domain/h_k estimator branch


def _sk05_oracle() -> str:
    return sk.kmv_overlap_oracle_sql(
        "(SELECT user_id FROM events WHERE event_type = 'view')",
        "user_id",
        "(SELECT user_id FROM events WHERE event_type = 'purchase')",
        "user_id", k=_KMV_K)


@register(
    "sk05_kmv_overlap",
    _sk05_oracle(),
    doc="KMV/theta sketch set overlap: distinct viewers vs purchasers "
        "— union/intersection estimates HLL registers cannot express; "
        "oracle replays the k-smallest-hash sets value-exact",
)
def sk05_kmv_overlap(spark, sf_dir):
    from pyspark.sql import functions as F
    ev = table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    return sk.kmv_set_overlap(views, "user_id", buys, "user_id",
                              k=_KMV_K)


# --- sk06: KMV/theta a-not-b difference sketch ------------------------

def _sk06_oracle() -> str:
    return sk.kmv_difference_oracle_sql(
        "(SELECT user_id FROM events WHERE event_type = 'view')",
        "user_id",
        "(SELECT user_id FROM events WHERE event_type = 'purchase')",
        "user_id", k=_KMV_K)


@register(
    "sk06_kmv_difference",
    _sk06_oracle(),
    doc="KMV/theta sketch a-not-b: viewers who never purchased — the "
        "set-difference estimate HLL cannot express at all and "
        "inclusion-exclusion gets catastrophically wrong for small "
        "differences; oracle replays the k-smallest-hash sets "
        "value-exact",
)
def sk06_kmv_difference(spark, sf_dir):
    from pyspark.sql import functions as F
    ev = table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    return sk.kmv_set_difference(views, "user_id", buys, "user_id",
                                 k=_KMV_K)
