"""Sketch aggregates: exact-replay oracles are covered by the
test_workload sweep (sk01-sk04); here are the sketch-theoretic
properties the gate rows cannot see — error bounds in the compacting
/ colliding regimes, mergeability, and the no-false-negative
guarantees."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from nowdb_spark.operators import sketches as sk
from tests.conftest import SF_DIR


def test_hll_estimate_within_bound(spark):
    """HLL standard error is 1.04/sqrt(m) ~ 1.6% at m=4096; assert a
    generous 5% on a 20k-distinct column (well past the
    linear-counting regime)."""
    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("user-"), F.col("id")).alias("k"))
    est = sk.hll_distinct(df, "k").collect()[0]["estimate"]
    assert abs(est - n) / n < 0.05, est


def test_hll_merge_equals_union(spark):
    """max-merge of two register tables == sketch of the union."""
    a = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").cast("string").alias("k"))
    merged = (sk.hll_sketch(a, "k").unionAll(sk.hll_sketch(b, "k"))
                .groupBy("register").agg(F.max("max_rank").alias("max_rank")))
    direct = sk.hll_sketch(a.unionAll(b), "k")
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, direct.collect()))
    est = sk.hll_estimate(merged).collect()[0]["estimate"]
    assert abs(est - 9000) / 9000 < 0.05


def test_cms_never_undercounts(spark):
    """CMS estimate >= true count for every key (the defining
    guarantee); with d=4/w=1024 and 500 keys, over-count stays small."""
    rows = [(f"k{i % 500}",) for i in range(20_000)]
    df = spark.createDataFrame(rows, ["k"])
    true = {r["k"]: r["c"] for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    est = {r["key"]: r["est"] for r in
           sk.cms_heavy_hitters(df, "k", 1).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
        assert est[k] <= t + 200, "collision overflow beyond plausible"


def test_cms_mergeable(spark):
    a = spark.createDataFrame([(f"k{i % 50}",) for i in range(1000)], ["k"])
    b = spark.createDataFrame([(f"k{i % 80}",) for i in range(1000)], ["k"])
    merged = (sk.cms_sketch(a, "k").unionAll(sk.cms_sketch(b, "k"))
                .groupBy("row_id", "cell").agg(F.sum("cnt").alias("cnt")))
    direct = sk.cms_sketch(a.unionAll(b), "k")
    assert sorted(map(tuple, merged.collect())) == \
           sorted(map(tuple, direct.collect()))


def test_kll_exact_when_k_ge_n(spark):
    vals = [float(v) for v in random.Random(7).sample(range(100_000), 5000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {r["q"]: r["value"] for r in
           sk.kll_quantiles(df, "x", (0.25, 0.5, 0.9), k=10_000).collect()}
    s = sorted(vals)
    for q, v in got.items():
        assert v == s[max(1, math.ceil(q * len(s))) - 1]


def test_kll_rank_error_bound_compacting(spark):
    """Compacting regime: k=200 over 50k values. KLL rank error is
    O(1/k) with small constants; assert a loose 5% of n."""
    n = 50_000
    rng = random.Random(13)
    vals = [rng.random() for _ in range(n)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(8)
    got = {r["q"]: r["value"] for r in
           sk.kll_quantiles(df, "x", (0.1, 0.5, 0.9), k=200).collect()}
    s = sorted(vals)
    for q, v in got.items():
        # rank of the returned value vs the target rank
        import bisect
        r = bisect.bisect_left(s, v)
        assert abs(r - q * n) < 0.05 * n, (q, r, q * n)


def test_kll_deterministic(spark):
    df = spark.createDataFrame(
        [(float(i % 997),) for i in range(20_000)], ["x"]).coalesce(4)
    a = sk.kll_quantiles(df, "x", (0.5,), k=128).collect()
    b = sk.kll_quantiles(df, "x", (0.5,), k=128).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bloom_no_false_negatives(spark):
    members = spark.range(1000).select(
        F.col("id").cast("string").alias("k"))
    bloom = sk.bloom_build(members, "k")
    probe = spark.range(5000).select(
        F.col("id").cast("string").alias("k"))
    passed = {r["k"] for r in sk.bloom_probe(probe, "k", bloom).collect()}
    assert {str(i) for i in range(1000)} <= passed
    # FP rate with n=1000, m=65536, k=5: (1-e^{-5000/65536})^5 ~ 2e-6;
    # allow a handful out of 4000 non-members
    fps = len(passed) - 1000
    assert fps <= 10, fps


def test_sketch_plans_stay_jvm_side(spark):
    """HLL/CMS are pure Column pipelines: no BatchEvalPython, and HLL
    is exactly one Exchange (the 4096-key register groupBy)."""
    from nowdb_spark.workload import table
    df = table(spark, SF_DIR, "orders")
    plan = sk.hll_distinct(df, "o_custkey") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    cms = sk.cms_sketch(df, "o_custkey") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in cms


# --- streaming maintenance (streaming/sketches.py) -------------------

def test_streaming_sketch_matches_batch(spark, tmp_path):
    """After the stream drains, the merged persisted sketches equal
    the batch sketches of corpus ∪ stream bit-for-bit (HLL registers
    and CMS cells are algebraic — streaming adds no approximation)."""
    import glob
    import shutil

    from nowdb_spark.streaming import sketches as SS
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    s1 = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    s2 = docs.filter(F.col("doc_id") >= 400)

    hll_dir, cms_dir = str(tmp_path / "hll"), str(tmp_path / "cms")
    sk.hll_sketch(corpus, "text").write.parquet(f"{hll_dir}/batch=seed")
    sk.cms_sketch(corpus, "text").write.parquet(f"{cms_dir}/batch=seed")

    src = tmp_path / "src"
    src.mkdir()
    for name, part in (("f1", s1), ("f2", s2)):
        part.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name))
        f = glob.glob(str(tmp_path / "stage" / name / "*.parquet"))[0]
        shutil.copy(f, src / f"{name}.parquet")

    sdf = (spark.readStream.schema(docs.schema)
           .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = SS.stream_sketch_maintenance(
        sdf, "text", str(tmp_path / "ckpt"),
        hll_dir=hll_dir, cms_dir=cms_dir).start()
    q.awaitTermination(timeout=120)

    got_hll = sorted(map(tuple, SS.read_hll(spark, hll_dir).collect()))
    want_hll = sorted(map(tuple, sk.hll_sketch(docs, "text").collect()))
    assert got_hll == want_hll and len(got_hll) > 0

    got_cms = sorted(map(tuple, SS.read_cms(spark, cms_dir).collect()))
    want_cms = sorted(map(tuple, sk.cms_sketch(docs, "text").collect()))
    assert got_cms == want_cms

    est = sk.hll_estimate(SS.read_hll(spark, hll_dir)) \
        .collect()[0]["estimate"]
    true = docs.select("text").distinct().count()
    assert abs(est - true) / true < 0.1


def test_streaming_sketch_replay_idempotent(spark, tmp_path):
    """Replaying a micro-batch (same batch_id) leaves the merged
    state unchanged — the overwrite-own-partition discipline."""
    from nowdb_spark.streaming import sketches as SS
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    hll_dir, cms_dir = str(tmp_path / "h2"), str(tmp_path / "c2")
    SS.maintain_sketch_batch(docs, 0, "text", hll_dir, cms_dir)
    before = sorted(map(tuple, SS.read_hll(spark, hll_dir).collect()))
    SS.maintain_sketch_batch(docs, 0, "text", hll_dir, cms_dir)  # replay
    after = sorted(map(tuple, SS.read_hll(spark, hll_dir).collect()))
    assert before == after
    cms_after = sorted(map(tuple, SS.read_cms(spark, cms_dir).collect()))
    assert cms_after == sorted(map(tuple,
                                   sk.cms_sketch(docs, "text").collect()))


# --- review-pass regressions ------------------------------------------

def test_bloom_probe_keeps_duplicate_rows(spark):
    """Duplicate probe rows must ALL pass (membership is a key
    property; collapsing rows was a false negative)."""
    members = spark.createDataFrame([("a",), ("b",)], ["k"])
    bloom = sk.bloom_build(members, "k")
    probe = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    got = sorted(r["k"] for r in sk.bloom_probe(probe, "k", bloom).collect())
    assert got == ["a", "a", "b"]


def test_kll_empty_input_returns_null(spark):
    df = spark.createDataFrame([], "x double")
    rows = sk.kll_quantiles(df, "x", (0.5,), k=100).collect()
    assert len(rows) == 1 and rows[0]["value"] is None


def test_hll_empty_input_estimates_zero(spark):
    df = spark.createDataFrame([], "k string")
    r = sk.hll_distinct(df, "k").collect()[0]
    assert r["n_registers_set"] == 0
    assert r["s_scaled"] == sk.HLL_M * (1 << (sk.HLL_RANK_BITS + 1))
    assert r["estimate"] == 0.0


# --- KMV / theta sketch ------------------------------------------------

def test_kmv_overlap_accuracy(spark):
    """Known overlap: A = 0..999, B = 500..1499 (J = 1/3,
    |A∪B| = 1500, |A∩B| = 500); k=256 keeps relative error modest."""
    a = spark.range(0, 1000).select(F.col("id").cast("string").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").cast("string").alias("k"))
    r = sk.kmv_set_overlap(a, "k", b, "k", k=256).collect()[0]
    assert abs(r["d_union"] - 1500) / 1500 < 0.25, r
    assert abs(r["jaccard"] - 1 / 3) < 0.15, r
    assert abs(r["d_inter"] - 500) / 500 < 0.45, r


def test_kmv_exact_when_small(spark):
    """Sets smaller than k: everything is exact."""
    a = spark.range(0, 30).select(F.col("id").cast("string").alias("k"))
    b = spark.range(20, 50).select(F.col("id").cast("string").alias("k"))
    r = sk.kmv_set_overlap(a, "k", b, "k", k=256).collect()[0]
    assert r["d_union"] == 50.0
    assert r["n_shared"] == 10 and r["n_x"] == 50
    assert r["d_inter"] == 10.0


def test_kmv_sketch_mergeable(spark):
    a = spark.range(0, 400).select(F.col("id").cast("string").alias("k"))
    b = spark.range(200, 600).select(F.col("id").cast("string").alias("k"))
    merged = (sk.kmv_sketch(a, "k", 64).unionAll(sk.kmv_sketch(b, "k", 64))
                .distinct().orderBy("h").limit(64))
    direct = sk.kmv_sketch(a.unionAll(b), "k", 64)
    assert [r["h"] for r in merged.collect()] == \
           [r["h"] for r in direct.collect()]


# --- bounded heavy-hitter candidates ----------------------------------

def test_cms_heavy_bucket_prepass_bounds_candidates(spark):
    """5000 singleton keys + one 60x key, min_count=50: only the heavy
    key's bucket clears the pre-pass, so the probed candidate set (and
    the result) stays tiny instead of shuffling the whole domain —
    while the no-false-negative guarantee holds."""
    rows = [(f"u{i}",) for i in range(5000)] + [("hot",)] * 60
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    got = {r["key"]: r["est"] for r in
           sk.cms_heavy_hitters(df, "k", 50).collect()}
    assert "hot" in got and got["hot"] >= 60
    assert len(got) <= 5, got  # bucket-mates of 'hot' at most


def test_cms_prepass_no_false_negatives_vs_full_domain(spark):
    """n_buckets=1 puts every key in one (heavy) bucket == the old
    full-domain probe; the default pre-pass must contain every key the
    full probe finds whose TRUE count >= min_count."""
    rows = [(f"k{i % 40}",) for i in range(2000)] + \
           [(f"solo{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, ["k"])
    full = {r["key"]: r["est"] for r in
            sk.cms_heavy_hitters(df, "k", 30, n_buckets=1).collect()}
    pre = {r["key"]: r["est"] for r in
           sk.cms_heavy_hitters(df, "k", 30).collect()}
    true = {r["k"]: r["c"] for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    for k, c in true.items():
        if c >= 30:
            assert k in pre and pre[k] == full[k], k
    assert set(pre) <= set(full)


def test_cms_explicit_candidates_restrict_probe(spark):
    rows = [(f"k{i % 10}",) for i in range(1000)]
    df = spark.createDataFrame(rows, ["k"])
    cand = spark.createDataFrame([("k1",), ("k2",), ("nope",)], ["key"])
    got = {r["key"] for r in
           sk.cms_heavy_hitters(df, "k", 50, candidates=cand).collect()}
    assert got == {"k1", "k2"}


def test_cms_oracle_replays_prepass(spark, tmp_path):
    """DuckDB replay of the bucket pre-pass + probe is value-exact."""
    import duckdb
    rows = [(f"v{i % 25}",) for i in range(3000)] + \
           [(f"one{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["k"])
    df.toPandas().to_parquet(tmp_path / "t.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM "
                f"read_parquet('{tmp_path}/t.parquet')")
    want = sorted(map(tuple, con.execute(
        sk.cms_oracle_sql("t", "k", 100)).fetchall()))
    got = sorted((r["key"], r["est"]) for r in
                 sk.cms_heavy_hitters(df, "k", 100).collect())
    assert got == want and len(got) > 0


def test_kll_tree_merge_exact_regime_many_partitions(spark):
    """k >= n is exact under ANY merge tree: 64 input partitions force
    the intermediate sqrt(P) merge level and the result must still be
    the exact order statistics."""
    import math as _m
    vals = [float((i * 37) % 5000) for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"]) \
              .repartition(64)
    got = {r["q"]: r["value"] for r in
           sk.kll_quantiles(df, "x", (0.1, 0.5, 0.99), k=10_000).collect()}
    s = sorted(vals)
    for q, v in got.items():
        assert v == s[max(1, _m.ceil(q * len(s))) - 1], (q, v)
