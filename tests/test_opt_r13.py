"""Round-13 optimization regression locks.

Each test pins one of the r13 performance changes so a later round
cannot silently regress it:
  - the MinHash fold stays SINGLE in the plan without the old RDD
    barrier (CollapseProject's non-cheap-producer guard is what makes
    the barrier removable — if an upgrade ever re-inlines the fold 8x,
    the md5-count assertion here fails before any bench does);
  - workload.table() resolves each (session, sf_dir, name) once;
  - workload.spread() memoizes its partition probe per input frame;
  - brute_force_topk evaluates the query self-norm on the broadcast
    side, not once per corpus row.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from nowdb_spark.workload import table, spread
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_minhash_md5_fold_single_no_rdd_barrier(spark):
    from nowdb_spark.operators.dedup import minhash_signature
    df = minhash_signature(spread(table(spark, SF_DIR, "documents")), k=8)
    plan = _plan(df)
    assert "ExistingRDD" not in plan, "RDD barrier back in the plan"
    # exactly one md5 evaluation for all 8 components
    assert len(re.findall(r"md5\(", plan)) == 1, plan[:2000]


def test_minhash_xx_fold_single_no_rdd_barrier(spark):
    from nowdb_spark.operators.dedup import minhash_signature
    df = minhash_signature(spread(table(spark, SF_DIR, "documents")),
                           k=8, hash_fn="xxhash64")
    plan = _plan(df)
    assert "ExistingRDD" not in plan
    # one aggregate fold; the k per-component xxhash64(h, i) mixes live
    # INSIDE it (plus the one xxhash64(shingle) pre-hash)
    assert len(re.findall(r"aggregate\(", plan)) == 1, plan[:2000]


def test_table_registry_memoizes_per_session(spark):
    a = table(spark, SF_DIR, "orders")
    b = table(spark, SF_DIR, "orders")
    assert a is b, "table() must resolve once per (session, dir, name)"
    c = table(spark, SF_DIR, "customer")
    assert c is not a
    # registry is metadata-only: repeated actions still hit the files
    assert a.count() == b.count() > 0


def test_spread_memoizes_per_frame(spark):
    t = table(spark, SF_DIR, "documents")
    s1 = spread(t)
    s2 = spread(t)
    assert s1 is s2, "spread() must not re-probe a memoized frame"
    assert s1.count() == t.count()


def test_brute_force_topk_hoists_query_norm(spark):
    from nowdb_spark.operators.similarity import brute_force_topk
    df = brute_force_topk(table(spark, SF_DIR, "embeddings"),
                          query_vec_id=0, k=5)
    plan = _plan(df)
    # probe side evaluates exactly two folds per row (q·v and v·v);
    # the query self-norm rides the broadcast build side
    probe = plan.split("BroadcastExchange")[0]
    assert len(re.findall(r"zip_with\(", probe)) == 2, probe[:2000]
