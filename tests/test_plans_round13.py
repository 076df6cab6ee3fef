"""Round-13 physical-plan gates for the rows newly rotated into the
driver window (sketches, dialect, mm38) — same 100 TB stance as
test_plans.py: broadcasts where a side is bounded, no shuffle where
the operator is map-only, semi joins for existence, single key
shuffle for windowed analytics."""
from __future__ import annotations

from nowdb_spark.workload import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = QUERIES[name].spark(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_sk04_bloom_probe_broadcasts_and_semi_joins(spark):
    """The bloom bit table (<= m distinct positions) must broadcast
    to the probe, and the verdict must rejoin the big side as a semi
    join — never a shuffle of the full key set against bits."""
    plan = plan_of(spark, "sk04_bloom_membership")
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_sk05_kmv_all_joins_broadcast(spark):
    """Every KMV join operates on <= k-row sketch frames; a
    SortMergeJoin anywhere means a sketch failed to broadcast."""
    plan = plan_of(spark, "sk05_kmv_overlap")
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_sk02_cms_bounded_exchanges(spark):
    """CMS heavy hitters: build is one hash aggregate over the
    stream; the sketch itself is (depth x width) rows. No more than
    3 key shuffles end-to-end and no cartesian product."""
    plan = plan_of(spark, "sk02_cms_heavy_hitters")
    assert plan.count("Exchange hashpartitioning") <= 3, plan[:3000]
    assert "CartesianProduct" not in plan


def test_nq12_exists_becomes_semi_join(spark):
    """The dialect's EXISTS subquery must lower to a semi join (and
    NOT EXISTS to anti), not an aggregate-and-rejoin."""
    plan = plan_of(spark, "nq12_dialect_exists")
    assert "LeftSemi" in plan or "LeftAnti" in plan, plan[:2000]


def test_nq09_window_frames_single_shuffle(spark):
    """All frame variants share one PARTITION BY key: exactly one
    hash exchange feeds every Window node."""
    plan = plan_of(spark, "nq09_dialect_window_frames")
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_nq11_setops_no_cartesian(spark):
    plan = plan_of(spark, "nq11_dialect_setops")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mm38_narrow_no_key_shuffle(spark):
    """mm38 is a file-parallel decode chain: the only exchange is
    the deliberate gate-scale round-robin spread; no key shuffle, no
    join, no row-at-a-time Python (Arrow kernels only)."""
    plan = plan_of(spark, "mm38_mp3_reservoir")
    assert "hashpartitioning" not in plan, plan[:3000]
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan    # row-Python never
