"""plans.inspect_plan sanity over representative workload queries."""

from __future__ import annotations

from nowdb_spark.plans import inspect_plan
from nowdb_spark.workload import QUERIES
from tests.conftest import SF_DIR


def test_inspect_scan(spark):
    df = QUERIES["q01_scan_filter"].spark(spark, SF_DIR)
    p = inspect_plan(df)
    assert any("l_quantity" in f for f in p.pushed_filters)
    assert p.reads_column("l_extendedprice")
    assert not p.reads_column("l_shipdate")
    assert not p.python_eval_nodes


def test_inspect_join(spark):
    p = inspect_plan(QUERIES["q16_join_two_dims"].spark(spark, SF_DIR))
    assert p.has_broadcast_join


def test_inspect_topk(spark):
    p = inspect_plan(QUERIES["q11_order_topk"].spark(spark, SF_DIR))
    assert p.has_take_ordered


def test_inspect_python_nodes(spark):
    p = inspect_plan(QUERIES["mm01_extract_meta"].spark(spark, SF_DIR))
    assert "MapInPandas" in p.python_eval_nodes
