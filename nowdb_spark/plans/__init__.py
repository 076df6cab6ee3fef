"""Plan layer: the nowdb statement planner and physical-plan
introspection.

Planning itself is deliberately thin (SURVEY §3.4): the dialect
binder (`sql/binder.SelectBinder`) lowers the reference's linear plan
[READER, FILTER, GROUPING, ORDERING, PROJECTION] to one DataFrame
chain and Catalyst owns optimization — index selection, text-key
rewrites, and count(*) fast paths from qplan/plan.c are all subsumed
by predicate pushdown, parquet dictionaries, and footer counts
(SURVEY §4 table).

What remains engine-specific lives here: inspection utilities that
read the *executed* physical plan to verify scale properties —
pushdown reached the scan, partitions were pruned, a join broadcast.
Used by tests/test_plans.py and handy at a REPL:

    from nowdb_spark.plans import inspect_plan
    p = inspect_plan(df)
    p.pushed_filters, p.read_schema, p.has_broadcast_join
"""

from nowdb_spark.plans.inspect import PlanInfo, inspect_plan  # noqa: F401
