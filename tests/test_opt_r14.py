"""Round-14 optimization regression locks.

Each test pins one of the r14 performance/robustness changes so a
later round cannot silently regress it:
  - workload.table()'s per-session cache lives on the session object
    (no id-reuse aliasing, no global pinning of dead sessions) and a
    second session resolves its own plans;
  - workload.spread() memoizes the identity (no-op) case with a
    sentinel instead of self-pinning the weak entry;
  - bench.py emits the headline summary JSON line immediately after
    the headline section (the r13 8-core scaling run timed out in the
    pipeline tail before the end-only line printed).
"""

from __future__ import annotations

import gc
import weakref

from nowdb_spark.workload import _SPREAD_MEMO, _SPREAD_IDENTITY, spread, table
from tests.conftest import SF_DIR


def test_table_registry_two_sessions_session_scoped(spark):
    import nowdb_spark.workload as W

    a = table(spark, SF_DIR, "orders")
    s2 = spark.newSession()
    b = table(s2, SF_DIR, "orders")
    assert b is not a, "a second session must resolve its own plan"
    assert table(s2, SF_DIR, "orders") is b, "memo must hit per session"
    assert table(spark, SF_DIR, "orders") is a
    # the cache rides the session OBJECT (no module-global registry):
    # nothing in this module can alias a reused id() to a dead
    # session's plan or pin plans beyond the session's own lifetime.
    # (pyspark itself pins session wrappers, so outliving cannot be
    # asserted via gc — the structural property is what we lock.)
    assert not hasattr(W, "_TABLES"), "global table registry is back"
    cache = getattr(s2, W._TABLE_CACHE_ATTR)
    assert cache[(SF_DIR, "orders")] is b
    assert (SF_DIR, "orders") in getattr(spark, W._TABLE_CACHE_ATTR)


def test_spread_identity_case_not_self_pinned(spark):
    t = table(spark, SF_DIR, "documents")
    s = spread(t)
    if s is t:
        # identity (no-op) case: memoized via the sentinel, so the
        # weak entry's value must not strong-ref the key
        assert _SPREAD_MEMO.get(t) is _SPREAD_IDENTITY
    else:
        assert _SPREAD_MEMO.get(t) is s
    # a transient frame passed through spread() must be collectable
    # afterwards whichever branch it takes
    tr = t.limit(10)
    spread(tr)
    ref = weakref.ref(tr)
    del tr
    gc.collect()
    assert ref() is None, "spread() memo leaked a transient frame"


def test_constant_expression_trees_hoisted(spark):
    """Constant Column trees (agg lists, folds) are built once per
    process and reused across plan builds — the r14 fresh-plan-latency
    optimization (VERDICT item 3). The logical plan is still built
    fresh per query call (same results, oracle-checked); only the
    unresolved expression templates are shared."""
    from nowdb_spark.operators.dedup import _md5_fold_exprs
    from nowdb_spark.workload import hoist

    f1, c1 = _md5_fold_exprs("text", 3, 8)
    f2, c2 = _md5_fold_exprs("text", 3, 8)
    assert f1 is f2 and c1 is c2
    one = hoist("test_r14_hoist", lambda: object())
    assert hoist("test_r14_hoist", lambda: object()) is one
    # reusing the template across two plans yields identical results
    from nowdb_spark.operators.dedup import minhash_signature
    t = table(spark, SF_DIR, "documents")
    a = minhash_signature(t, k=4).collect()
    b = minhash_signature(t, k=4).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_ewma_arrow_kernel_bit_exact_vs_pandas(spark):
    """The r14 applyInArrow port of ewma must reproduce the pandas
    path bit-for-bit (same _ewma_banded kernel, same stable sort with
    nulls last) — the ts07 oracle replays the recurrence exactly."""
    from nowdb_spark.operators import timeseries as TS

    ev = table(spark, SF_DIR, "events")
    cols = ["user_id", "ts", "event_id"]
    a = (TS.ewma(ev, "ts", "user_id", "value", alpha=0.3,
                 tiebreak="event_id", kernel="pandas")
         .toPandas().sort_values(cols).reset_index(drop=True))
    b = (TS.ewma(ev, "ts", "user_id", "value", alpha=0.3,
                 tiebreak="event_id", kernel="arrow")
         .toPandas().sort_values(cols).reset_index(drop=True))
    assert len(a) == len(b) > 0
    assert (a["ewma"].to_numpy().view("int64")
            == b["ewma"].to_numpy().view("int64")).all()
    plan = (TS.ewma(ev, "ts", "user_id", "value", alpha=0.3,
                    tiebreak="event_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "FlatMapGroupsInArrow" in plan, "arrow kernel is the default"


def test_bench_emits_headline_summary_before_pipeline_tail():
    import ast
    from pathlib import Path
    src = (Path(__file__).resolve().parent.parent / "bench.py").read_text()
    tree = ast.parse(src)
    main_fn = next(n for n in ast.walk(tree)
                   if isinstance(n, ast.FunctionDef) and n.name == "main")
    # find the early _summary_line print and the first pipeline-section
    # marker; the print must come first so a pipeline-tail timeout can
    # no longer destroy the headline artifact (VERDICT r13 item 2)
    lines = src.splitlines()
    early = next(i for i, ln in enumerate(lines)
                 if "_summary_line(total, timings, {}" in ln)
    tail = next(i for i, ln in enumerate(lines)
                if "SPARK_GRAFT_TPUT_ROWS" in ln)
    assert main_fn.lineno < early < tail, (early, tail)
