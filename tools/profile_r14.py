#!/usr/bin/env python
"""Round-14 optimization profiler (guide §1: measure first).

For each profiled query: capture .explain("formatted") to
plans/r14/<name>_<tag>.txt, run N warm timed executions of the SAME
action bench.py uses (.count()), and record median seconds plus the
number of Spark jobs/stages/tasks the warm run launches (AQE stage
materializations, localCheckpoint jobs and Python-boundary jobs all
show up in the job count — invisible in the plan text).

Usage: python tools/profile_r14.py [tag] [query ...]
  tag defaults to "before"; with no query args, profiles the bench
  HEADLINE set. SPARK_GRAFT_PROFILE_RUNS (default 5) warm runs.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nowdb_spark.session import get_spark  # noqa: E402
from nowdb_spark.workload import QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "5"))
    total_bytes = sum(
        p.stat().st_size for p in Path(sf_dir).glob("*.parquet"))
    mpb = min(max(total_bytes // (4 * cores), 1 << 20), 128 << 20)
    spark = get_spark("nowdb_spark_profile", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(mpb),
        "spark.sql.files.openCostInBytes": str(1 << 20),
    })
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench
        names = list(bench.HEADLINE)

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    plans_dir.mkdir(parents=True, exist_ok=True)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    results = {}
    for name in names:
        spec = QUERIES[name]
        # plan capture (fresh plan, like every bench run)
        buf = io.StringIO()
        with redirect_stdout(buf):
            spec.spark(spark, sf_dir).explain("formatted")
        (plans_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        # one cold-ish run to absorb codegen for this plan shape
        spec.spark(spark, sf_dir).count()
        # job/stage count of ONE warm run
        sc.setJobGroup(f"prof_{name}", name)
        spec.spark(spark, sf_dir).count()
        jobs = set(tracker.getJobIdsForGroup(f"prof_{name}") or [])
        sc.setJobGroup(None, None)
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for st in ji.stageIds:
                si = tracker.getStageInfo(st)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        # timed warm runs (bench methodology: fresh plan + .count())
        ts = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        results[name] = {
            "median": round(ts[len(ts) // 2], 4),
            "min": round(ts[0], 4),
            "max": round(ts[-1], 4),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        print(f"{name:35s} med={ts[len(ts)//2]:7.3f} min={ts[0]:7.3f} "
              f"jobs={len(jobs):2d} stages={n_stages:2d} tasks={n_tasks}",
              flush=True)
    out = Path(__file__).resolve().parent.parent / f"PROFILE_r14_{tag}.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps({"tag": tag, "total_median": round(
        sum(r["median"] for r in results.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
