#!/usr/bin/env python
"""Round-14 g01 A/B harness (guide §1: measure first, interleaved).

Compares the current pairs_from_groups (block-pair spread, pair rows
shuffled into the final agg exchange) against a candidate that
repartitions the (a, tail-chunk) emission by `a` BEFORE exploding
pairs: hashpartitioning(a) satisfies the groupBy(a, b) distribution
(partitioning expressions are a subset of the grouping keys), so the
final aggregate needs NO exchange and the quadratic pair volume never
crosses the wire as rows — it crosses once, as packed tail arrays.

Checks result equality, dumps both plans, then interleaves N timed
rounds of the bench action (.count()) and reports medians + shuffle
write bytes per query (UI REST).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from nowdb_spark.session import get_spark  # noqa: E402
from nowdb_spark.operators import graph as G  # noqa: E402
from nowdb_spark.workload import table  # noqa: E402


def pairs_new(df, key, member, chunk=4096):
    per = (df.groupBy(key)
           .agg(F.sort_array(F.collect_set(member)).alias("ms"))
           .filter(F.size("ms") >= 2))
    # (a, tail-chunk) rows: member at sorted position i pairs with
    # every later member (a<b by the sort); tails are cut into
    # `chunk`-sized slices so no row carries a hot key's whole
    # quadratic emission through the exchange
    n_chunks_last = F.floor(
        (F.size("ms") - F.col("i") - 2) / F.lit(chunk)).cast("int")
    rows = (per.select(key, "ms", F.posexplode("ms").alias("i", "a"))
            .where(F.col("i") + 1 < F.size("ms"))
            .select(key, "a", F.explode(F.transform(
                F.sequence(F.lit(0), n_chunks_last),
                lambda c: F.slice(
                    "ms", F.col("i") + 2 + c * chunk, chunk)))
                .alias("tail")))
    return (rows.repartition(F.col("a"))
            .select(key, "a", F.explode("tail").alias("b")))


def g01_new(spark, sf):
    sp = table(spark, sf, "lineitem").select("l_suppkey", "l_partkey")
    pairs = pairs_new(sp, "l_partkey", "l_suppkey")
    return (pairs
            .select(F.col("a").alias("supp_a"), F.col("b").alias("supp_b"))
            .groupBy("supp_a", "supp_b")
            .agg(F.count(F.lit(1)).alias("shared_parts")))


def g01_old(spark, sf):
    sp = table(spark, sf, "lineitem").select("l_suppkey", "l_partkey")
    pairs = G.pairs_from_groups(sp, "l_partkey", "l_suppkey")
    return (pairs
            .select(F.col("a").alias("supp_a"), F.col("b").alias("supp_b"))
            .groupBy("supp_a", "supp_b")
            .agg(F.count(F.lit(1)).alias("shared_parts")))


def shuffle_bytes(app_port=4040):
    url = f"http://localhost:{app_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(url))
    app_id = apps[0]["id"]
    st = json.load(urllib.request.urlopen(
        f"{url}/{app_id}/stages?status=complete"))
    return st


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    total_bytes = sum(
        p.stat().st_size for p in Path(sf_dir).glob("*.parquet"))
    mpb = min(max(total_bytes // (4 * cores), 1 << 20), 128 << 20)
    spark = get_spark("ab_g01", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(mpb),
        "spark.sql.files.openCostInBytes": str(1 << 20),
        "spark.ui.enabled": "true",
        "spark.ui.showConsoleProgress": "false",
    })
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # 1. result equality (exact multiset)
    a = g01_old(spark, sf_dir)
    b = g01_new(spark, sf_dir)
    ca, cb = a.count(), b.count()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"rows old={ca} new={cb} symdiff={diff}", flush=True)
    assert ca == cb and diff == 0, "RESULTS DIFFER"

    # 2. plans
    import io
    from contextlib import redirect_stdout
    for tag, fn in (("old", g01_old), ("new", g01_new)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        Path(f"/tmp/ab_g01_{tag}.txt").write_text(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        print(f"{tag}: {n_ex} Exchange nodes", flush=True)

    # 3. interleaved timing
    n_rounds = int(os.environ.get("AB_ROUNDS", "9"))
    times = {"old": [], "new": []}
    sc = spark.sparkContext
    for r in range(n_rounds):
        for tag, fn in (("old", g01_old), ("new", g01_new)):
            sc.setJobGroup(f"{tag}_{r}", f"g01 {tag} round {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times[tag].append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
    for tag, ts in times.items():
        s = sorted(ts)
        print(f"{tag}: med={s[len(s)//2]:.3f} min={s[0]:.3f} "
              f"max={s[-1]:.3f} all={[round(x,3) for x in ts]}",
              flush=True)

    # 4. shuffle bytes of the LAST run of each variant (job-group match)
    try:
        stages = shuffle_bytes()
        tot = {}
        for st in stages:
            grp = (st.get("jobGroup") or "")
            for tag in ("old", "new"):
                if grp.startswith(f"{tag}_{n_rounds-1}"):
                    tot.setdefault(tag, [0, 0])
                    tot[tag][0] += st.get("shuffleWriteBytes", 0)
                    tot[tag][1] += st.get("shuffleReadBytes", 0)
        print("shuffle bytes (write, read) per variant:", tot, flush=True)
    except Exception as e:  # noqa: BLE001
        print("REST probe failed:", e, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
