"""Streaming layer tests: the streaming result must equal the batch
computation of the same windows (differential style), driven through
the parquet file source + memory sink."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nowdb_spark.catalog import Prop, TypeDef
from nowdb_spark.streaming import ingest as S

EVENTS_TDEF = TypeDef("events", "vertex", [
    Prop("event_id", "int"),
    Prop("ts", "time", stamp=True),
    Prop("user_id", "int"),
    Prop("event_type", "text"),
    Prop("value", "float"),
    Prop("props", "text"),
])


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-materialize sf0.001 events as a plain parquet dir with the
    engine's ns-Long stamp (streaming source needs a static schema)."""
    from tests.conftest import SF_DIR
    out = tmp_path_factory.mktemp("stream_src") / "events"
    from nowdb_spark.timeutil import normalize_stamps
    df = normalize_stamps(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    df.write.mode("overwrite").parquet(str(out))
    return str(out)


def _agg_spec():
    return [F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total")]


def test_windowed_agg_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    want = {tuple(r) for r in S.windowed_agg(
        batch, "ts", ["event_type"], _agg_spec(),
        window="6 hours").collect()}

    sdf = S.stream_from_context(spark, events_dir, EVENTS_TDEF)
    agg = S.windowed_agg(sdf, "ts", ["event_type"], _agg_spec(),
                         window="6 hours", watermark="1 hour")
    q = S.run_stream_to_memory(agg, "win_out", "complete")
    try:
        got = {tuple(r) for r in spark.sql("select * from win_out").collect()}
    finally:
        q.stop()
    assert got == want
    assert len(got) > 10


def test_sliding_window(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    out = S.windowed_agg(batch, "ts", [], _agg_spec(),
                         window="12 hours", slide="6 hours")
    rows = out.collect()
    # every event lands in exactly 2 sliding windows
    assert sum(r["n"] for r in rows) == 2 * batch.count()


def test_session_window(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    out = S.session_window_agg(batch, "ts", ["user_id"], _agg_spec(),
                               gap="30 minutes")
    rows = out.collect()
    assert rows
    # sessions per user must match the lag-based count of q22
    from nowdb_spark.workload import QUERIES
    from tests.conftest import SF_DIR
    q22 = {(r["user_id"], r["n_sessions"]) for r in
           QUERIES["q22_sessionize"].spark(spark, SF_DIR).collect()}
    per_user = {}
    for r in rows:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert set(per_user.items()) == q22


def test_stream_into_context_roundtrip(spark, events_dir, tmp_path):
    sdf = S.stream_from_context(spark, events_dir, EVENTS_TDEF)
    dst = tmp_path / "ctx"
    q = S.stream_into_context(sdf, str(dst), str(tmp_path / "ckpt"),
                              stamp_col="ts")
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(str(dst))
    src = spark.read.parquet(events_dir)
    assert back.count() == src.count()
    assert "__tb" in back.columns  # day-bucket partitioned
    # partition pruning: a bucket filter must become a PartitionFilter
    # in the scan (not a post-scan data filter)
    one_day = back.filter(F.col("__tb") == 19723)
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__tb" in plan.split(
        "PartitionFilters")[1][:120], plan[:1500]
    assert one_day.count() > 0


def test_late_data_dropped_in_append_mode(spark, tmp_path):
    """Watermark semantics: rows arriving after the watermark passed
    their window are dropped in append mode (the late-data policy the
    reference never specified — SURVEY §2.6 — defined here)."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    ckpt_name = "late_out"
    base_ns = 1_700_000_000 * 1_000_000_000

    def write_batch(fname, rows):
        pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
        sdf_w = spark.createDataFrame(pdf, "k long, ts long, v double")
        sdf_w.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / fname))
        import shutil, glob
        part = glob.glob(str(tmp_path / "stage" / fname / "*.parquet"))[0]
        shutil.copy(part, src / f"{fname}.parquet")

    # batch 1: on-time rows in windows [0h,1h) and [2h,3h)
    write_batch("b1", [(1, base_ns + 600 * 10**9, 1.0),
                       (1, base_ns + 2 * 3600 * 10**9, 1.0)])

    from nowdb_spark.catalog import Prop, TypeDef
    tdef = TypeDef("late", "vertex", [
        Prop("k", "int"), Prop("ts", "time", stamp=True),
        Prop("v", "float")])
    sdf = S.stream_from_context(spark, str(src), tdef)
    agg = S.windowed_agg(sdf, "ts", ["k"],
                         [F.count(F.lit(1)).alias("n")],
                         window="1 hour", watermark="1 minute")
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName(ckpt_name).start())
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the already-closed [0h,1h) window
        write_batch("b2", [(1, base_ns + 1200 * 10**9, 99.0)])
        q.processAllAvailable()
        # batch 3: advance watermark far so open windows close
        write_batch("b3", [(1, base_ns + 10 * 3600 * 10**9, 1.0)])
        q.processAllAvailable()
        rows = {(r["window_start_ns"] - base_ns, r["n"])
                for r in spark.sql(f"select * from {ckpt_name}").collect()}
    finally:
        q.stop()
    # windows align to epoch hours: base_ns is 800s past the hour, so
    # the first window starts at base-800s. It must emit with n=1 —
    # the late row (base+1200s, inside that window) did NOT reappear.
    first_win = -800 * 10**9
    assert (first_win, 1) in rows
    assert (first_win, 2) not in rows


def test_stateful_running_totals(spark, events_dir):
    sdf = S.stream_from_context(spark, events_dir, EVENTS_TDEF)
    out = S.stateful_running_totals(sdf, "user_id", "value", "ts")
    q = S.run_stream_to_memory(out, "state_out", "update")
    try:
        got = spark.sql(
            "select user_id, max_by(n, n) as n, max_by(total, n) as total "
            "from state_out group by user_id").collect()
    finally:
        q.stop()
    batch = spark.read.parquet(events_dir)
    want = {(r["user_id"], r["n"], round(r["total"], 4)) for r in
            batch.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("total")).collect()}
    got_set = {(r["user_id"], r["n"], round(r["total"], 4)) for r in got}
    assert got_set == want


def _doc_batch_writer(spark, tmp_path):
    import glob
    import shutil

    import pandas as pd

    src = tmp_path / "docsrc"
    src.mkdir()

    def write_batch(fname, rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
        sdf_w = spark.createDataFrame(pdf, "doc_id long, ts long, text string")
        sdf_w.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / fname))
        part = glob.glob(str(tmp_path / "stage" / fname / "*.parquet"))[0]
        shutil.copy(part, src / f"{fname}.parquet")

    return src, write_batch


DOCS_TDEF_COLS = [
    ("doc_id", "int"), ("ts", "time"), ("text", "text")]


def test_stream_exact_dedup(spark, tmp_path):
    """A repeat of the same content inside the watermark horizon is
    dropped — across micro-batches, with bounded state."""
    from nowdb_spark.catalog import Prop, TypeDef
    from nowdb_spark.streaming import dedup as SD

    src, write_batch = _doc_batch_writer(spark, tmp_path)
    base = 1_700_000_000 * 10**9
    write_batch("b1", [(1, base, "the quick brown fox"),
                       (2, base + 10**9, "another document entirely")])
    tdef = TypeDef("docs", "vertex", [
        Prop("doc_id", "int"), Prop("ts", "time", stamp=True),
        Prop("text", "text")])
    sdf = S.stream_from_context(spark, str(src), tdef)
    out = SD.stream_exact_dedup(sdf, "text", "doc_id", "ts",
                                watermark="1 hour")
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("sdedup").start())
    try:
        q.processAllAvailable()
        # batch 2: doc 3 repeats doc 1's content (within watermark),
        # doc 4 is new
        write_batch("b2", [(3, base + 2 * 10**9, "the quick brown fox"),
                           (4, base + 3 * 10**9, "fresh content here")])
        q.processAllAvailable()
        got = {r["doc_id"]
               for r in spark.sql("select * from sdedup").collect()}
    finally:
        q.stop()
    assert got == {1, 2, 4}, got


def test_stream_lsh_candidates_match_batch_estimator(spark, tmp_path):
    """Streaming band-bucket matching finds the injected near-dup with
    the same Jaccard estimate as the batch operator, across
    micro-batches (doc arrives after its near-original)."""
    from nowdb_spark.catalog import Prop, TypeDef
    from nowdb_spark.operators import dedup as D
    from nowdb_spark.streaming import dedup as SD

    base_text = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lambda mu nu xi omicron pi rho sigma tau")
    near = base_text + " upsilon"          # near-dup of base_text
    other = "completely different words in this unrelated document"

    src, write_batch = _doc_batch_writer(spark, tmp_path)
    base = 1_700_000_000 * 10**9
    write_batch("b1", [(1, base, base_text), (2, base + 10**9, other)])
    tdef = TypeDef("docs", "vertex", [
        Prop("doc_id", "int"), Prop("ts", "time", stamp=True),
        Prop("text", "text")])
    sdf = S.stream_from_context(spark, str(src), tdef)
    out = SD.stream_lsh_candidates(sdf, "text", "doc_id", "ts",
                                   k=8, bands=4, threshold=0.5)
    q = (out.writeStream.outputMode("update")
         .format("memory").queryName("slsh").start())
    try:
        q.processAllAvailable()
        write_batch("b2", [(3, base + 2 * 10**9, near)])
        q.processAllAvailable()
        events = [(r["doc_id"], r["dup_of"], r["est"])
                  for r in spark.sql("select * from slsh").collect()]
    finally:
        q.stop()
    assert events, "no candidate events emitted"
    assert all(d == 3 and o == 1 for d, o, _ in events), events
    # same estimator as the batch operator on the same documents
    batch = spark.createDataFrame(
        [(1, base_text), (3, near)], "doc_id long, text string")
    bpairs = D.minhash_lsh_pairs(batch, "text", "doc_id",
                                 k=8, bands=4, threshold=0.5).collect()
    assert bpairs, "batch operator disagrees: no pair"
    best = {e for _, _, e in events}
    assert {round(r["est_jaccard"], 6) for r in bpairs} == \
        {round(e, 6) for e in best}


def test_stream_ewma_matches_batch(spark, events_dir):
    from nowdb_spark.operators import timeseries as TS

    sdf = S.stream_from_context(spark, events_dir, EVENTS_TDEF)
    out = S.stream_ewma(sdf, "user_id", "value", "ts", alpha=0.3)
    q = S.run_stream_to_memory(out, "sewma", "append")
    try:
        got = {(r["user_id"], r["ts"]): r["ewma"]
               for r in spark.sql("select * from sewma").collect()}
    finally:
        q.stop()
    batch = spark.read.parquet(events_dir)
    want = {(r["user_id"], r["ts"]): r["ewma"]
            for r in TS.ewma(batch, "ts", "user_id", "value",
                             alpha=0.3).collect()}
    # single ingest pass == batch recurrence, bit-for-bit
    assert got == want and len(got) > 0


def test_stream_interval_join_matches_batch(spark, events_dir):
    NS_6H = 6 * 3_600_000_000_000
    batch = spark.read.parquet(events_dir)
    kinds = [r[0] for r in batch.select("event_type").distinct().collect()]
    t_left, t_right = sorted(kinds)[:2]

    sdf = S.stream_from_context(spark, events_dir, EVENTS_TDEF)
    out = S.stream_interval_join(
        sdf.filter(F.col("event_type") == t_left),
        sdf.filter(F.col("event_type") == t_right),
        "user_id", "ts", lookback="6 hours")
    q = S.run_stream_to_memory(out, "sij", "append")
    try:
        got = {(r["event_id"], r["event_id_r"])
               for r in spark.sql("select * from sij").collect()}
    finally:
        q.stop()

    # independent batch recomputation with exact ns arithmetic
    li = batch.filter(F.col("event_type") == t_left)
    ri = batch.filter(F.col("event_type") == t_right).select(
        *[F.col(c).alias(f"{c}_r") for c in batch.columns])
    want = {(r["event_id"], r["event_id_r"]) for r in li.join(
        ri, (li["user_id"] == ri["user_id_r"])
        & (ri["ts_r"] >= li["ts"] - F.lit(NS_6H))
        & (ri["ts_r"] <= li["ts"])).collect()}
    assert got == want and len(got) > 0


def test_stream_quality_and_tokens_match_batch(spark, tmp_path):
    """The new map-only scorers (quality_score, perplexity,
    bpe_segment) are stateless Column/Arrow transforms, so they
    compose with readStream unchanged — stream output must equal the
    batch run on the same files."""
    from nowdb_spark.catalog import Prop, TypeDef
    from nowdb_spark.operators import quality as Q
    from nowdb_spark.operators import tokenize as TK

    src, write_batch = _doc_batch_writer(spark, tmp_path)
    base = 1_700_000_000 * 10**9
    rows = [(1, base, "alpha beta gamma"),
            (2, base + 10**9, "beta gamma delta"),
            (3, base + 2 * 10**9, "zeta eta")]
    write_batch("b1", rows[:2])
    write_batch("b2", rows[2:])

    batch = spark.createDataFrame(
        [(i, t) for i, _, t in rows], "doc_id long, text string")
    w, b = Q.train_quality_classifier(
        batch, F.col("doc_id") < 3, buckets=32, iters=2)
    uni, bi = Q.train_bigram_lm(batch, buckets=64)
    merges = TK.bpe_train(batch, n_merges=4)

    tdef = TypeDef("docs", "vertex", [
        Prop("doc_id", "int"), Prop("ts", "time", stamp=True),
        Prop("text", "text")])
    sdf = S.stream_from_context(spark, str(src), tdef)
    scored = Q.quality_score(sdf, w, b)
    sdf2 = S.stream_from_context(spark, str(src), tdef)
    ppl = Q.perplexity(sdf2, uni, bi)
    sdf3 = S.stream_from_context(spark, str(src), tdef)
    toks = TK.bpe_segment(sdf3, merges)

    def run(df, name):
        q = (df.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
            return spark.sql(f"select * from {name}").collect()
        finally:
            q.stop()

    got_q = {r["doc_id"]: (r["score"], r["keep"])
             for r in run(scored, "squal")}
    want_q = {r["doc_id"]: (r["score"], r["keep"])
              for r in Q.quality_score(batch, w, b).collect()}
    assert got_q == want_q

    got_p = {r["doc_id"]: r["ppl"] for r in run(ppl, "sppl")}
    want_p = {r["doc_id"]: r["ppl"]
              for r in Q.perplexity(batch, uni, bi).collect()}
    assert got_p == want_p

    got_t = {r["doc_id"]: r["tokens"] for r in run(toks, "stoks")}
    want_t = {r["doc_id"]: r["tokens"]
              for r in TK.bpe_segment(batch, merges).collect()}
    assert got_t == want_t


def test_streaming_index_maintenance_matches_batch(spark, tmp_path):
    """Round-6 composition: a stream keeps the persisted LSH band
    index + exact-hash twin current (foreachBatch over the batch
    incremental operators). Contract: after the stream drains,
    - read(index_dir)  == lsh_index(corpus ∪ stream) row-for-row,
    - read(exact_dir)  == first-occurrence canonical per content hash
                          over corpus ∪ stream,
    - ∪ read(pairs_dir) == minhash_lsh_pairs(corpus ∪ stream)
                          restricted to pairs touching a stream doc —
    i.e. streaming ingest and a batch rebuild agree on state. Two
    staged files + maxFilesPerTrigger=1 force MULTIPLE micro-batches,
    so cross-batch pairs (stream doc vs earlier stream doc) go
    through the index, not same-batch shortcuts."""
    import glob
    import shutil

    from nowdb_spark.operators import dedup as D
    from nowdb_spark.streaming import dedup as SD
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    cut = 300
    corpus = docs.filter(F.col("doc_id") < cut)
    s1 = docs.filter((F.col("doc_id") >= cut) & (F.col("doc_id") < 400))
    s2 = docs.filter(F.col("doc_id") >= 400)

    index_dir = str(tmp_path / "lshidx")
    exact_dir = str(tmp_path / "exidx")
    pairs_dir = str(tmp_path / "pairs")

    # seed from the corpus (the batch-built starting state)
    D.lsh_index(corpus).write.parquet(f"{index_dir}/batch=seed")
    (D.exact_dedup(corpus).groupBy("content_hash")
     .agg(F.min("canonical_id").alias("canonical_id"))
     .write.parquet(f"{exact_dir}/batch=seed"))

    # stage the stream as two files -> two micro-batches
    src = tmp_path / "docsrc"
    src.mkdir()
    for name, part in (("f1", s1), ("f2", s2)):
        part.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name))
        f = glob.glob(str(tmp_path / "stage" / name / "*.parquet"))[0]
        shutil.copy(f, src / f"{name}.parquet")

    sdf = (spark.readStream.schema(docs.schema)
           .option("maxFilesPerTrigger", 1).parquet(str(src)))
    writer = SD.stream_index_maintenance(
        sdf, index_dir, str(tmp_path / "ckpt"),
        exact_dir=exact_dir, pairs_dir=pairs_dir)
    q = writer.start()
    q.awaitTermination(timeout=120)

    def idx_key(df):
        return {(r["doc_id"], r["band_id"], r["band_key"],
                 tuple(r["sig"])) for r in df.collect()}

    got_idx = idx_key(spark.read.option("basePath", index_dir)
                      .parquet(index_dir))
    want_idx = idx_key(D.lsh_index(docs))
    assert got_idx == want_idx and len(got_idx) > 0

    got_exact = {r["content_hash"]: r["canonical_id"]
                 for r in spark.read.option("basePath", exact_dir)
                 .parquet(exact_dir).collect()}
    want_exact = {r["content_hash"]: r["canonical_id"]
                  for r in D.exact_dedup(docs).groupBy("content_hash")
                  .agg(F.min("canonical_id").alias("canonical_id"))
                  .collect()}
    assert got_exact == want_exact

    got_pairs = {(r["doc_a"], r["doc_b"], r["est_jaccard"])
                 for r in spark.read.option("basePath", pairs_dir)
                 .parquet(pairs_dir).collect()}
    full = {(r["doc_a"], r["doc_b"], r["est_jaccard"])
            for r in D.minhash_lsh_pairs(docs).collect()}
    want_pairs = {p for p in full if p[0] >= cut or p[1] >= cut}
    assert got_pairs == want_pairs


def test_index_maintenance_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (failure before the checkpoint commit)
    must leave the SAME state as running it once: every read inside
    maintain_index_batch excludes the batch's own partition, so the
    replay cannot anti-join against its first attempt's write — the
    bug that silently emptied exact_dir/batch=N on replay."""
    from nowdb_spark.operators import dedup as D
    from nowdb_spark.streaming.dedup import maintain_index_batch
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    batch = docs.filter((F.col("doc_id") >= 300)
                        & (F.col("doc_id") < 360))

    index_dir = str(tmp_path / "lshidx")
    exact_dir = str(tmp_path / "exidx")
    pairs_dir = str(tmp_path / "pairs")
    D.lsh_index(corpus).write.parquet(f"{index_dir}/batch=seed")
    (D.exact_dedup(corpus).groupBy("content_hash")
     .agg(F.min("canonical_id").alias("canonical_id"))
     .write.parquet(f"{exact_dir}/batch=seed"))

    def state():
        ex = {(r["content_hash"], r["canonical_id"])
              for r in spark.read.option("basePath", exact_dir)
              .parquet(exact_dir)
              .select("content_hash", "canonical_id").collect()}
        ix = spark.read.option("basePath", index_dir) \
            .parquet(index_dir).count()
        pr = {(r["doc_a"], r["doc_b"])
              for r in spark.read.option("basePath", pairs_dir)
              .parquet(pairs_dir).select("doc_a", "doc_b").collect()}
        return ex, ix, pr

    maintain_index_batch(batch, 0, index_dir,
                         exact_dir=exact_dir, pairs_dir=pairs_dir)
    first = state()
    assert any(c >= 300 for _, c in first[0]), \
        "batch must contribute first-seen hashes"
    # replay the SAME batch id — state must be unchanged
    maintain_index_batch(batch, 0, index_dir,
                         exact_dir=exact_dir, pairs_dir=pairs_dir)
    assert state() == first
