"""Streaming deduplication — the LLM-ingest half of operators/dedup.

A training-data pipeline dedups at ingest time, not just in batch
sweeps: a crawler emits the same page twice within hours, near-dup
boilerplate arrives continuously. Two streaming operators mirror the
batch family (operators/dedup.py):

stream_exact_dedup     — content-hash dedup with state bounded by the
                         watermark horizon (dropDuplicatesWithinWatermark:
                         a hash is remembered only until the watermark
                         passes it — at 100 TB/day the state is a day's
                         hashes, not history's).
stream_lsh_candidates  — stateful MinHash-LSH: documents are banded
                         exactly like the batch minhash_lsh_pairs, and
                         an applyInPandasWithState keyed by
                         (band_id, band_key) holds each bucket's seen
                         signatures; a new arrival is compared against
                         its bucket's state and emits candidate-dup
                         events. State per bucket is capped
                         (max_bucket) — the documented policy for
                         adversarial hot buckets.

Both run on the same expressions as the batch operators, so batch
backfill and streaming ingest agree on what counts as a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nowdb_spark.operators.dedup import minhash_signature
from nowdb_spark.streaming.ingest import _with_event_time


def stream_exact_dedup(df: DataFrame, content_col: str = "text",
                       id_col: str = "doc_id", stamp_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """First occurrence of each content hash passes; repeats arriving
    within the watermark horizon are dropped.

    dropDuplicatesWithinWatermark keeps one state row per distinct
    hash seen inside the horizon and expires it afterwards — bounded
    state, unlike an unwatermarked dropDuplicates whose state grows
    forever. Batch frames fall back to plain dropDuplicates (the
    batch differential in tests).
    """
    h = df.withColumn("content_hash", F.md5(F.col(content_col)))
    et = _with_event_time(h, stamp_col)
    if et.isStreaming:
        return (et.withWatermark("__et", watermark)
                .dropDuplicatesWithinWatermark(["content_hash"])
                .drop("__et"))
    return et.dropDuplicates(["content_hash"]).drop("__et")


def stream_lsh_candidates(df: DataFrame, content_col: str = "text",
                          id_col: str = "doc_id", stamp_col: str = "ts",
                          k: int = 8, bands: int = 4,
                          threshold: float = 0.5, shingle_n: int = 3,
                          watermark: str = "1 hour",
                          max_bucket: int = 1024) -> DataFrame:
    """Streaming MinHash-LSH candidate-duplicate events.

    Output rows (doc_id, dup_of, band_id, est): `doc_id` arrived and
    its estimated Jaccard against the earlier `dup_of` is ≥ threshold
    (same estimator as the batch minhash_lsh_pairs: fraction of equal
    signature components). A pair colliding in several bands emits one
    event per band; consumers dedup on (doc_id, dup_of) — kept that
    way so each event names the bucket that produced it.

    Banding is map-side (identical expressions to the batch path);
    the only shuffle is the groupBy on (band_id, band_key). Bucket
    state holds at most `max_bucket` (id, signature) entries — a hot
    bucket (boilerplate shingle) stops absorbing new state beyond the
    cap but keeps matching against what it has, trading recall for
    bounded memory, same policy as the batch operator's hot-key note.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows = k // bands
    sig = minhash_signature(df, content_col, id_col, k, shingle_n,
                            keep=(stamp_col,))
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat(*[F.col(f"s{b * rows + r}") for r in range(rows)]))
            .alias("band_key"))
        for b in range(bands)
    ]
    sigcat = F.concat_ws(",", *[F.col(f"s{i}") for i in range(k)])
    banded = (sig
              .select(F.col(id_col), F.col(stamp_col),
                      sigcat.alias("sigcat"),
                      F.explode(F.array(*band_structs)).alias("b"))
              .select(id_col, stamp_col, "sigcat",
                      F.col("b.band_id").alias("band_id"),
                      F.col("b.band_key").alias("band_key")))

    out_schema = "doc_id long, dup_of long, band_id int, est double"
    state_schema = "ids array<long>, sigs array<string>"
    thr, cap = float(threshold), int(max_bucket)

    def fn(key, pdf_iter, state):
        ids, sigs = state.get if state.exists else ([], [])
        ids, sigs = list(ids), list(sigs)
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("doc_id")
            for did, sc in zip(pdf["doc_id"], pdf["sigcat"]):
                parts = sc.split(",")
                for oid, osc in zip(ids, sigs):
                    if oid == did:
                        continue
                    op = osc.split(",")
                    est = sum(a == b for a, b in zip(parts, op)) / len(parts)
                    if est >= thr:
                        out.append((int(did), int(oid), key[0], est))
                if len(ids) < cap:
                    ids.append(int(did))
                    sigs.append(sc)
        state.update((ids, sigs))
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "dup_of",
                                             "band_id", "est"])

    et = (_with_event_time(banded, stamp_col)
          .withWatermark("__et", watermark))
    return (et.groupBy("band_id", "band_key")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def maintain_index_batch(batch_df: DataFrame, batch_id: int,
                         index_dir: str, content_col: str = "text",
                         id_col: str = "doc_id", k: int = 8,
                         bands: int = 4, threshold: float = 0.5,
                         shingle_n: int = 3, hash_fn: str = "md5",
                         compact: bool = False,
                         exact_dir: str | None = None,
                         pairs_dir: str | None = None) -> None:
    """ONE micro-batch of index maintenance (the foreachBatch body of
    stream_index_maintenance, module-level so replay idempotency is
    directly testable): probe pairs against the index-so-far, extend
    the band index under batch=<id>, record first-seen content hashes.
    All writes overwrite the batch's own partition, and all READS
    exclude it — a replayed batch therefore sees exactly the state of
    its first attempt and rewrites identical files."""
    from nowdb_spark.operators import dedup as D

    spark = batch_df.sparkSession
    batch_df = batch_df.persist()
    try:
        try:
            # exclude this batch's OWN partition: a replayed
            # micro-batch (failure before checkpoint commit) must
            # see exactly the state its first attempt saw, or the
            # probe matches the half-written previous attempt
            # string compare: seed partitions ('batch=seed') would
            # null out under an int comparison and vanish
            idx = (spark.read.option("basePath", index_dir)
                   .parquet(index_dir)
                   .filter(F.col("batch").cast("string")
                           != str(batch_id)))
            have_idx = True
        except Exception:  # noqa: BLE001  (first batch, empty dir)
            have_idx = False
        if pairs_dir is not None:
            if have_idx:
                pairs = D.lsh_increment_pairs(
                    idx.select(id_col, "sig", "band_id", "band_key"),
                    batch_df, content_col, id_col, k, bands,
                    threshold, shingle_n, hash_fn, compact)
            else:
                pairs = D.minhash_lsh_pairs(
                    batch_df, content_col, id_col, k, bands,
                    threshold, shingle_n, hash_fn, compact)
            pairs.write.mode("overwrite").parquet(
                f"{pairs_dir}/batch={batch_id}")
        D.lsh_index(batch_df, content_col, id_col, k, bands,
                    shingle_n, hash_fn, compact) \
            .write.mode("overwrite") \
            .parquet(f"{index_dir}/batch={batch_id}")
        if exact_dir is not None:
            batch_hashed = batch_df.select(
                F.col(id_col),
                F.md5(F.col(content_col)).alias("content_hash"))
            fresh = (batch_hashed.groupBy("content_hash")
                     .agg(F.min(id_col).alias("canonical_id")))
            try:
                # same self-exclusion: replaying batch N must not
                # anti-join against batch N's own previous write,
                # which would overwrite the partition with an
                # EMPTY frame and lose its first-seen hashes
                known = (spark.read.option("basePath", exact_dir)
                         .parquet(exact_dir)
                         .filter(F.col("batch").cast("string")
                                 != str(batch_id))
                         .select("content_hash"))
                fresh = fresh.join(known, "content_hash",
                                   "left_anti")
            except Exception:  # noqa: BLE001
                pass
            fresh.write.mode("overwrite").parquet(
                f"{exact_dir}/batch={batch_id}")
    finally:
        batch_df.unpersist()


def stream_index_maintenance(stream_df: DataFrame, index_dir: str,
                             checkpoint_dir: str,
                             content_col: str = "text",
                             id_col: str = "doc_id",
                             k: int = 8, bands: int = 4,
                             threshold: float = 0.5, shingle_n: int = 3,
                             hash_fn: str = "md5", compact: bool = False,
                             exact_dir: str | None = None,
                             pairs_dir: str | None = None):
    """Keep the PERSISTED dedup indexes current from a stream — the
    composition of the batch incremental family (operators/dedup.py
    lsh_index / lsh_increment_pairs / exact_dedup_increment) with
    Structured Streaming ingest.

    Per micro-batch (foreachBatch):
      1. probe: candidate near-dup pairs between the batch and the
         index-so-far via `lsh_increment_pairs` (O(batch) hashing +
         one index join; the corpus is never re-shingled) — appended
         to `pairs_dir` when given
      2. extend the band index: `lsh_index(batch)` rows land under
         `index_dir/batch=<id>`
      3. exact-hash twin: content hashes first seen in this batch
         land under `exact_dir/batch=<id>` as
         (content_hash, canonical_id)

    Equivalence contract (locked by test_streaming_index_maintenance):
    after the stream drains, `read(index_dir)` equals
    `lsh_index(corpus ∪ stream)` row-for-row, and the exact twin maps
    every content hash to its first-occurrence canonical id — the
    stream and a batch rebuild agree on state.

    Idempotency at 100 TB: every write is an OVERWRITE of the
    micro-batch's own `batch=<id>` partition, so a replayed batch
    (failure before checkpoint commit) rewrites the same files
    instead of duplicating rows. Pair emission dedups on re-read.

    Pre-condition shared with the batch twins: ids are assigned in
    arrival order (corpus ids < batch ids), so min-id canonicals are
    stable as the stream grows.
    """
    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        maintain_index_batch(batch_df, batch_id, index_dir,
                             content_col, id_col, k, bands, threshold,
                             shingle_n, hash_fn, compact,
                             exact_dir, pairs_dir)

    return (stream_df.writeStream
            .foreachBatch(per_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .trigger(availableNow=True))
