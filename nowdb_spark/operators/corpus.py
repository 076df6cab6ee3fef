"""Corpus-curation operators for training-data pipelines.

Repetition/quality filters (in the spirit of the published Gopher/C4
rules), PII scanning and masking, deterministic train/valid/test
splits, stratified sampling, and eval-set contamination checks.

The reference engine has no corpus operators — this module is part of
the LLM-pipeline extension the brief mandates on top of nowdb's query
surface. Scale notes per function; the common theme: everything per-row
is a pure Column expression (whole-stage codegen, zero shuffle), the
only wide operations are an aggregation keyed by document and one
broadcast join against the (small) eval set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nowdb_spark.operators import textops as T

# PII patterns: kept RE2-compatible (no backrefs/lookaround) so the
# DuckDB oracle can run the identical strings.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "id_number": r"[0-9]{6,}",
}
PII_MASK = "<PII>"


def word_ngrams(ws: Column, n: int) -> Column:
    """Word n-grams (space-joined) from a word array; empty array when
    the document is shorter than n words (Spark's sequence(1, 0) counts
    DOWN, so the guard is load-bearing)."""
    if n == 1:
        return ws
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
            # slice+array_join: ~3× cheaper than n element_at lookups
            # + concat_ws per n-gram (identical output)
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction, duplicate-bigram fraction, and the fraction of bigram
    mass taken by the single most frequent bigram.

    All array expressions over one row — per-row map, no shuffle, so it
    streams through a 100 TB corpus at scan speed. The top-bigram count
    is a sort + longest-equal-run fold, O(n log n) per doc (the naive
    distinct×total scan is quadratic and 10× slower on 1k-word docs).
    """
    ws = T.words(F.col(text_col))
    bg = word_ngrams(ws, 2)
    n_w = F.size(ws).cast("long")
    n_b = F.size(bg).cast("long")
    # max occurrence count of any bigram = longest run in sorted order
    run0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    top = F.when(n_b > 0, F.aggregate(
        F.sort_array(bg), run0, _step, lambda acc: acc["best"]))
    return df.select(
        id_col,
        n_w.alias("n_words"),
        n_b.alias("n_bigrams"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(ws))
                / n_w.cast("double"), 6).alias("dup_word_frac"),
        F.round(F.lit(1.0) - F.size(F.array_distinct(bg))
                / n_b.cast("double"), 6).alias("dup_bigram_frac"),
        F.round(top.cast("double") / n_b.cast("double"), 6)
        .alias("top_bigram_frac"),
    )


def pii_scan(df: DataFrame, text_col: str, id_col: str,
             patterns: dict | None = None) -> DataFrame:
    """Count PII-pattern hits per document and emit a masked copy of
    the text (every hit replaced by <PII>). Pure regex Columns —
    per-row map, zero shuffle. At 100 TB the regex set should be
    anchored/bounded (RE2-style linear-time patterns, as here); masking
    rewrites the text column in place of a second pass.
    """
    pats = patterns or PII_PATTERNS
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), 0))
        .cast("long").alias(f"n_{name}")
        for name, p in pats.items()
    ]
    masked = F.col(text_col)
    for p in pats.values():
        masked = F.regexp_replace(masked, p, PII_MASK)
    return df.select(id_col, *counts, masked.alias("masked"))


def hash_bucket(key: Column, n: int = 100) -> Column:
    """Deterministic bucket in [0, n): integer value of the first 4 hex
    digits of md5(key) modulo n. Engine-portable (anything with md5
    reproduces it bit-exactly — the DuckDB oracle does) and stable
    across runs/cluster sizes, which is what a train/test split must
    be. Per-row map, no shuffle."""
    return (F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
            .cast("long") % n)


def with_split(df: DataFrame, id_col: str = "doc_id",
               train_pct: int = 80, valid_pct: int = 10) -> DataFrame:
    """Deterministic train/valid/test assignment by hash bucket of the
    document id. Unlike randomSplit, membership is a property of the
    row, not of the run: re-runs, resharded inputs, and incremental
    appends all land each doc in the same split."""
    b = hash_bucket(F.col(id_col))
    split = (F.when(b < train_pct, F.lit("train"))
             .when(b < train_pct + valid_pct, F.lit("valid"))
             .otherwise(F.lit("test")))
    return df.withColumn("split", split)


def stratified_sample(df: DataFrame, strata_col: str, k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic exact-k-per-stratum sample: rank rows inside each
    stratum by (md5(id), id) — a reproducible uniform order — and keep
    the first k. One shuffle on the strata key; skewed strata are
    bounded by rank truncation. At 100 TB, when exact k is not
    required, prefer hash_bucket(id) < p (Bernoulli, zero shuffle)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))


def contamination(docs: DataFrame, eval_docs: DataFrame, n: int = 5,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Eval-set contamination: for each corpus document, the number of
    its distinct word n-grams that also occur anywhere in the eval set
    (docs with zero overlap are absent — inner join).

    Shape for 100 TB: the corpus side is a map-side explode of distinct
    n-gram hashes (md5, fixed 32 bytes — the raw text never shuffles);
    the eval n-gram set is tiny relative to the corpus and is broadcast,
    so the corpus scan stays embarrassingly parallel and the only wide
    op is the final per-doc count. If the eval set outgrows a broadcast
    (~GBs of hashes), fall back to a shuffle join on the hash — still
    one shuffle of (doc_id, hash) pairs.
    """
    def grams(frame: DataFrame, keep_id: bool):
        g = word_ngrams(T.words(F.col(text_col)), n)
        cols = [id_col] if keep_id else []
        return frame.select(
            *cols, F.explode(F.array_distinct(g)).alias("gram")
        ).withColumn("gh", F.md5(F.col("gram"))).drop("gram")

    ev = grams(eval_docs, keep_id=False).distinct()
    return (grams(docs, keep_id=True)
            .join(F.broadcast(ev), "gh")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_hit_grams")))


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", lang: str = "en",
                 min_words: int = 20, max_words: int = 100000,
                 max_dup_word_frac: float = 0.75) -> DataFrame:
    """End-to-end curation filter: language gate + length gate +
    repetition gate + exact-dedup canonicalization. Returns surviving
    rows with their word counts.

    One pass of per-row Columns plus a single shuffle on the 16-byte
    content hash (the dedup window) — the classic first stage of a
    training-data pipeline. Near-dedup (MinHash-LSH, operators.dedup)
    runs downstream on the survivors.
    """
    ws = T.words(F.col(text_col))
    n_w = F.size(ws).cast("long")
    dwf = (F.lit(1.0) - F.size(F.array_distinct(ws))
           / n_w.cast("double"))
    w = Window.partitionBy(F.md5(F.col(text_col)))
    return (docs
            .withColumn("n_words", n_w)
            .withColumn("_dwf", dwf)
            .withColumn("_canon", F.min(id_col).over(w))
            .filter((F.col("lang") == lang)
                    & (F.col("n_words") >= min_words)
                    & (F.col("n_words") <= max_words)
                    & (F.col("_dwf") <= max_dup_word_frac)
                    & (F.col(id_col) == F.col("_canon")))
            .drop("_dwf", "_canon"))


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """C4-style line-level deduplication: every distinct non-blank
    line survives only at its FIRST corpus occurrence (lowest doc id,
    then lowest line position); later occurrences are removed and the
    documents re-assembled (C4 did this with three-sentence spans to
    strip boilerplate headers/footers/navigation).

    Blank/whitespace-only lines are always kept — they carry document
    structure, and as the single hottest key in any real corpus they
    must never enter the dedup shuffle (a partition-sized skew key).

    Output: (id_col, text rebuilt from the kept lines, n_lines_kept,
    n_lines_dropped). Documents are never dropped here — a doc whose
    every line was boilerplate comes back with text '' so the caller's
    length filter (clean_corpus) makes the drop decision.

    Shape for 100 TB: two shuffles — one hash shuffle of (line, doc,
    pos) for the keep-first window (the line text itself is the key;
    Spark hash-partitions it, and blank lines bypass the window
    entirely), one groupBy doc_id to re-assemble. Both are
    AQE-managed; no driver state, no collects.
    """
    # F.split takes a Java regex — quote the separator (\Q..\E, i.e.
    # Pattern.quote) so a metacharacter sep like '.' or '|' splits
    # literally and the array_join reassembly round-trips
    sep_rx = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), sep_rx)).alias("pos", "line"))
    blank = F.trim(F.col("line")) == ""
    w = Window.partitionBy("line").orderBy(F.col(id_col), F.col("pos"))
    # blanks bypass the window as a separate branch — a when() inside
    # one frame would still shuffle the hot '' key into the window
    flagged = (lines.filter(~blank)
               .withColumn("_keep", F.row_number().over(w) == 1)
               .unionByName(lines.filter(blank)
                            .withColumn("_keep", F.lit(True))))
    kept = F.when(F.col("_keep"), F.struct("pos", "line"))
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                    F.transform(F.array_sort(F.collect_list(kept)),
                                lambda s: s["line"]),
                    sep).alias(text_col),
                 F.sum(F.when(F.col("_keep"), 1).otherwise(0))
                  .cast("long").alias("n_lines_kept"),
                 F.sum(F.when(F.col("_keep"), 0).otherwise(1))
                  .cast("long").alias("n_lines_dropped")))


def perplexity_buckets(df: DataFrame, n_buckets: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       domain_col: str = "source") -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus-trained Kneser–Ney bigram LM
    ([[kneser_ney_bigram_scores]]), then split each DOMAIN into
    ``n_buckets`` fluency terciles (bucket 1 = most fluent / highest
    mean log-prob — CCNet's "head"; the tail is what its pipeline
    drops or down-samples). Emits per (domain, bucket): doc count,
    sum/min/max of the per-doc mean log-prob, and total bigrams.

    Scale shape: the only window is PARTITIONED BY DOMAIN (CCNet
    buckets per language for the same reason) — no global sort, no
    single-partition exchange; ties order by (avg_logp, doc_id) with
    avg_logp pre-rounded at 1e-6 so the ntile cut is deterministic
    across engines and partitionings."""
    scores = kneser_ney_bigram_scores(df, text_col=text_col,
                                      id_col=id_col)
    j = scores.join(df.select(id_col, domain_col), id_col)
    w = Window.partitionBy(domain_col).orderBy(
        F.desc("avg_logp"), F.col(id_col))
    return (j.withColumn("bucket",
                         F.ntile(n_buckets).over(w).cast("long"))
            .groupBy(domain_col, "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 # sum, not mean: per-doc logps are 1e-6 multiples,
                 # so the rounded sum can never sit on a rounding
                 # boundary (a mean can — and did, cross-engine)
                 F.round(F.sum("avg_logp"), 6).alias("sum_logp"),
                 F.round(F.min("avg_logp"), 6).alias("min_logp"),
                 F.round(F.max("avg_logp"), 6).alias("max_logp"),
                 F.sum("n_bigrams").alias("n_bigrams")))


def domain_mix_sample(df: DataFrame, domain_col: str = "source",
                      id_col: str = "doc_id", total: int = 200,
                      alpha: float = 0.5, seed: int = 13) -> DataFrame:
    """Temperature-scaled domain mixture sampling: draw a corpus of
    ~`total` docs whose domain proportions follow p_d ∝ count_d^alpha
    (alpha=1 keeps natural proportions, alpha=0 is uniform over
    domains, 0<alpha<1 up-weights small domains — the standard
    mixture-flattening knob in multilingual / multi-source pretraining).

    Per-domain quota = min(count_d, floor(total * p_d)) — floor on
    both sides so the oracle is rounding-mode-proof; the handful of
    remainder slots is deliberately forgone rather than re-balanced
    (largest-remainder would make the quota of one domain depend on
    every other's fractional part — fragile to verify, irrelevant at
    corpus scale). Selection inside a domain is the deterministic
    md5("seed:id") rank, so re-runs and resharded inputs pick the
    identical sample.

    Shape for 100 TB: the per-domain counts and quotas are a tiny
    aggregate (one row per domain) broadcast back; the only wide op is
    the per-domain rank window. When exact quotas aren't required at
    extreme scale, replace the rank with a hash threshold
    (md5 fraction < quota/count: zero-sort Bernoulli, same
    determinism).
    """
    counts = df.groupBy(domain_col).agg(
        F.count("*").cast("double").alias("_c"))
    z = counts.agg(F.sum(F.pow("_c", F.lit(alpha))).alias("_z"))
    # round at 1e-6 before floor: the z summation order differs
    # between engines by ~1 ulp, and floor would amplify exactly at
    # integer boundaries (same guard the other float oracles use)
    quota = (counts.crossJoin(F.broadcast(z))
             .select(domain_col,
                     F.least(
                         F.col("_c"),
                         F.floor(F.round(
                             F.lit(float(total)) * F.pow("_c", F.lit(alpha))
                             / F.col("_z"), 6)))
                     .cast("long").alias("_quota")))
    w = Window.partitionBy(domain_col).orderBy(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
        F.col(id_col))
    return (df.select(id_col, domain_col)
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .join(F.broadcast(quota), domain_col)
            .filter(F.col("rk") <= F.col("_quota"))
            .select(id_col, domain_col, "rk"))


def deterministic_shuffle(df: DataFrame, id_col: str = "doc_id",
                          seed: int = 0,
                          out_col: str = "shuffle_order",
                          hash_fn: str = "md5") -> DataFrame:
    """Seed-stable global shuffle order for training runs.

    Training pipelines need the corpus in a random-but-reproducible
    order (epoch seed → identical batches on every re-run, machine
    count notwithstanding). `orderBy(rand(seed))` is NOT reproducible
    across partition layouts; a keyed hash is: order =
    hash("seed:id"). Returns the frame with a dense 0-based
    `shuffle_order` (row_number over the hash, ties by id for hash
    collisions). ``hash_fn="md5"`` is ANSI-reproducible (the oracle
    runs the identical expression); "xxhash64" is the cheaper
    production key.

    One global sort — at 100 TB that's the range-partitioned tera-sort
    Spark already does well; for writing shards, follow with
    `repartitionByRange(n_shards, out_col)` so shard files are the
    contiguous order ranges.
    """
    sid = F.col(id_col).cast("string")
    if hash_fn == "md5":
        key = F.md5(F.concat(F.lit(f"{seed}:"), sid))
    elif hash_fn == "xxhash64":
        key = F.xxhash64(F.lit(seed), F.col(id_col))
    else:
        raise ValueError(f"deterministic_shuffle: unknown hash_fn {hash_fn!r}")
    w = Window.orderBy(key, F.col(id_col))
    return df.withColumn(out_col,
                         (F.row_number().over(w) - F.lit(1)).cast("long"))


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   len_col: str = "n_tokens", max_len: int = 2048,
                   seed: int = 0, slice_len: int = 100_000) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-capacity
    training sequences (bins of `max_len` tokens) — the standard
    fill-the-context-window step before tokenizer sharding.

    Deterministic first-fit in shuffle order: documents are laid
    head-to-tail along the deterministic_shuffle order; a doc that
    would straddle a bin boundary starts the next bin (no doc is
    split). Documents longer than max_len get a bin of their own
    (flagged `oversize` — chunk them upstream).

    The sequential scan is parallelized over fixed LOGICAL slices of
    the order (`slice = shuffle_order // slice_len`): each slice
    packs independently with a fresh bin, so bins never span slices
    and the result is a pure function of (ids, lengths, seed,
    max_len, slice_len) — identical on any cluster layout. The cost
    of the slice boundaries is at most one partially-filled bin per
    `slice_len` docs. Scale shape: the deterministic_shuffle sort,
    one applyInPandas keyed by slice (bounded state: one slice of
    (id, len) pairs), one broadcast join to globalize seq ids.

    Returns (id, n_tokens, seq_id, offset, oversize): seq_id = dense
    global sequence index, offset = token start within the sequence.
    """
    from pyspark.sql.types import (BooleanType, LongType, StructField,
                                   StructType)

    ordered = deterministic_shuffle(df.select(id_col, len_col),
                                    id_col, seed)
    sliced = ordered.withColumn(
        "__slice", F.floor(F.col("shuffle_order") / F.lit(slice_len))
        .cast("long"))

    schema = StructType([
        StructField(id_col, LongType()),
        StructField("n_tokens", LongType()),
        StructField("slice_id", LongType()),
        StructField("local_seq", LongType()),
        StructField("offset", LongType()),
        StructField("oversize", BooleanType()),
    ])

    def pack(key, pdf):
        import pandas as pd
        slice_id = int(key[0])
        pdf = pdf.sort_values("shuffle_order")
        seq, off, rows = 0, 0, []
        for did, n in zip(pdf[id_col], pdf[len_col]):
            n = int(n)
            if off > 0 and off + n > max_len:
                seq += 1
                off = 0
            rows.append((int(did), n, slice_id, seq, off, n > max_len))
            off += n
            if n > max_len:          # oversize doc: close its bin
                seq += 1
                off = 0
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    packed = sliced.groupBy("__slice").applyInPandas(pack, schema)
    # globalize seq ids: one tiny window over per-slice bin counts
    per_slice = (packed.groupBy("slice_id")
                 .agg((F.max("local_seq") + 1).alias("n_seqs")))
    w = Window.orderBy("slice_id")
    base = per_slice.withColumn(
        "seq_base",
        F.coalesce(F.sum("n_seqs").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)))
    return (packed.join(F.broadcast(base.select("slice_id", "seq_base")),
                        "slice_id")
            .select(F.col(id_col), F.col("n_tokens"),
                    (F.col("seq_base") + F.col("local_seq"))
                    .alias("seq_id"),
                    "offset", "oversize"))


def importance_weights(df: DataFrame, target: Column,
                       text_col: str = "text", id_col: str = "doc_id",
                       buckets: int = 256, alpha: float = 1.0,
                       hash_fn: str = "md5") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    log p_target(x)/p_raw(x) under bag-of-hashed-ngrams models.

    The data-selection primitive for pretraining corpora: score every
    raw document by how target-like it looks, where both distributions
    are unigram+bigram bags hashed into ``buckets`` features —
    log w(x) = Σ_f count_f(x) · (log p_tgt(f) − log p_raw(f)) with
    add-``alpha`` smoothing. ``target`` is any boolean Column naming
    the in-domain rows (the paper fits p_target on a small trusted
    corpus; here it is a predicate over the same frame, e.g.
    lang == 'en').

    Returns (id, score): natural-log importance weight, rounded to 6.

    Shape at 100 TB: ONE exploded pass builds the ≤``buckets``-row
    count table (map-side partials; the shuffle carries bucket keys
    only); the finished weight table — ``buckets`` doubles, the
    model's whole state, same driver footprint as a centroid matrix —
    is folded back into the scoring expression as an array literal,
    so scoring is a map-only pass with NO shuffle and no join: each
    doc left-to-right folds element_at(weights, bucket(feature)).
    (The first cut scored via explode + broadcast join + groupBy(doc);
    at 10M docs that re-shuffled 590M feature rows and ran 5× slower
    than the counts pass itself.) Hashing is the md5 idiom shared
    with hash_bucket (engine-portable → DuckDB-oracle-able);
    ``hash_fn="xxhash64"`` is the production variant — same topology,
    an order of magnitude cheaper per feature, not SQL-replayable.
    """
    if hash_fn not in ("md5", "xxhash64", "arrow"):
        raise ValueError(f"importance_weights: unknown hash_fn {hash_fn!r}")
    if hash_fn == "arrow":
        return _importance_weights_arrow(df, target, text_col, id_col,
                                         buckets, alpha)

    def bucket_of(c: Column) -> Column:
        if hash_fn == "xxhash64":
            return F.pmod(F.xxhash64(c), F.lit(buckets))
        return hash_bucket(c, buckets)

    ws = F.split(F.col(text_col), " ")
    feats = F.concat(word_ngrams(ws, 1), word_ngrams(ws, 2))
    fb = (df.select(target.alias("__t"), F.explode(feats).alias("__f"))
          .select("__t", bucket_of(F.col("__f")).alias("__b")))
    counts = (fb.groupBy("__b")
              .agg(F.count("*").alias("n_raw"),
                   F.count(F.when(F.col("__t"), 1)).alias("n_tgt")))
    totals = counts.agg(F.sum("n_raw").alias("t_raw"),
                        F.sum("n_tgt").alias("t_tgt"))
    a = F.lit(float(alpha))
    ab = F.lit(float(alpha) * buckets)
    wtab = (counts.crossJoin(F.broadcast(totals))
            .select("__b",
                    (F.log((F.col("n_tgt") + a) / (F.col("t_tgt") + ab))
                     - F.log((F.col("n_raw") + a) / (F.col("t_raw") + ab))
                     ).alias("__w")))
    # every bucket that occurs in ANY document occurs in the count
    # table by construction, so unseen buckets (weight 0 here) are
    # never looked up
    wmap = {r["__b"]: r["__w"] for r in wtab.collect()}
    warr = F.array(*[F.lit(float(wmap.get(b, 0.0)))
                     for b in range(buckets)])
    score = F.round(
        F.aggregate(feats, F.lit(0.0),
                    lambda acc, f: acc + F.element_at(
                        warr, (bucket_of(f) + 1).cast("int"))), 6)
    return df.select(F.col(id_col), score.alias("score"))


def _importance_weights_arrow(df: DataFrame, target: Column,
                              text_col: str, id_col: str,
                              buckets: int, alpha: float) -> DataFrame:
    """Arrow DSIR backend — the 100-TB production path.

    Same two-pass topology as the Column backends (count table →
    driver-held weight vector → map-only scoring), but each pass is a
    mapInPandas kernel: per batch, ALL unigram+bigram features are
    hashed by one vectorized `pd.util.hash_array` call and bucketed
    with np.add.at — the interpreted word_ngrams explode (counts) and
    per-feature aggregate fold (scoring) disappear. A different hash
    family than md5/xxhash64, so scores are not comparable across
    backends (the selection SEMANTICS are identical; rank correlation
    0.997 measured on the gate corpus); the md5 default stays the
    DuckDB-oracle-parity configuration. Measured ~2.5× the Column
    backends at 30-word docs — the residual cost is the per-doc
    Python shingle assembly, paid once per pass.

    Pass 1 shuffles ≤ buckets×batches partial-count rows (map-side
    pre-aggregation inside the kernel); pass 2 is shuffle-free. The
    model state crossing the driver is the buckets-sized weight
    vector, as before.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    B = buckets

    def _feat_buckets(texts):
        """hash every unigram+bigram in the batch → bucket ids + per-doc
        segment ids (np.add.at-ready)."""
        feats, seg = [], []
        for j, t in enumerate(texts):
            w = (t or "").split()
            n1 = len(w)
            feats.extend(w)
            feats.extend(" ".join(p) for p in zip(w, w[1:]))
            seg.extend([j] * (n1 + max(n1 - 1, 0)))
        if not feats:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.int64))
        h = pd.util.hash_array(np.asarray(feats, dtype=object))
        return (h % np.uint64(B)).astype(np.int64), np.asarray(seg)

    src = df.select(F.col(id_col), F.col(text_col).alias("__txt"),
                    target.alias("__t"))

    def count_gen(batches):
        for pdf in batches:
            bk, seg = _feat_buckets(pdf["__txt"].tolist())
            raw = np.zeros(B, dtype=np.int64)
            tgt = np.zeros(B, dtype=np.int64)
            if len(bk):
                np.add.at(raw, bk, 1)
                is_t = pdf["__t"].fillna(False).to_numpy(dtype=bool)[seg]
                np.add.at(tgt, bk[is_t], 1)
            nz = np.nonzero(raw)[0]
            yield pd.DataFrame({"__b": nz, "n_raw": raw[nz],
                                "n_tgt": tgt[nz]})

    cschema = T.StructType([T.StructField("__b", T.LongType()),
                            T.StructField("n_raw", T.LongType()),
                            T.StructField("n_tgt", T.LongType())])
    counts = (src.mapInPandas(count_gen, cschema)
              .groupBy("__b")
              .agg(F.sum("n_raw").alias("n_raw"),
                   F.sum("n_tgt").alias("n_tgt")))
    rows = counts.collect()
    t_raw = sum(r["n_raw"] for r in rows)
    t_tgt = sum(r["n_tgt"] for r in rows)
    w = np.zeros(B, dtype=np.float64)
    for r in rows:
        w[r["__b"]] = (
            np.log((r["n_tgt"] + alpha) / (t_tgt + alpha * B))
            - np.log((r["n_raw"] + alpha) / (t_raw + alpha * B)))

    id_f = df.schema[id_col]

    def score_gen(batches):
        for pdf in batches:
            bk, seg = _feat_buckets(pdf["__txt"].tolist())
            s = np.zeros(len(pdf), dtype=np.float64)
            if len(bk):
                np.add.at(s, seg, w[bk])
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "score": np.round(s, 6)})

    sschema = T.StructType([T.StructField(id_f.name, id_f.dataType),
                            T.StructField("score", T.DoubleType())])
    return src.mapInPandas(score_gen, sschema)


def importance_resample(df: DataFrame, target: Column, k: int,
                        text_col: str = "text", id_col: str = "doc_id",
                        buckets: int = 256, alpha: float = 1.0,
                        temperature: float = 1.0) -> DataFrame:
    """DSIR's sampling half: draw ``k`` documents without replacement
    with probability ∝ w(x)^(1/temperature) via the Gumbel-top-k
    trick — key = score/temperature + Gumbel noise, take the k largest
    keys. The noise is DETERMINISTIC (inverse-CDF of an md5-derived
    uniform per doc id), so selection is a pure function of the data:
    re-runs, resharding, and both engines of the gate agree exactly.

    Returns (id, score, key, selected); downstream keeps
    ``selected`` rows. One extra window over the key — at full scale
    replace the global rank with an approximate threshold (sample the
    key distribution, keep key > cutoff) to avoid the single-reducer
    tail sort; documented rather than defaulted because exact k is
    what the gate checks.
    """
    scored = importance_weights(df, target, text_col, id_col,
                                buckets, alpha)
    u = (hash_bucket(F.col(id_col).cast("string"), 65536)
         .cast("double") + 0.5) / 65536.0
    key = F.round(F.col("score") / F.lit(float(temperature))
                  - F.log(-F.log(u)), 6)
    w = Window.orderBy(F.col("key").desc(), F.col(id_col))
    return (scored.withColumn("key", key)
            .withColumn("selected", F.row_number().over(w) <= k))


def write_training_shards(packed: DataFrame, out_dir: str,
                          rows_per_file: int = 1_000_000,
                          id_col: str = "doc_id") -> int:
    """Materialize pack_sequences output as trainer-consumable parquet
    shards: range-partitioned by seq_id (a shard holds contiguous
    training sequences, never splits one) and row-capped per file.

    One range shuffle + one write; returns the number of sequences
    written. At 100 TB tune ``rows_per_file`` so a shard matches the
    trainer's shard-size appetite — the range partitioner keeps
    global sequence order across shard file names meaningless but
    seq_id itself total-orders the corpus, which is what data loaders
    key on.
    """
    n_seqs = packed.select(F.max("seq_id")).first()[0]
    if n_seqs is None:
        return 0
    (packed
     .repartitionByRange(F.col("seq_id"))
     .sortWithinPartitions("seq_id", "offset")
     .write.mode("overwrite")
     .option("maxRecordsPerFile", rows_per_file)
     .parquet(out_dir))
    return int(n_seqs) + 1


def kneser_ney_bigram_scores(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM, trained AND applied in one
    pass over the corpus (the fluency-scoring signal KenLM-style
    filters use; Chen & Goodman 1999's estimator):

        P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
                   + D·N1+(w1 ·)/c(w1·) · Pcont(w2)
        Pcont(w2) = N1+(· w2) / |distinct bigram types|

    Every quantity is a corpus aggregate (bigram counts, left/right
    continuation type counts, type total) joined back to the exploded
    bigrams — four keyed shuffles total, all JVM, no driver-side
    model table. Emits per-doc (n_bigrams, avg_logp) with avg_logp =
    mean ln P over the doc's bigrams, rounded to 6 decimals (both
    engines evaluate the identical double expression per bigram;
    the mean is over ≤ doc-length terms, summation noise ≪ 1e-6)."""
    ws = F.split(F.col(text_col), " ")
    bg = (df.select(id_col, F.posexplode(F.zip_with(
            F.slice(ws, 1, F.size(ws) - 1),
            F.slice(ws, 2, F.size(ws) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))))
          .alias("pos", "p"))
          .select(id_col, "pos", "p.w1", "p.w2"))
    cxy = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy"))
    left = (cxy.groupBy("w1")
            .agg(F.sum("cxy").alias("cx"),
                 F.count(F.lit(1)).alias("n_follow")))
    cont = cxy.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    n_types = cxy.agg(F.count(F.lit(1)).cast("double")
                      .alias("n_types"))
    d = F.lit(float(discount))
    p = ((F.greatest(F.col("cxy") - d, F.lit(0.0)) / F.col("cx"))
         + (d * F.col("n_follow") / F.col("cx"))
         * (F.col("n_prec") / F.col("n_types")))
    scored = (bg.join(cxy, ["w1", "w2"]).join(left, "w1")
              .join(cont, "w2").crossJoin(F.broadcast(n_types))
              .select(id_col, F.log(p).alias("logp")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.avg("logp"), 6).alias("avg_logp")))
