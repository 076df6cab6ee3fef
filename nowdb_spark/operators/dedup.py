"""Deduplication operators for training-data pipelines.

Strategies (cost at 100 TB in mind):
  exact_dedup        — md5(content) → min-id canonical per hash.
                       One shuffle on a 16-byte key; trivially scalable.
  minhash_signature  — k deterministic MinHash components per doc
                       (min over md5(shingle ⊕ seed)). Map-side only +
                       one groupBy(doc); shuffle carries (doc, k×hash).
  minhash_lsh_pairs  — band the signature, bucket-join within bands.
                       Candidate pairs ~ true near-dups, never O(n²).
  simhash            — 64-bit weighted-bit fingerprint; near-dups have
                       small Hamming distance. Map-side per doc.
  ngram_jaccard_pairs— exact Jaccard on shingle sets via a shingle
                       equi-join (inverted-index style). Exact but the
                       join can explode on hot shingles — at scale,
                       use it only to VERIFY candidates from LSH.

Hashes are md5-hex (deterministic, engine-portable) so results are
reproducible in ANSI SQL by the DuckDB oracle. At production scale,
swap HASH_FN to xxhash64 (F.xxhash64) — same topology, cheaper hash.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles as an array<string> (distinct not applied).

    slice+array_join per index — measured 3.3× faster than n
    element_at lookups + concat_ws per shingle (identical output).

    Documents shorter than n words yield an empty array (guarded:
    sequence(1, size-n+1) would otherwise run DESCENDING and feed
    slice a zero/negative start)."""
    ws = F.split(text, r"\s+")
    idx = F.when(F.size(ws) >= n,
                 F.sequence(F.lit(1), F.size(ws) - (n - 1))) \
           .otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )


def exact_dedup(df: DataFrame, content_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: content hash → canonical = min(id) per hash.

    Returns (id, content_hash, canonical_id, is_dup). Window over the
    hash = one hash-partition shuffle; no driver-side state.
    """
    h = F.md5(F.col(content_col))
    w = W.partitionBy("content_hash")
    return (
        df.select(F.col(id_col), h.alias("content_hash"))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
    )


def exact_dedup_increment(index: DataFrame, new_df: DataFrame,
                          content_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Incremental exact dedup: flag NEW-batch docs whose content
    already exists in a stored hash index, or is repeated inside the
    batch — without rereading the corpus.

    `index` is (content_hash, canonical_id) — e.g.
    ``exact_dedup(corpus).groupBy("content_hash")
    .agg(F.min("canonical_id").alias("canonical_id"))`` persisted
    once; each arrival appends its surviving hashes. Canonical
    precedence: an index hit wins over a within-batch canonical
    (the corpus copy pre-existed), matching what a full re-run over
    corpus ∪ batch would pick when corpus ids precede batch ids.

    Returns the same (id, content_hash, canonical_id, is_dup) shape
    as exact_dedup. One window shuffle over the batch + one join
    against the index (broadcast- or bucket-joinable at scale).
    """
    h = F.md5(F.col(content_col))
    w = W.partitionBy("content_hash")
    batch = (new_df.select(F.col(id_col), h.alias("content_hash"))
             .withColumn("_batch_canon", F.min(id_col).over(w)))
    idx = index.select("content_hash",
                       F.col("canonical_id").alias("_idx_canon"))
    return (batch.join(idx, "content_hash", "left")
            .withColumn("canonical_id",
                        F.coalesce("_idx_canon", "_batch_canon"))
            .withColumn("is_dup", F.col(id_col) != F.col("canonical_id"))
            .select(id_col, "content_hash", "canonical_id", "is_dup"))


def minhash_signature(df: DataFrame, content_col: str = "text",
                      id_col: str = "doc_id", k: int = 8,
                      shingle_n: int = 3,
                      keep: tuple = (),
                      hash_fn: str = "md5",
                      compact: bool = False) -> DataFrame:
    """k-component MinHash signature per document.

    ``hash_fn="md5"`` (default, oracle-parity): component i = min over
    shingles of rot_i(md5(shingle)), where rot_i left-rotates the
    32-hex digest by 4·i characters. Each rotation is a bijection of
    the digest space, so every component is a valid MinHash
    permutation; components share one md5 per shingle (the standard
    single-hash + derived-permutation trade, cf. datasketch's a·h+b
    mixing — measured 7× faster than k independent md5s, whose
    per-element lambda evaluation dominates at scale). k ≤ 8 keeps the
    rotations distinct (4·k ≤ 32 hex chars); components are hex
    strings.

    ``hash_fn="xxhash64"`` (production): component i = min over
    shingles of xxhash64(shingle, i). xxhash64 is JVM-native and ~an
    order of magnitude cheaper than md5 per call; the per-component
    seed column makes each component an independent hash family, so k
    is unbounded. Components are signed longs rendered as 16-hex
    strings (same downstream schema either way; not reproducible in
    ANSI SQL, hence the md5 default for the DuckDB-oracled gates).

    Entirely map-side either way: shingles never leave their row
    (aggregate over the array, no explode/shuffle).
    """
    if hash_fn not in ("md5", "xxhash64", "arrow"):
        raise ValueError(f"minhash_signature: unknown hash_fn {hash_fn!r}")
    if compact and hash_fn != "arrow":
        raise ValueError("minhash_signature: compact=True is the arrow "
                         "backend's int64 output (hex strings are the "
                         "oracle-parity schema)")
    if hash_fn == "arrow":
        return _minhash_signature_arrow(df, content_col, id_col, k,
                                        shingle_n, keep, compact)
    if hash_fn == "xxhash64":
        return _minhash_signature_xx(df, content_col, id_col, k,
                                     shingle_n, keep)
    if k > 8:
        raise ValueError("minhash_signature: k ≤ 8 (4·k ≤ 32 digest chars)")
    fold, comp_cols = _md5_fold_exprs(content_col, shingle_n, k)
    # No projection-collapse barrier needed: CollapseProject refuses
    # to inline a non-cheap producer referenced more than once
    # (SPARK-36718, in 3.2+), so expanding s0..s7 keeps exactly ONE
    # fold in the plan — verified in plans/r13 (1 md5, 1 aggregate).
    # The r5-era localCheckpoint barrier that guarded this forced an
    # RDD materialization per run (serialize every row, break the
    # codegen pipeline, block column pruning) — pure overhead now.
    out = df.select(F.col(id_col), *[F.col(c) for c in keep],
                    fold.alias("__sig"))
    return out.select(F.col(id_col), *[F.col(c) for c in keep],
                      *comp_cols)


@lru_cache(maxsize=64)
def _md5_fold_exprs(content_col: str, shingle_n: int,
                    k: int) -> tuple[Column, tuple[Column, ...]]:
    """Constant (per column name / n / k) md5-MinHash expression trees,
    built ONCE per process: the fold alone is ~200 Column-API py4j
    round-trips (~0.2 s of pure driver latency per plan build at the
    default k=8 — measured the largest single plan-construction cost
    in the bench, guide §7.3 / r14 VERDICT item 3). The returned
    Columns are unresolved expression templates — reusing them builds
    a fresh logical plan per query exactly as before."""
    sh = F.array_distinct(word_shingles(F.col(content_col), shingle_n))
    hs = F.transform(sh, lambda s: F.md5(s))

    def _rot(h: Column, o: int) -> Column:
        # NOTE: a 2-arg transform lambda would make pyspark pass the
        # array INDEX as the second argument — bind offsets like this
        return h if o == 0 else F.concat(
            F.substring(h, o + 1, 32 - o), F.substring(h, 1, o))

    # ALL k components in ONE fold over the hash array: k separate
    # array_min expressions would each re-execute the shingle+md5
    # subtree (Catalyst does not reuse common subtrees — measured 8×
    # the cost at sf0.1). 'g' sorts after every hex digest → sentinel
    # for "no shingles" (mapped to NULL after the barrier).
    fold = F.aggregate(
        hs,
        F.array(*[F.lit("g") for _ in range(k)]),
        lambda acc, h: F.array(*[
            F.least(F.element_at(acc, i + 1), _rot(h, 4 * i))
            for i in range(k)]))
    comp_cols = tuple(
        F.when(F.element_at("__sig", i + 1) != "g",
               F.element_at("__sig", i + 1)).alias(f"s{i}")
        for i in range(k))
    return fold, comp_cols


def _minhash_signature_xx(df: DataFrame, content_col: str, id_col: str,
                          k: int, shingle_n: int,
                          keep: tuple) -> DataFrame:
    """xxhash64 MinHash backend (see minhash_signature docstring).

    Each shingle STRING is hashed exactly once (xxhash64(s)); the k
    per-component values re-hash that fixed-width long with the
    component index as seed column (xxhash64(h, i) — an 8-byte input,
    an order of magnitude cheaper than re-hashing the string k times).
    One fold over the pre-hashed array then carries all k running
    minima as an array<long>. Sentinel for "no shingles" is Long.MAX →
    NULL after the fold, mirroring the md5 path's 'g' sentinel.
    Components are emitted as zero-padded 16-hex strings so both
    backends share one downstream schema (banding, est-Jaccard, tests
    are backend-agnostic).
    """
    fold, comp_cols = _xx_fold_exprs(content_col, shingle_n, k)
    # no barrier — see the md5 path: CollapseProject's non-cheap-
    # producer guard (SPARK-36718) keeps the fold single on its own
    out = df.select(F.col(id_col), *[F.col(c) for c in keep],
                    fold.alias("__sig"))
    return out.select(F.col(id_col), *[F.col(c) for c in keep],
                      *comp_cols)


@lru_cache(maxsize=64)
def _xx_fold_exprs(content_col: str, shingle_n: int,
                   k: int) -> tuple[Column, tuple[Column, ...]]:
    """Constant xxhash64-MinHash expression trees, built once per
    process (see _md5_fold_exprs — same ~k·20 py4j round-trip save)."""
    sh = F.array_distinct(word_shingles(F.col(content_col), shingle_n))
    hs = F.transform(sh, lambda s: F.xxhash64(s))
    sentinel = (1 << 63) - 1
    fold = F.aggregate(
        hs,
        F.array(*[F.lit(sentinel).cast("long") for _ in range(k)]),
        lambda acc, h: F.array(*[
            F.least(F.element_at(acc, i + 1), F.xxhash64(h, F.lit(i)))
            for i in range(k)]),
    )
    comp_cols = tuple(
        F.when(F.element_at("__sig", i + 1) != sentinel,
               F.lpad(F.hex(F.element_at("__sig", i + 1)), 16, "0"))
        .alias(f"s{i}")
        for i in range(k))
    return fold, comp_cols


def _minhash_signature_arrow(df: DataFrame, content_col: str, id_col: str,
                             k: int, shingle_n: int,
                             keep: tuple, compact: bool = False) -> DataFrame:
    """Arrow/numpy MinHash backend — the 100-TB production path.

    Spark's higher-order array functions are interpreted per element,
    so shingle materialization (split → slice → array_join) dominates
    the JVM backends at ~300µs/doc. This kernel does the whole
    signature inside one mapInPandas batch: Python builds each doc's
    distinct shingle set (cheap — plain str.split/join), ONE
    vectorized SipHash call (`pd.util.hash_array`, deterministic
    fixed-key) hashes every shingle in the batch, and k multiply-add
    mixes (odd multipliers, uint64 wraparound) + `np.minimum.at`
    produce all components — measured ~6× the xxhash64 Column backend
    end-to-end, ~350k docs/s/node at 30-word docs.

    Same output schema as the other backends (16-hex strings, NULL
    for docs shorter than shingle_n words); a *different* hash family,
    so signatures are not comparable across backends (LSH/banding
    semantics are identical). Narrow plan: mapInPandas over the scan,
    zero shuffle, batch-bounded memory.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    golden = 0x9E3779B97F4A7C15
    mults = [(golden * (2 * i + 1)) & ((1 << 64) - 1) for i in range(k)]
    adds = [((0xBF58476D1CE4E5B9 * (i + 1)) | 1) & ((1 << 64) - 1)
            for i in range(k)]
    sentinel = np.iinfo(np.uint64).max
    n, kk = shingle_n, k
    id_f = df.schema[id_col]
    keep_fs = [df.schema[c] for c in keep]

    def gen(batches):
        for pdf in batches:
            docs = pdf[content_col].tolist()
            all_sh, idx = [], []
            for j, t in enumerate(docs):
                w = (t or "").split()
                if len(w) >= n:
                    ss = {" ".join(w[i:i + n])
                          for i in range(len(w) - n + 1)}
                    all_sh.extend(ss)
                    idx.extend([j] * len(ss))
            out = np.full((len(docs), kk), sentinel, dtype=np.uint64)
            if all_sh:
                h = pd.util.hash_array(np.asarray(all_sh, dtype=object))
                ii = np.asarray(idx)
                with np.errstate(over="ignore"):
                    for c in range(kk):
                        m = h * np.uint64(mults[c]) + np.uint64(adds[c])
                        np.minimum.at(out[:, c], ii, m)
            mask = out[:, 0] == sentinel
            cols = {id_col: pdf[id_col].values}
            for c in keep:
                cols[c] = pdf[c].values
            for c in range(kk):
                if compact:
                    # int64 two's-complement view of the uint64
                    # component — equality-preserving, and the hex
                    # render (80M f-string calls at 10M docs × k=8)
                    # disappears from the hot path
                    cols[f"s{c}"] = pd.arrays.IntegerArray(
                        out[:, c].view(np.int64), mask.copy())
                else:
                    s = pd.Series([f"{v:016x}" for v in out[:, c]],
                                  dtype=object)
                    s[mask] = None
                    cols[f"s{c}"] = s
            yield pd.DataFrame(cols)

    comp_t = T.LongType() if compact else T.StringType()
    schema = T.StructType(
        [T.StructField(id_f.name, id_f.dataType)]
        + [T.StructField(f.name, f.dataType) for f in keep_fs]
        + [T.StructField(f"s{i}", comp_t) for i in range(kk)])
    return df.select(id_col, *keep, content_col).mapInPandas(gen, schema)


def lsh_index(df: DataFrame, content_col: str = "text",
              id_col: str = "doc_id", k: int = 8, bands: int = 4,
              shingle_n: int = 3, hash_fn: str = "md5",
              compact: bool = False) -> DataFrame:
    """Persistable MinHash-LSH index of a corpus: one
    (id, sig array, band_id, band_key) row per band per document.

    This is the state an INCREMENTAL dedup pipeline keeps: write it
    once with `.write.partitionBy("band_id")` (or bucketBy(band_key)
    for a shuffle-free probe join), then dedup each arriving batch
    against it with `lsh_increment_pairs` — the corpus is never
    re-shingled. At 100 TB the index is ~bands× small rows per doc
    (ids + k hashes, no text), a fraction of the corpus bytes.

    Docs below shingle_n words carry NULL signatures and are dropped
    here — md5-of-concat gave them a NULL band key (one degenerate
    all-shorts bucket whose pairs were always filtered at est=0);
    xxhash64 would otherwise hash "no component" to a REAL shared key
    and make that bucket quadratic.
    """
    rows = k // bands
    sig = minhash_signature(df, content_col, id_col, k, shingle_n,
                            hash_fn=hash_fn, compact=compact)
    if compact:
        band_cols = [
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(*[F.col(f"s{b * rows + r}")
                             for r in range(rows)]).alias("band_key"),
            )
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat(*[F.col(f"s{b * rows + r}")
                                 for r in range(rows)]))
                .alias("band_key"),
            )
            for b in range(bands)
        ]
    return sig.filter(F.col("s0").isNotNull()).select(
        id_col,
        F.array(*[F.col(f"s{i}") for i in range(k)]).alias("sig"),
        F.explode(F.array(*band_cols)).alias("band"),
    ).select(id_col, "sig", "band.band_id", "band.band_key")


def _bucket_allpairs(bd: DataFrame, id_col: str) -> DataFrame:
    """Emit each (band_id, band_key) bucket's a<b member pairs from
    the id-sorted member list — a banded⋈banded self-join would
    execute the signature subtree twice and shuffle it twice; this
    computes signatures once and shuffles the bucket lists once.
    Bucket sizes are bounded by collision probability (identical
    band keys), so per-row pair emission stays small."""
    buckets = (bd
               .groupBy("band_id", "band_key")
               .agg(F.sort_array(F.collect_list(
                   F.struct(F.col(id_col).alias("id"),
                            F.col("sig").alias("sig")))).alias("ms"))
               .filter(F.size("ms") >= 2))
    return (buckets
            .select(F.posexplode("ms").alias("i", "a"), "ms")
            .select("a", F.explode(
                F.slice("ms", F.col("i") + 2, F.size("ms"))).alias("b"))
            .select(F.col("a.id").alias("doc_a"),
                    F.col("b.id").alias("doc_b"),
                    F.col("a.sig").alias("siga"),
                    F.col("b.sig").alias("sigb")))


def _est_jaccard(k: int):
    return (F.size(F.filter(F.zip_with("siga", "sigb",
                                       lambda x, y: x == y),
                            lambda v: v))
            / F.lit(float(k)))


def lsh_increment_pairs(index: DataFrame, new_df: DataFrame,
                        content_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        bands: int = 4, threshold: float = 0.5,
                        shingle_n: int = 3, hash_fn: str = "md5",
                        compact: bool = False,
                        include_new_pairs: bool = True) -> DataFrame:
    """Incremental MinHash-LSH dedup: candidate pairs between a NEW
    batch and an already-indexed corpus (`lsh_index` output), plus the
    batch's internal pairs — WITHOUT re-hashing the corpus.

    Equivalence contract (locked by test): the result equals
    `minhash_lsh_pairs(corpus ∪ batch)` restricted to pairs touching
    at least one batch document. This is the production shape at
    100 TB — per-arrival work is O(batch) hashing + one join against
    the stored index, not O(corpus).

    Pairs are canonicalized doc_a < doc_b regardless of which side is
    the batch, so downstream `dup_clusters` works unchanged.
    """
    nb = lsh_index(new_df, content_col, id_col, k, bands, shingle_n,
                   hash_fn=hash_fn, compact=compact)
    a = index.select(F.col(id_col).alias("doc_a"),
                     F.col("sig").alias("siga"), "band_id", "band_key")
    b = nb.select(F.col(id_col).alias("doc_b"),
                  F.col("sig").alias("sigb"), "band_id", "band_key")
    sw = F.col("doc_a") > F.col("doc_b")
    cross = (a.join(b, ["band_id", "band_key"])
             .filter(F.col("doc_a") != F.col("doc_b"))
             .select(
                 F.when(sw, F.col("doc_b")).otherwise(F.col("doc_a"))
                 .alias("doc_a"),
                 F.when(sw, F.col("doc_a")).otherwise(F.col("doc_b"))
                 .alias("doc_b"),
                 F.when(sw, F.col("sigb")).otherwise(F.col("siga"))
                 .alias("siga"),
                 F.when(sw, F.col("siga")).otherwise(F.col("sigb"))
                 .alias("sigb")))
    pairs = cross
    if include_new_pairs:
        pairs = pairs.unionByName(_bucket_allpairs(nb, id_col))
    return (pairs.dropDuplicates(["doc_a", "doc_b"])
            .withColumn("est_jaccard", F.round(_est_jaccard(k), 6))
            .filter(F.col("est_jaccard") >= threshold)
            .select("doc_a", "doc_b", "est_jaccard"))


def minhash_lsh_pairs(df: DataFrame, content_col: str = "text",
                      id_col: str = "doc_id", k: int = 8, bands: int = 4,
                      threshold: float = 0.5,
                      shingle_n: int = 3,
                      hash_fn: str = "md5",
                      compact: bool = False,
                      hub_cap: int | None = None) -> DataFrame:
    """LSH candidate pairs + estimated Jaccard, filtered by threshold.

    Signature → `bands` band-keys (md5 of concatenated rows-per-band)
    → explode to (band_id, band_key) → self-join within band buckets →
    distinct pairs → estimate = fraction of equal signature components.
    The band join is the only shuffle; bucket sizes are bounded by
    collision probability, never O(n²).

    ``compact=True`` (arrow backend only) carries int64 signature
    components instead of 16-hex strings: the banded shuffle row drops
    from ~8 UTF8 strings (~200 B with offsets) to 8 longs (64 B), and
    the band key is one JVM xxhash64 over the row's longs instead of
    md5-of-concat — same pairs, same estimates, ~3× less shuffle at
    10M docs. The production configuration; hex is oracle parity.

    ``hub_cap``: real corpora contain CLONE GROUPS (boilerplate pages
    repeated 10⁴-10⁶×) whose members all land in one bucket — all-pairs
    there is C(n,2) and the bucket's collect_list is one giant row.
    With hub_cap set, buckets larger than it switch to STAR emission:
    the min-id member pairs with every other member, streamed as a
    join (no per-bucket array at all). Linear in bucket size. For
    clone groups — where giant buckets come from, and all a giant
    bucket can be once exact_dedup has run first (standard pipeline
    order) — every star pair estimates 1.0, so dup_clusters() over
    the capped pairs equals the uncapped clustering exactly (locked
    by test). For a giant bucket of merely-similar docs the star is
    an approximation (a member chain-linked through another member,
    not the hub, can fall under the threshold); the cap trades that
    tail for not emitting C(n,2) pairs. Use when pairs feed
    clustering / canonical-doc selection, not when the full pair
    list itself is the product.
    """
    banded = lsh_index(df, content_col, id_col, k, bands, shingle_n,
                       hash_fn=hash_fn, compact=compact)

    if hub_cap is None:
        pairs = _bucket_allpairs(banded, id_col) \
            .dropDuplicates(["doc_a", "doc_b"])
    else:
        sizes = (banded.groupBy("band_id", "band_key")
                 .agg(F.count(F.lit(1)).alias("__n")))
        tagged = banded.join(sizes, ["band_id", "band_key"])
        small = _bucket_allpairs(
            tagged.filter(F.col("__n") <= hub_cap).drop("__n"), id_col)
        big = tagged.filter(F.col("__n") > hub_cap).drop("__n")
        # star: min-id member joins against every other member — pure
        # streaming join, no bucket array, linear emission
        hubs = (big.groupBy("band_id", "band_key")
                .agg(F.min(id_col).alias("__hub"),
                     F.min_by("sig", F.col(id_col)).alias("__hubsig")))
        star = (big.join(hubs, ["band_id", "band_key"])
                .filter(F.col(id_col) != F.col("__hub"))
                .select(F.col("__hub").alias("doc_a"),
                        F.col(id_col).alias("doc_b"),
                        F.col("__hubsig").alias("siga"),
                        F.col("sig").alias("sigb")))
        pairs = small.unionByName(star) \
                     .dropDuplicates(["doc_a", "doc_b"])
    return (
        pairs.withColumn("est_jaccard", F.round(_est_jaccard(k), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def simhash64(text: Column, shingle_n: int = 1) -> Column:
    """64-bit SimHash over word (or shingle) md5 hashes.

    Each token votes its 64 md5-derived bits; the fingerprint keeps
    the majority per bit. Pure Column composition: the 64 bit-sums are
    computed with transform/aggregate over the token array (map-side,
    no shuffle). Returns the fingerprint as a 16-hex-char string.
    """
    toks = (
        F.split(text, r"\s+") if shingle_n == 1
        else word_shingles(text, shingle_n)
    )
    # per token: md5 hex (32 chars); use first 16 chars = 64 bits
    hexes = F.transform(toks, lambda t: F.substring(F.md5(t), 1, 16))
    digits = "0123456789abcdef"

    # ONE fold carrying all 64 bit counters (+ token count in slot 65):
    # 64 separate aggregates would each re-execute the tokenize+md5
    # subtree (no common-subtree reuse in Catalyst — measured 64× the
    # md5 work); here every token is hashed once and votes all its
    # bits in a single pass, and the `finish` lambda assembles the
    # final hex fingerprint inside the same expression.
    def digit_value(h: Column, pos: int) -> Column:
        return F.instr(F.lit(digits), F.substring(h, pos, 1)) - 1  # 0..15

    def merge(acc: Column, h: Column) -> Column:
        cells = []
        for pos in range(16):
            v = digit_value(h, pos + 1)
            for b in range(4):
                cells.append(F.element_at(acc, pos * 4 + b + 1)
                             + F.shiftright(v, b).bitwiseAND(F.lit(1)))
        cells.append(F.element_at(acc, 65) + 1)
        return F.array(*cells)

    def finish(acc: Column) -> Column:
        n = F.element_at(acc, 65)
        out_digits = []
        for pos in range(16):
            bits = [
                F.when(F.element_at(acc, pos * 4 + b + 1) * 2 > n,
                       F.lit(1 << b)).otherwise(F.lit(0))
                for b in range(4)
            ]
            val = bits[0] + bits[1] + bits[2] + bits[3]
            out_digits.append(
                F.substring(F.lit(digits), (val + 1).cast("int"), 1))
        return F.concat(*out_digits)

    return F.aggregate(hexes, F.array(*[F.lit(0)] * 65), merge, finish)


def simhash64_arrow(df: DataFrame, content_col: str = "text",
                    id_col: str = "doc_id",
                    shingle_n: int = 1) -> DataFrame:
    """Arrow/numpy SimHash backend — the 100-TB production path.

    The Column backend (simhash64) folds ~80 interpreted string/array
    ops per token; this kernel hashes every token in the batch with
    ONE vectorized SipHash call (`pd.util.hash_array`), expands the
    64 vote matrix from packed bit planes, and accumulates per-doc
    bit sums with segmented reduceat — measured 1.7M docs/s at 10M ×
    30-word docs vs 40k for the Column fold (~40×). Different hash
    family than the md5-oracled
    simhash64 (fingerprints are not comparable across backends;
    Hamming-distance semantics are identical). Output: (id, simhash
    16-hex string, NULL for docs with no tokens). Narrow plan, zero
    shuffle.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n = shingle_n
    id_f = df.schema[id_col]

    def gen(batches):
        shifts = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            docs = pdf[content_col].tolist()
            toks = []
            lens = np.empty(len(docs), dtype=np.int64)
            for j, t in enumerate(docs):
                w = (t or "").split()
                if n > 1:
                    w = [" ".join(w[i:i + n])
                         for i in range(len(w) - n + 1)]
                toks.extend(w)
                lens[j] = len(w)
            fp = np.zeros(len(docs), dtype=np.uint64)
            nz = np.flatnonzero(lens)
            if len(nz):
                h = pd.util.hash_array(np.asarray(toks, dtype=object))
                # tokens are appended doc-major → per-doc segments are
                # contiguous, so the 64 bit-sums come from segmented
                # sums (reduceat), not np.add.at's per-row scatter.
                # The bits stay PACKED: 8 bit-plane masks over the
                # 8-byte view, each reduceat-ed on uint8 input with an
                # int32 accumulator — ~8× cheaper than expanding every
                # token to 64 int rows. Bit→position mapping follows
                # the native (LE) byte order; only consistency
                # matters for Hamming distance.
                starts = np.zeros(len(nz), dtype=np.int64)
                starts[1:] = np.cumsum(lens[nz])[:-1]
                bytes8 = h.view(np.uint8).reshape(-1, 8)
                ones = np.empty((len(nz), 64), dtype=np.int32)
                masked = np.empty_like(bytes8)
                for bit in range(8):
                    np.bitwise_and(bytes8 >> bit, 1, out=masked)
                    ones[:, bit::8] = np.add.reduceat(
                        masked, starts, axis=0, dtype=np.int32)
                maj = (2 * ones > lens[nz, None]).astype(np.uint64)
                fp[nz] = (maj << shifts).sum(axis=1, dtype=np.uint64)
            s = pd.Series([f"{v:016x}" for v in fp], dtype=object)
            s[lens == 0] = None
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "simhash": s})

    schema = T.StructType([T.StructField(id_f.name, id_f.dataType),
                           T.StructField("simhash", T.StringType())])
    return df.select(id_col, content_col).mapInPandas(gen, schema)


def simhash_dedup(df: DataFrame, content_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-doc SimHash fingerprints (near-dup = small Hamming distance;
    group by fingerprint prefix bands to find candidates at scale)."""
    return df.select(F.col(id_col),
                     simhash64(F.col(content_col)).alias("simhash"))


def dup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                 b_col: str = "doc_b") -> DataFrame:
    """Transitive closure of near-dup pairs → (doc_id, canonical_id).

    Pairwise near-dup relations are not transitive-closed (a~b, b~c
    does not emit a~c); keeping one doc per *connected component* is
    the correct dedup policy at scale. Reuses the min-label
    connected-components propagation (operators/graph)."""
    from nowdb_spark.operators.graph import connected_components
    edges = pairs.select(F.col(a_col).alias("src"),
                         F.col(b_col).alias("dst"))
    cc = connected_components(edges)
    return cc.select(F.col("node").alias("doc_id"),
                     F.col("component").alias("canonical_id"))


def _shingle_intersections(df: DataFrame, content_col: str, id_col: str,
                           n: int,
                           max_df: int | None = None
                           ) -> tuple[DataFrame, DataFrame]:
    """(inter, card): per-pair shared-shingle counts (a<b) and per-doc
    distinct-shingle cardinalities.

    Intersections come from grouping the shingle inverted index and
    emitting each posting list's a<b pairs (graph.pairs_from_groups —
    hot-shingle emission is block-spread, never one mega-task); a
    sh⋈sh self-join would execute the shingle explode twice and
    shuffle it twice. Cardinality is map-side (size of the distinct
    shingle array), no shuffle and no reuse of the exploded subtree.

    `max_df` (stop-shingle cutoff): drop shingles whose posting list
    exceeds max_df docs before pair emission. A shingle shared by a
    large fraction of the corpus carries no dedup signal but emits
    O(df²) pairs — on a corpus whose common n-grams appear in >1% of
    documents the exact index degenerates toward all-pairs. With the
    cutoff, intersections are computed over informative shingles only
    (an undercount for dropped ones — the standard approximation;
    gates run with max_df=None for exact oracle parity).
    """
    from nowdb_spark.operators.graph import pairs_from_groups

    shingles = F.array_distinct(word_shingles(F.col(content_col), n))
    card = df.select(F.col(id_col), F.size(shingles).alias("card"))
    sh = df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
    if max_df is not None:
        keep = (sh.groupBy("shingle").count()
                .filter(F.col("count") <= max_df).select("shingle"))
        sh = sh.join(keep, "shingle")
    inter = (pairs_from_groups(sh, "shingle", id_col)
             .groupBy(F.col("a").alias("doc_a"),
                      F.col("b").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("n_inter")))
    return inter, card


def ngram_jaccard_pairs(df: DataFrame, content_col: str = "text",
                        id_col: str = "doc_id", n: int = 2,
                        threshold: float = 0.2,
                        max_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity via the shingle inverted index.
    Returns (doc_a, doc_b, jaccard) for pairs ≥ threshold.

    Exact at max_df=None; at 100 TB use as the verify stage behind
    minhash_lsh_pairs candidates, or set max_df (stop-shingle cutoff,
    see _shingle_intersections) for a full-corpus approximate sweep.
    """
    inter, card = _shingle_intersections(df, content_col, id_col, n,
                                         max_df)
    ca = card.select(F.col(id_col).alias("doc_a"), F.col("card").alias("card_a"))
    cb = card.select(F.col(id_col).alias("doc_b"), F.col("card").alias("card_b"))
    return (
        inter.join(ca, "doc_a").join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter").cast("double")
                    / (F.col("card_a") + F.col("card_b") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(df: DataFrame, content_col: str = "text",
                      id_col: str = "doc_id", n: int = 2,
                      threshold: float = 0.4,
                      max_df: int | None = None) -> DataFrame:
    """Asymmetric containment |A∩B| / |A| ≥ threshold — superset/quote
    detection that a symmetric Jaccard policy can't express. Directed:
    both (a,b) and (b,a) are evaluated (intersection is symmetric, so
    each undirected pair explodes into its two orientations).
    `max_df`: stop-shingle cutoff, see _shingle_intersections."""
    inter, card = _shingle_intersections(df, content_col, id_col, n,
                                         max_df)
    both = (inter.select(F.explode(F.array(
        F.struct(F.col("doc_a"), F.col("doc_b"), F.col("n_inter")),
        F.struct(F.col("doc_b").alias("doc_a"),
                 F.col("doc_a").alias("doc_b"),
                 F.col("n_inter")))).alias("p"))
        .select("p.*"))
    ca = card.select(F.col(id_col).alias("doc_a"),
                     F.col("card").alias("card_a"))
    return (both.join(ca, "doc_a")
            .withColumn("containment",
                        F.round(F.col("n_inter").cast("double")
                                / F.col("card_a"), 6))
            .filter(F.col("containment") >= threshold)
            .select("doc_a", "doc_b", "containment"))


def duplicate_spans(df: DataFrame, content_col: str = "text",
                    id_col: str = "doc_id", k: int = 5,
                    hash_fn: str = "md5") -> DataFrame:
    """Substring-level dedup: maximal duplicated token spans.

    The shingle-granular form of exact-substring deduplication (Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): a k-token window is *duplicated* when the same k tokens
    occur anywhere else in the corpus (another document OR another
    position of the same document); runs of consecutive duplicated
    windows merge into maximal spans. Where the paper builds a suffix
    array, the Spark-native plan is an inverted index over positional
    shingles — same duplicated-span output at shingle granularity
    (spans are detected from length k upward, and a maximal span's
    boundaries are token-exact because every one of its windows must
    be duplicated).

    Returns (id, span_start, span_end, n_tokens) — token indices,
    0-based, end-exclusive. Empty result = no duplicated spans.

    Shape at 100 TB: one shuffle of (id, pos, hash) — ~#tokens rows,
    the same order as a distributed suffix-array build's I/O — where
    the count-over-hash window marks duplicated windows with map-side
    partial counts; then one shuffle by document for the
    gaps-and-islands merge (row_number difference). No driver state,
    no O(n²) pair expansion: a window repeated R times costs R rows,
    not R² pairs. ``hash_fn="md5"`` is the oracle-reproducible
    default; "xxhash64" halves the shuffle key width (8-byte Long) for
    production runs.
    """
    if hash_fn not in ("md5", "xxhash64", "arrow"):
        raise ValueError(f"duplicate_spans: unknown hash_fn {hash_fn!r}")
    if hash_fn == "arrow":
        # positional-shingle hashing in one Arrow batch (vectorized
        # SipHash over every window string, like the minhash kernel):
        # the JVM transform/slice/array_join chain is interpreted per
        # window and dominates the md5/xxhash64 paths' cost. Same
        # downstream plan — only the (id, pos, h) production differs,
        # and span detection depends on hash equality alone, so any
        # injective-in-practice family yields identical spans.
        sh = _positional_hashes_arrow(df, content_col, id_col, k)
    else:
        ws = F.split(F.col(content_col), r"\s+")
        idx = F.when(F.size(ws) >= k,
                     F.sequence(F.lit(1), F.size(ws) - (k - 1))) \
               .otherwise(F.array().cast("array<int>"))
        shingle = lambda i: F.array_join(F.slice(ws, i, k), " ")  # noqa: E731
        hashed = (F.md5 if hash_fn == "md5" else F.xxhash64)
        sh = df.select(
            F.col(id_col),
            F.posexplode(F.transform(idx, lambda i: hashed(shingle(i))))
            .alias("pos", "h"))                  # pos 0-based
    dup = (sh
           .withColumn("__c", F.count(F.lit(1)).over(W.partitionBy("h")))
           .filter(F.col("__c") >= 2))
    grp = (F.col("pos")
           - F.row_number().over(W.partitionBy(id_col).orderBy("pos")))
    return (dup
            .withColumn("__g", grp)
            .groupBy(id_col, "__g")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + F.lit(k)).alias("span_end"))
            .select(F.col(id_col),
                    F.col("span_start").cast("long"),
                    F.col("span_end").cast("long"),
                    (F.col("span_end") - F.col("span_start"))
                    .cast("long").alias("n_tokens")))


def _positional_hashes_arrow(df: DataFrame, content_col: str,
                             id_col: str, k: int) -> DataFrame:
    """(id, pos, h): one int64 hash per k-token window, produced in
    Arrow batches — per batch, every window string across all docs is
    hashed by ONE vectorized `pd.util.hash_array` call. Narrow plan
    (mapInPandas over the scan, no shuffle); output row count equals
    the JVM paths' posexplode exactly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    id_f = df.schema[id_col]

    def gen(batches):
        for pdf in batches:
            ids, poss, strs = [], [], []
            for did, t in zip(pdf[id_col].values,
                              pdf[content_col].tolist()):
                w = (t or "").split()
                n_win = len(w) - k + 1
                if n_win <= 0:
                    continue
                ids.extend([did] * n_win)
                poss.extend(range(n_win))
                strs.extend(" ".join(w[i:i + k]) for i in range(n_win))
            if strs:
                h = pd.util.hash_array(
                    np.asarray(strs, dtype=object)).view(np.int64)
            else:
                h = np.empty(0, dtype=np.int64)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                 "pos": np.asarray(poss, dtype=np.int32),
                 "h": h})

    schema = T.StructType([
        T.StructField(id_f.name, id_f.dataType),
        T.StructField("pos", T.IntegerType()),
        T.StructField("h", T.LongType()),
    ])
    return df.select(id_col, content_col).mapInPandas(gen, schema)


def remove_duplicate_spans(df: DataFrame, content_col: str = "text",
                           id_col: str = "doc_id", k: int = 5,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """Rewrite each document with its duplicated spans cut out
    (every occurrence whose k-token windows are duplicated corpus-wide
    is dropped; Lee et al. keep one occurrence, which needs a global
    occurrence order). Note the cut re-joins the tokens on either side
    of a removed span, which can create NEW k-token windows — like the
    suffix-array original, one pass removes all *pre-existing*
    duplicates but is not a fixed point; iterate if that matters.

    Returns (id, text) with the deduplicated text (tokens joined by a
    single space; documents losing every token keep an empty string).

    One extra shuffle over duplicate_spans: spans join back to the
    exploded tokens by document, tokens inside any span are dropped,
    survivors re-assemble ordered by position (the groupBy carries
    (pos, token) structs so reassembly is order-exact without relying
    on collect_list ordering).
    """
    spans = duplicate_spans(df, content_col, id_col, k, hash_fn) \
        .groupBy(id_col) \
        .agg(F.collect_list(F.struct("span_start", "span_end"))
             .alias("__spans"))
    ws = F.split(F.col(content_col), r"\s+")
    toks = df.select(F.col(id_col),
                     F.posexplode(ws).alias("pos", "tok"))
    in_span = F.exists(
        "__spans",
        lambda s: (F.col("pos") >= s["span_start"])
        & (F.col("pos") < s["span_end"]))
    kept = (toks.join(spans, id_col, "left")
            .filter(F.col("__spans").isNull() | ~in_span))
    rebuilt = (kept
               .groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "tok"))),
                       lambda s: s["tok"]),
                   " ").alias(content_col)))
    # documents whose every token fell inside a span still come back
    ids = df.select(id_col)
    return (ids.join(rebuilt, id_col, "left")
            .withColumn(content_col,
                        F.coalesce(F.col(content_col), F.lit(""))))
