"""Model-based quality filtering: logistic regression over hashed
n-gram features, trained BY the engine with DataFrame aggregations.

The classifier-filter step of CCNet/RefinedWeb-class pipelines
(fastText-style): fit a linear model that separates a trusted slice
from the raw crawl, score every document, keep the confident ones.
Complements the heuristic filters (textops.quality) and the
density-ratio scorer (corpus.importance_weights) with a
discriminative model.

Training is batch gradient descent, one distributed round per
iteration:
  * the model (``buckets`` weights + bias — bounded driver state,
    like a centroid matrix) folds into the margin expression as an
    array literal, so the forward pass is map-only;
  * the gradient Σ_docs resid·count is ONE groupBy(bucket)
    aggregation with map-side partials — the shuffle carries at most
    ``buckets`` keys per round.
Feature hashing (and the one full explode) happens once up front; the
bucketed feature arrays are localCheckpointed and every round reuses
them. Deterministic end-to-end (zero init, fixed order), so the gate
oracle replays the whole training loop as unrolled SQL CTEs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nowdb_spark.operators.corpus import hash_bucket, word_ngrams


def _bucket_of(c: Column, buckets: int, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(c), F.lit(buckets))
    return hash_bucket(c, buckets)


def _features(text_col: str) -> Column:
    ws = F.split(F.col(text_col), " ")
    return F.concat(word_ngrams(ws, 1), word_ngrams(ws, 2))


def train_quality_classifier(df: DataFrame, label: Column,
                             text_col: str = "text",
                             buckets: int = 64, iters: int = 4,
                             lr: float = 0.5,
                             hash_fn: str = "md5") -> tuple:
    """Fit (weights list[buckets], bias) by ``iters`` rounds of batch
    gradient descent on log loss. ``label`` is a boolean Column over
    ``df`` (the trusted-slice indicator)."""
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(
            f"train_quality_classifier: unknown hash_fn {hash_fn!r}")
    bdf = (df.select(label.cast("double").alias("__y"),
                     F.transform(_features(text_col),
                                 lambda f: _bucket_of(f, buckets,
                                                      hash_fn))
                     .alias("__bs"))
           .localCheckpoint(eager=False))   # hash once, reuse per round
    n = bdf.count()
    w = [0.0] * buckets
    bias = 0.0
    for _ in range(iters):
        warr = F.array(*[F.lit(x) for x in w])
        margin = F.aggregate(
            F.col("__bs"), F.lit(float(bias)),
            lambda acc, b: acc + F.element_at(warr,
                                              (b + 1).cast("int")))
        resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
                 - F.col("__y")).alias("__r")
        rdf = bdf.select(resid, "__bs")
        agg = (rdf.select("__r", F.explode("__bs").alias("__b"))
               .groupBy("__b").agg(F.sum("__r").alias("g"))
               .collect())
        gsum = rdf.agg(F.sum("__r")).first()[0] or 0.0
        grad = {r["__b"]: r["g"] for r in agg}
        w = [w[b] - lr / n * grad.get(b, 0.0) for b in range(buckets)]
        bias = bias - lr / n * gsum
    return w, bias


def quality_score(df: DataFrame, weights: list, bias: float,
                  text_col: str = "text", id_col: str = "doc_id",
                  buckets: int | None = None,
                  hash_fn: str = "md5") -> DataFrame:
    """Score documents with a trained model: (id, score, keep) where
    score = σ(w·x + b) rounded to 6 and keep = score ≥ 0.5. Map-only
    pass — the model is an array literal, no join, no shuffle."""
    buckets = len(weights) if buckets is None else buckets
    warr = F.array(*[F.lit(float(x)) for x in weights])
    margin = F.aggregate(
        F.transform(_features(text_col),
                    lambda f: _bucket_of(f, buckets, hash_fn)),
        F.lit(float(bias)),
        lambda acc, b: acc + F.element_at(warr, (b + 1).cast("int")))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)
    return df.select(F.col(id_col), score.alias("score"),
                     (score >= 0.5).alias("keep"))


def train_bigram_lm(df: DataFrame, text_col: str = "text",
                    buckets: int = 2048, hash_fn: str = "md5") -> tuple:
    """Hashed bigram language model: the count tables behind
    P(w₂|w₁) ≈ (c(bucket(w₁ w₂)) + α) / (c(bucket(w₁)) + α·B).

    Hashing bounds the model at 2·``buckets`` longs no matter the
    vocabulary — the same state-size discipline as the DSIR weight
    table and the k-means centroids. One exploded pass per table,
    map-side partials, shuffles carry bucket keys only.

    Returns (unigram_counts, bigram_counts) as python lists.
    """
    def counts_of(col: Column) -> list:
        rows = (df.select(F.explode(col).alias("__f"))
                .select(_bucket_of(F.col("__f"), buckets, hash_fn)
                        .alias("__b"))
                .groupBy("__b").agg(F.count("*").alias("n")).collect())
        m = {r["__b"]: r["n"] for r in rows}
        return [int(m.get(b, 0)) for b in range(buckets)]

    ws = F.split(F.col(text_col), " ")
    return (counts_of(word_ngrams(ws, 1)), counts_of(word_ngrams(ws, 2)))


def perplexity(df: DataFrame, uni: list, bi: list,
               text_col: str = "text", id_col: str = "doc_id",
               alpha: float = 1.0, hash_fn: str = "md5") -> DataFrame:
    """Per-document perplexity under the hashed bigram LM — CCNet's
    filtering criterion (Wenzek et al. 2020): documents that the
    corpus-level LM finds surprising are the tail to inspect/drop.

    ppl = exp(−(1/n₂) Σ log P(wᵢ₊₁|wᵢ)), rounded to 6; NULL for
    documents with no bigram. Map-only: both count tables fold in as
    array literals, no join, no shuffle.
    """
    B = len(uni)
    ua = F.array(*[F.lit(float(c)) for c in uni])
    ba = F.array(*[F.lit(float(c)) for c in bi])
    a = float(alpha)
    ws = F.split(F.col(text_col), " ")
    ub = F.transform(word_ngrams(ws, 1),
                     lambda w: _bucket_of(w, B, hash_fn))
    bb = F.transform(word_ngrams(ws, 2),
                     lambda g: _bucket_of(g, B, hash_fn))
    lp = F.aggregate(
        F.zip_with(F.slice(ub, 1, F.greatest(F.size(ub) - 1, F.lit(0))),
                   bb,
                   lambda u, b: F.log(
                       (F.element_at(ba, (b + 1).cast("int")) + F.lit(a))
                       / (F.element_at(ua, (u + 1).cast("int"))
                          + F.lit(a * B)))),
        F.lit(0.0), lambda acc, x: acc + x)
    n2 = F.size(bb)
    ppl = F.when(n2 > 0,
                 F.round(F.exp(-lp / n2), 6)).otherwise(F.lit(None))
    return df.select(F.col(id_col), n2.cast("long").alias("n_bigrams"),
                     ppl.alias("ppl"))
