"""Unit-level behavior tests for the round-12 operators, beyond the
oracle sweep: k-core on a known graph, CUSUM on an injected drift,
perplexity-bucket balance, residual-quant recall ordering."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nowdb_spark.operators import graph as G
from tests.conftest import SF_DIR


def test_kcore_known_graph(spark):
    """4-clique + pendant chain: the 2-core is exactly the clique
    (pendants peel in cascade), and core degrees are 3."""
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 4), (4, 5), (5, 6)]
    e = spark.createDataFrame(clique + chain, "src long, dst long")
    out = {r["node"]: r["core_deg"]
           for r in G.k_core(G.undirect(e), k=2, rounds=5).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_relative_k_and_convergence(spark):
    """k_frac computes k = floor(frac·(n−1)); extra rounds beyond
    convergence are no-ops (same result at rounds=3 and rounds=8)."""
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    pend = [(4, 10), (10, 11)]
    e = G.undirect(spark.createDataFrame(clique + pend,
                                         "src long, dst long"))
    # n = 7 nodes → k = floor(0.5·6) = 3: the 5-clique survives
    a = sorted(G.k_core(e, k_frac=0.5, rounds=3).collect())
    b = sorted(G.k_core(e, k_frac=0.5, rounds=8).collect())
    assert a == b
    assert {r["node"] for r in a} == {0, 1, 2, 3, 4}


def test_cusum_detects_injected_level_shift(spark):
    """A flat series with a mid-stream level shift must alarm, and
    an unshifted twin must not. (With the whole-series mean as the
    baseline, the PRE-shift half sits below mu, so the negative-side
    accumulator fires first — first_alarm is simply > 0.)"""
    from nowdb_spark.operators.timeseries import cusum_changepoints
    hour = 3_600_000_000_000
    rows = []
    for i in range(200):
        base = 10.0 + (i % 3) * 0.1            # small noise
        rows.append(("flat", i * hour, base))
        rows.append(("shift", i * hour,
                     base + (5.0 if i >= 120 else 0.0)))
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = {r["k"]: r for r in cusum_changepoints(
        df, "ts", "value", hour, key_col="k").collect()}
    assert out["shift"]["n_alarms"] > 0
    assert out["shift"]["first_alarm"] > 0
    assert out["flat"]["n_alarms"] == 0
    assert out["flat"]["first_alarm"] == 0
    assert out["shift"]["n_buckets"] == 200


def test_perplexity_buckets_balanced_and_ordered(spark):
    """ntile terciles: per domain, bucket sizes differ by ≤1 and
    bucket 1 (head) has the highest (least negative) logp range."""
    from nowdb_spark.operators.corpus import perplexity_buckets
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = perplexity_buckets(docs).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["source"], []).append(r)
    assert by_dom
    for dom, rows in by_dom.items():
        rows.sort(key=lambda r: r["bucket"])
        sizes = [r["n_docs"] for r in rows]
        assert max(sizes) - min(sizes) <= 1, (dom, sizes)
        # head bucket's minimum logp ≥ next bucket's maximum
        for a, b in zip(rows, rows[1:]):
            assert a["min_logp"] >= b["max_logp"], dom


def test_residual_quant_beats_plain_bits_on_clustered(spark):
    """On a small clustered corpus, ann12's residual code must give
    coarse recall at least as good as ann10's whole-vector bits
    (the property the operator exists for)."""
    from nowdb_spark.operators import similarity as S
    n, dim, n_cl = 4000, 16, 8
    cid = F.pmod(F.col("id"), F.lit(n_cl))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.pmod(F.xxhash64(F.lit("c"), cid, i),
                           F.lit(2001)).cast("double") / 1000.0 - 1.0)
                   + 0.3 * (F.pmod(F.xxhash64(F.col("id"), i),
                                   F.lit(2001)).cast("double")
                            / 1000.0 - 1.0)))
    corpus = (spark.range(n)
              .select(F.col("id").alias("vec_id"),
                      vec.alias("embedding")))
    q = (spark.range(3)
         .select((F.col("id") * 131 + 7).alias("id"))
         .select(F.col("id").alias("qid"), vec.alias("qvec")))
    truth = {(r["qid"], r["vec_id"]) for r in
             S.brute_force_topk_batch(corpus, q, k=5).collect()}

    def pairs(df):
        return {(r["qid"], r["vec_id"])
                for r in df.select("qid", "vec_id").collect()}

    r10 = pairs(S.binary_quant_topk_batch(corpus, q, k=5,
                                          coarse=100))
    r12 = pairs(S.binary_residual_topk_batch(
        corpus, q, k=5, coarse=100, n_centroids=n_cl, iters=2))
    assert len(r12 & truth) >= len(r10 & truth)


def test_unigram_segmentation_known_vocab(spark):
    """With a hand-built vocab, Viterbi picks the max-logp
    tokenization with the documented tie-breaks."""
    from nowdb_spark.operators.tokenize import unigram_lm_segment
    import math as _m
    # 'abab': vocab prefers the 2-gram 'ab' (higher prob than chars)
    vocab = {"a": round(_m.log(0.1), 6), "b": round(_m.log(0.1), 6),
             "ab": round(_m.log(0.4), 6)}
    df = spark.createDataFrame([(1, "abab"), (2, "aba"), (3, "")],
                               "doc_id long, text string")
    out = {r["doc_id"]: (r["n_chars"], r["n_tokens"], r["score"])
           for r in unigram_lm_segment(df, vocab).collect()}
    lp = lambda t: vocab[t]  # noqa: E731
    assert out[1] == (4, 2, round(round(lp("ab") + lp("ab"), 6), 6))
    # 'aba' → ab + a beats a + b + a
    assert out[2][1] == 2
    assert out[3] == (0, 0, 0.0)
    # unreachable char → n_tokens 0 (honest signal, not a crash)
    df2 = spark.createDataFrame([(9, "axb")], "doc_id long, text string")
    out2 = unigram_lm_segment(df2, vocab).collect()[0]
    assert out2["n_tokens"] == 0 and out2["score"] == 0.0


def test_unigram_vocab_feasibility(spark):
    """Every single character survives the vocabulary cut, so any
    document over the corpus alphabet is segmentable."""
    from nowdb_spark.operators.tokenize import (unigram_lm_segment,
                                                unigram_vocab)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    vocab = unigram_vocab(docs)
    assert vocab
    out = unigram_lm_segment(docs, vocab).collect()
    assert all(r["n_tokens"] > 0 for r in out if r["n_chars"] > 0)
    # tokens per char is bounded by 1 (singles) from above and
    # 1/max_len from below
    for r in out:
        if r["n_chars"]:
            assert r["n_chars"] / 4 <= r["n_tokens"] <= r["n_chars"]
