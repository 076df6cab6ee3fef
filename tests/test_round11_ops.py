"""Round-11 operators: MaxSim late interaction, registrable-domain
(PSL eTLD+1), Kneser-Ney bigram LM, MDCT/TDAC primitive."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from nowdb_spark.operators import similarity as S
from tests.conftest import SF_DIR


def test_maxsim_matches_naive(spark):
    """maxsim_topk == a driver-side numpy recompute of
    sum-of-max-cosines on the same token bags."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(60)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    toks = emb.select((F.col("vec_id") / 5).cast("long")
                      .alias("doc_id"), "vec_id", "embedding")
    q = (toks.filter(F.col("doc_id") == 0)
         .select(F.col("vec_id").alias("qtok_id"),
                 F.col("embedding").alias("qvec")))
    got = {r["doc_id"]: (r["score"], r["rnk"]) for r in
           S.maxsim_topk(toks.filter(F.col("doc_id") != 0), q,
                         k=5).collect()}

    def cos(a, b):
        return round(float(a @ b)
                     / (np.linalg.norm(a) * np.linalg.norm(b)), 6)

    qs = [v for i, v in rows.items() if i < 5]
    scores = {}
    for d in {i // 5 for i in rows} - {0}:
        bag = [v for i, v in rows.items() if i // 5 == d]
        scores[d] = round(sum(max(cos(qv, dv) for dv in bag)
                              for qv in qs), 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == {d: (s, r + 1) for r, (d, s) in enumerate(want)}


def test_registrable_domain_rule_classes(spark):
    from nowdb_spark.sources.warc import registrable_domain
    cases = [
        ("www.example.com", "example.com"),        # normal 1-label
        ("a.b.example.co.uk", "example.co.uk"),    # normal 2-label
        ("user.github.io", "user.github.io"),      # private entry
        ("x.y.ck", "x.y.ck"),                      # wildcard *.ck
        ("y.ck", None),                            # IS a public suffix
        ("www.ck", "www.ck"),                      # exception rule
        ("co.uk", None),                           # bare suffix
        ("com", None),                             # bare TLD
        ("host.unknowntld", "host.unknowntld"),    # default '*' rule
        ("unknowntld", None),
        ("WWW.Example.COM", "example.com"),        # case folding
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["reg"] for r in
           df.select(registrable_domain(F.col("host")).alias("reg"))
           .collect()]
    assert got == [want for _, want in cases]


def test_kneser_ney_matches_naive(spark):
    """kneser_ney_bigram_scores == a dict-based KN recompute."""
    from nowdb_spark.operators.corpus import kneser_ney_bigram_scores
    docs = [(0, "a b a b c"), (1, "a b c d"), (2, "b c b c"),
            (3, "d a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in kneser_ney_bigram_scores(df).collect()}

    bgs = {}
    for _, t in docs:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            bgs[(a, b)] = bgs.get((a, b), 0) + 1
    cx = {}
    nf = {}
    npr = {}
    for (a, b), c in bgs.items():
        cx[a] = cx.get(a, 0) + c
        nf[a] = nf.get(a, 0) + 1
        npr[b] = npr.get(b, 0) + 1
    nt = float(len(bgs))
    want = {}
    for did, t in docs:
        ws = t.split(" ")
        lps = []
        for a, b in zip(ws, ws[1:]):
            p = (max(bgs[(a, b)] - 0.75, 0.0) / cx[a]
                 + (0.75 * nf[a] / cx[a]) * (npr[b] / nt))
            lps.append(math.log(p))
        want[did] = (len(lps), round(sum(lps) / len(lps), 6))
    assert got == want


def test_kn_probabilities_normalize():
    """Interpolated KN must be a proper distribution: for a fixed w1,
    sum over the observed-vocabulary continuation of P(w2|w1) with
    the continuation unigram restricted to observed types sums to 1
    when every w2 type is enumerated."""
    bgs = {("a", "b"): 3, ("a", "c"): 1, ("b", "a"): 2,
           ("c", "a"): 1, ("b", "c"): 1}
    cx = {}
    nf = {}
    npr = {}
    for (a, b), c in bgs.items():
        cx[a] = cx.get(a, 0) + c
        nf[a] = nf.get(a, 0) + 1
        npr[b] = npr.get(b, 0) + 1
    nt = float(len(bgs))
    vocab = {b for _, b in bgs}
    for w1 in cx:
        tot = sum((max(bgs.get((w1, w2), 0) - 0.75, 0.0) / cx[w1]
                   + (0.75 * nf[w1] / cx[w1]) * (npr[w2] / nt))
                  for w2 in vocab)
        # Pcont sums to sum(npr)/nt over the vocab = 1 by definition
        assert abs(tot - 1.0) < 1e-12, (w1, tot)


def test_mdct_roundtrip_rows(spark):
    """mm33's kernel: reconstruction segment sums equal the
    closed-form input sums (TDAC PR), spectral sums finite."""
    from nowdb_spark.operators.dsp import mdct_roundtrip_real
    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    out = mdct_roundtrip_real(ids).collect()
    assert out
    for r in out:
        did, f = r["doc_id"], r["frame"]
        h = did % 5 + 3
        if f < h - 2:
            seg = sum(((did * 7 + (18 * (f + 1) + i) * 13) % 2001)
                      - 1000 for i in range(18))
            assert r["recon_sum"] == round(float(seg), 3), r
        else:
            assert r["recon_sum"] is None
        assert r["spec_abs_sum"] >= abs(r["spec_sum"])
