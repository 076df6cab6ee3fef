"""Model-based quality filter: the distributed GD must match a pure
python reference step-for-step, learn a separable corpus, and be
layout-independent."""

from pyspark.sql import functions as F

from nowdb_spark.operators import quality as Q


def _corpus(spark):
    rows = ([(i, "alpha beta gamma delta epsilon", True)
             for i in range(20)]
            + [(i + 20, "zeta eta theta iota kappa", False)
               for i in range(20)])
    return spark.createDataFrame(
        rows, "doc_id long, text string, good boolean")


def test_gd_matches_python_reference(spark):
    import hashlib
    import math

    B, T, lr = 32, 3, 0.5
    rows = [(0, "aa bb cc", 1.0), (1, "aa bb", 1.0),
            (2, "xx yy zz", 0.0), (3, "cc xx", 0.0)]

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % B

    def feats(text):
        ws = text.split(" ")
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    docs = [(d, [bucket(f) for f in feats(t)], y) for d, t, y in rows]
    w, bias, n = [0.0] * B, 0.0, len(rows)
    for _ in range(T):
        grad, gb = [0.0] * B, 0.0
        for _, bs, y in docs:
            m = bias + sum(w[b] for b in bs)
            r = 1.0 / (1.0 + math.exp(-m)) - y
            for b in bs:
                grad[b] += r
            gb += r
        w = [w[b] - lr / n * grad[b] for b in range(B)]
        bias -= lr / n * gb
    want = {}
    for d, bs, _ in docs:
        m = bias + sum(w[b] for b in bs)
        want[d] = round(1.0 / (1.0 + math.exp(-m)), 6)

    df = spark.createDataFrame(
        [(d, t, y > 0) for d, t, y in rows],
        "doc_id long, text string, good boolean")
    wg, bg = Q.train_quality_classifier(df, F.col("good"), buckets=B,
                                        iters=T, lr=lr)
    got = {r["doc_id"]: r["score"]
           for r in Q.quality_score(df, wg, bg, buckets=B).collect()}
    for d in want:
        assert abs(got[d] - want[d]) < 2e-6, (d, got[d], want[d])


def test_classifier_separates(spark):
    df = _corpus(spark)
    w, b = Q.train_quality_classifier(df, F.col("good"), buckets=64,
                                      iters=20, lr=1.0)
    sc = {r["doc_id"]: r for r in Q.quality_score(df, w, b).collect()}
    assert min(sc[i]["score"] for i in range(20)) > \
        max(sc[i]["score"] for i in range(20, 40))
    assert all(sc[i]["keep"] for i in range(20))
    assert not any(sc[i]["keep"] for i in range(20, 40))


def test_training_partition_invariant(spark):
    """Gradient sums are distributed float additions, so layouts can
    differ at ulp level (like any groupBy(sum) of doubles) — but
    nothing beyond: weights agree far inside the gate's round-6
    tolerance."""
    df = _corpus(spark)
    w1, b1 = Q.train_quality_classifier(df, F.col("good"), iters=3)
    w2, b2 = Q.train_quality_classifier(df.repartition(7),
                                        F.col("good"), iters=3)
    assert abs(b1 - b2) < 1e-9
    assert all(abs(a - b) < 1e-9 for a, b in zip(w1, w2))


def test_perplexity_matches_python(spark):
    import hashlib
    import math

    B = 128
    texts = {0: "aa bb aa bb cc", 1: "aa", 2: "zz qq"}
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % B

    uni, bi = {}, {}
    for t in texts.values():
        ws = t.split(" ")
        for w in ws:
            uni[bucket(w)] = uni.get(bucket(w), 0) + 1
        for g in [f"{a} {b}" for a, b in zip(ws, ws[1:])]:
            bi[bucket(g)] = bi.get(bucket(g), 0) + 1
    want = {}
    for d, t in texts.items():
        ws = t.split(" ")
        if len(ws) < 2:
            want[d] = None
            continue
        lp = sum(math.log((bi[bucket(f"{a} {b}")] + 1.0)
                          / (uni[bucket(a)] + 1.0 * B))
                 for a, b in zip(ws, ws[1:]))
        want[d] = round(math.exp(-lp / (len(ws) - 1)), 6)

    u = [uni.get(b, 0) for b in range(B)]
    g = [bi.get(b, 0) for b in range(B)]
    got = {r["doc_id"]: r["ppl"]
           for r in Q.perplexity(df, u, g).collect()}
    for d in want:
        if want[d] is None:
            assert got[d] is None
        else:
            assert abs(got[d] - want[d]) < 2e-6, (d, got[d], want[d])


def test_lm_training_matches_operator(spark):
    """train_bigram_lm's distributed counts equal a python recount."""
    import hashlib
    B = 64
    df = spark.createDataFrame(
        [(0, "x y z"), (1, "x y"), (2, "w")],
        "doc_id long, text string")
    uni, bi = Q.train_bigram_lm(df, buckets=B)

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % B
    wu, wb = [0] * B, [0] * B
    for t in ("x y z", "x y", "w"):
        ws = t.split(" ")
        for w in ws:
            wu[bucket(w)] += 1
        for g in [f"{a} {b}" for a, b in zip(ws, ws[1:])]:
            wb[bucket(g)] += 1
    assert uni == wu and bi == wb


def test_bm25_semantics(spark):
    """More query-term occurrences -> higher score (same doc length);
    docs without any query term score 0; shorter matching docs beat
    longer ones with the same tf (length normalization)."""
    from nowdb_spark.operators import textops as TX
    df = spark.createDataFrame(
        [(0, "spark a b c"), (1, "spark spark b c"),
         (2, "x y z w"), (3, "spark a b c d e f g h")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in
           TX.bm25_scores(df, ["spark"]).collect()}
    assert got[1] > got[0] > got[3] > got[2] == 0.0


def test_gopher_rules_each_rule_fires(spark):
    from nowdb_spark.operators.textops import gopher_rules

    good = "the quick brown fox jumps over a lazy dog near the riverbank"
    df = spark.createDataFrame(
        [(1, good),                                    # passes all
         (2, "a a a a a a"),                           # mean_wl < 3
         (3, "one two"),                               # too few words
         (4, good + "\n### ###"),                      # fails? ratio 2/13
         (5, good + " " + "# " * 6),                   # symbol ratio >= 0.1
         (6, good + "\nread more..."),                 # 1/2 lines ellipsis
         (7, "quick brown fox jumps over lazy dog"),   # no stopwords
         (8, good + "\n• x\n• y\n- z")],               # 3/4 bullets, passes
        "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert got[1].keep is True
    assert got[2].keep is False and got[2].mean_word_len < 3
    assert got[3].keep is False and got[3].n_words == 2
    assert got[5].keep is False and got[5].symbol_ratio >= 0.1
    assert got[6].keep is False and got[6].ellipsis_frac == 0.5
    assert got[7].keep is False and got[7].n_stopwords < 2
    assert got[8].keep is True and got[8].bullet_frac == 0.75
    # plan stays JVM-side
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_aho_corasick_matches_bruteforce(spark):
    import random

    from pyspark.sql import functions as F

    from nowdb_spark.operators.textops import multi_pattern_counts

    pats = ["he", "she", "his", "hers", "ab", "aba", "bab"]
    rng = random.Random(7)
    texts = ["ushers", "ababab", "", "hishe",
             *("".join(rng.choice("abhers ") for _ in range(60))
               for _ in range(20))]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {(r["doc_id"], r["pattern"]): r["n_matches"]
           for r in multi_pattern_counts(df, pats).collect()}
    want = {}
    for i, t in enumerate(texts):
        for p in pats:
            c = sum(t[j:j + len(p)] == p for j in range(len(t)))
            if c:
                want[(i, p)] = c
    assert got == want
