"""Unit tests for corpus-curation operators — edge cases the
synthetic-documents differential can't reach (short docs, real PII
strings, split determinism under repartitioning)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from nowdb_spark.operators import corpus as C
from nowdb_spark.operators import textops as T
from tests.conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_word_ngrams_short_doc(spark):
    df = _docs(spark, ["one", "a b", "a b c d"])
    got = df.select(
        "doc_id",
        C.word_ngrams(T.words(F.col("text")), 3).alias("g")).collect()
    by_id = {r.doc_id: r.g for r in got}
    assert by_id[0] == []          # shorter than n -> empty, not [1,0] seq
    assert by_id[1] == []
    assert by_id[2] == ["a b c", "b c d"]


def test_repetition_stats_values(spark):
    df = _docs(spark, ["x x x x", "a b c d"])
    got = {r.doc_id: r for r in C.repetition_stats(df).collect()}
    r0 = got[0]
    assert r0.n_words == 4 and r0.n_bigrams == 3
    assert r0.dup_word_frac == 0.75          # 1 distinct of 4
    assert r0.dup_bigram_frac > 0.6          # 'x x' three times
    assert r0.top_bigram_frac == 1.0
    r1 = got[1]
    assert r1.dup_word_frac == 0.0 and r1.top_bigram_frac < 0.5


def test_pii_scan_masks_real_patterns(spark):
    df = _docs(spark, [
        "contact bob@example.com or 10.0.0.1 id 1234567",
        "nothing here",
    ])
    got = {r.doc_id: r for r in
           C.pii_scan(df, "text", "doc_id").collect()}
    r0 = got[0]
    assert (r0.n_email, r0.n_ipv4, r0.n_id_number) == (1, 1, 1)
    assert "bob@example.com" not in r0.masked
    assert "10.0.0.1" not in r0.masked
    assert r0.masked.count(C.PII_MASK) == 3
    r1 = got[1]
    assert (r1.n_email, r1.n_ipv4, r1.n_id_number) == (0, 0, 0)
    assert r1.masked == "nothing here"


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in C.with_split(df).collect()}
    b = {r.doc_id: r.split for r in
         C.with_split(df.repartition(7)).collect()}
    assert a == b                            # membership is row property
    frac = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.7 < frac < 0.9                  # ~80% train


def test_stratified_sample_exact_k(spark):
    df = (spark.range(100)
          .select(F.col("id").alias("doc_id"),
                  (F.col("id") % 4).cast("string").alias("src")))
    got = C.stratified_sample(df, "src", k=7).collect()
    per = {}
    for r in got:
        per.setdefault(r.src, []).append(r.doc_id)
    assert all(len(v) == 7 for v in per.values()) and len(per) == 4
    again = C.stratified_sample(df, "src", k=7).collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)


def test_contamination_counts(spark):
    train = _docs(spark, ["a b c d e f", "q r s t u v"])
    ev = _docs(spark, ["b c d e f g"])
    got = {r.doc_id: r.n_hit_grams
           for r in C.contamination(train, ev, n=5).collect()}
    # train doc 0 shares exactly one distinct 5-gram: 'b c d e f'
    assert got == {0: 1}


def test_clean_corpus_filters(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 2     # 20 words, en
    rows = [
        Row(doc_id=0, text=base.strip(), lang="en"),
        Row(doc_id=1, text=base.strip(), lang="en"),   # exact dup of 0
        Row(doc_id=2, text="short doc", lang="en"),    # too short
        Row(doc_id=3, text=base.strip() + " x", lang="fr"),  # wrong lang
        Row(doc_id=4, text="y " * 25, lang="en"),      # all-dup words
    ]
    df = spark.createDataFrame(rows)
    got = C.clean_corpus(df, min_words=10).select("doc_id").collect()
    assert sorted(r.doc_id for r in got) == [0]


def test_dsir_weights_match_python(spark):
    """importance_weights recomputed in pure python on a toy corpus:
    same hashed features, same smoothing, same log-ratio sum."""
    import hashlib
    import math

    rows = [(0, "aa bb cc", True), (1, "aa bb", True),
            (2, "xx yy zz", False), (3, "cc xx", False),
            (4, "aa cc aa", True)]
    B, alpha = 64, 1.0

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % B

    def feats(text):
        ws = text.split(" ")
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    n_raw, n_tgt = {}, {}
    for _, text, t in rows:
        for f in feats(text):
            b = bucket(f)
            n_raw[b] = n_raw.get(b, 0) + 1
            if t:
                n_tgt[b] = n_tgt.get(b, 0) + 1
    t_raw = sum(n_raw.values())
    t_tgt = sum(n_tgt.values())
    want = {}
    for did, text, _ in rows:
        s = 0.0
        for f in feats(text):
            b = bucket(f)
            s += (math.log((n_tgt.get(b, 0) + alpha) / (t_tgt + alpha * B))
                  - math.log((n_raw[b] + alpha) / (t_raw + alpha * B)))
        want[did] = round(s, 6)

    df = spark.createDataFrame(
        [(d, t, tg) for d, t, tg in rows],
        "doc_id long, text string, tgt boolean")
    got = {r["doc_id"]: r["score"] for r in
           C.importance_weights(df, F.col("tgt"), buckets=B).collect()}
    for did in want:
        assert abs(got[did] - want[did]) < 2e-6, (did, got[did], want[did])
    # the English-slice analog: target docs average above non-target
    tgt_avg = sum(got[d] for d, _, t in rows if t) / 3
    raw_avg = sum(got[d] for d, _, t in rows if not t) / 2
    assert tgt_avg > raw_avg


def test_dsir_arrow_matches_python(spark):
    """The Arrow backend recomputed in pure python with the SAME hash
    (pd.util.hash_array) — locks bucketing, target attribution,
    smoothing, and the per-doc segment sums."""
    import math

    import numpy as np
    import pandas as pd

    rows = [(0, "aa bb cc", True), (1, "aa bb", True),
            (2, "xx yy zz", False), (3, "cc xx", False),
            (4, "aa cc aa", True)]
    B, alpha = 64, 1.0

    def bucket(s):
        # int() BEFORE the modulo: numpy uint64 % python-int promotes
        # to float64 and quantizes the hash
        return int(pd.util.hash_array(
            np.asarray([s], dtype=object))[0]) % B

    def feats(text):
        ws = text.split(" ")
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    n_raw, n_tgt = {}, {}
    for _, text, t in rows:
        for f in feats(text):
            b = bucket(f)
            n_raw[b] = n_raw.get(b, 0) + 1
            if t:
                n_tgt[b] = n_tgt.get(b, 0) + 1
    t_raw, t_tgt = sum(n_raw.values()), sum(n_tgt.values())
    want = {}
    for did, text, _ in rows:
        s = sum(math.log((n_tgt.get(bucket(f), 0) + alpha)
                         / (t_tgt + alpha * B))
                - math.log((n_raw[bucket(f)] + alpha)
                           / (t_raw + alpha * B))
                for f in feats(text))
        want[did] = round(s, 6)

    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {r["doc_id"]: r["score"] for r in
           C.importance_weights(df, F.col("tgt"), buckets=B,
                                hash_fn="arrow").collect()}
    for did in want:
        assert abs(got[did] - want[did]) < 2e-6, (did, got[did], want[did])


def test_dsir_resample_exact_k_and_invariance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    r1 = C.importance_resample(docs, F.col("lang") == "en", k=50)
    assert r1.filter("selected").count() == 50
    r2 = C.importance_resample(docs.repartition(17),
                               F.col("lang") == "en", k=50)
    s1 = {r["doc_id"] for r in r1.filter("selected").collect()}
    s2 = {r["doc_id"] for r in r2.filter("selected").collect()}
    assert s1 == s2


def test_dsir_hash_backends_rank_similarly(spark):
    """xxhash64 buckets differ from md5's, so scores differ — but on
    a corpus whose target slice has a distinct vocabulary, both
    backends must steer selection the same way (the target docs score
    above the non-target ones)."""
    rows = ([(i, "alpha beta gamma delta", True) for i in range(10)]
            + [(i + 10, "zeta eta theta iota", False)
               for i in range(10)])
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, tgt boolean")
    for fn in ("md5", "xxhash64", "arrow"):
        got = {r["doc_id"]: r["score"] for r in
               C.importance_weights(df, F.col("tgt"), buckets=128,
                                    hash_fn=fn).collect()}
        assert min(got[d] for d in range(10)) > \
            max(got[d] for d in range(10, 20)), fn


def test_line_dedup_multiline(spark):
    # doc0 owns 'header' first; doc1 repeats it (dropped there) and
    # keeps its unique body; doc2 is pure boilerplate -> empty text;
    # blank lines always survive, even repeated ones
    df = _docs(spark, [
        "header\n\nbody zero",
        "header\n\nbody one",
        "header",
    ])
    got = {r.doc_id: r for r in C.line_dedup(df).collect()}
    assert got[0].text == "header\n\nbody zero"
    assert got[0].n_lines_kept == 3 and got[0].n_lines_dropped == 0
    assert got[1].text == "\nbody one"          # header dropped, blank kept
    assert got[1].n_lines_kept == 2 and got[1].n_lines_dropped == 1
    assert got[2].text == "" and got[2].n_lines_dropped == 1


def test_line_dedup_within_doc_repeat(spark):
    # a line repeated INSIDE one doc keeps only its first position
    df = _docs(spark, ["x\ny\nx"])
    got = C.line_dedup(df).collect()[0]
    assert got.text == "x\ny" and got.n_lines_dropped == 1


def test_domain_mix_quotas_and_determinism(spark):
    from pyspark.sql import Row
    rows = ([Row(doc_id=i, source="big") for i in range(16)]
            + [Row(doc_id=100 + i, source="small") for i in range(4)])
    df = spark.createDataFrame(rows)
    # alpha=0.5: weights 4:2 -> quotas floor(9*4/6)=6, floor(9*2/6)=3
    got = C.domain_mix_sample(df, total=9, alpha=0.5, seed=3)
    per = {r[0]: r[1] for r in
           got.groupBy("source").count().collect()}
    assert per == {"big": 6, "small": 3}
    # deterministic under repartitioning
    a = sorted(r.doc_id for r in got.collect())
    b = sorted(r.doc_id for r in
               C.domain_mix_sample(df.repartition(7), total=9,
                                   alpha=0.5, seed=3).collect())
    assert a == b
    # alpha=1 keeps natural proportions: floor(10*16/20)=8, floor(10*4/20)=2
    nat = {r[0]: r[1] for r in
           C.domain_mix_sample(df, total=10, alpha=1.0, seed=3)
           .groupBy("source").count().collect()}
    assert nat == {"big": 8, "small": 2}


def test_line_dedup_properties(spark):
    """Randomized-corpus invariants: (1) every non-blank line occurs
    at most once across the whole output, (2) kept+dropped == input
    line count per doc, (3) the operator is idempotent."""
    import random
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", ""]
    texts = ["\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 6)))
             for _ in range(30)]
    df = _docs(spark, texts)
    out = C.line_dedup(df)
    rows = out.collect()

    seen = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        n_in = len(texts[r.doc_id].split("\n"))
        assert r.n_lines_kept + r.n_lines_dropped == n_in, r
        for ln in r.text.split("\n") if r.text != "" else []:
            if ln.strip():
                assert ln not in seen, (ln, r.doc_id, seen[ln])
                seen[ln] = r.doc_id

    again = {r.doc_id: r for r in C.line_dedup(
        out.select("doc_id", "text")).collect()}
    for r in rows:
        assert again[r.doc_id].text == r.text
        assert again[r.doc_id].n_lines_dropped == 0 or r.text == "", r


def test_chat_spans_offsets_index_into_rendering(spark):
    from nowdb_spark.operators.textops import chat_spans, render_chatml
    from pyspark.sql import functions as F

    rows = [(1, [("system", "be brief"), ("user", "hi there"),
                 ("assistant", "hello!"), ("user", "bye"),
                 ("assistant", "ok")]),
            (2, [("user", "solo")])]
    df = spark.createDataFrame(
        rows, "doc_id long, turns array<struct<role string, "
              "content string>>")
    spans = chat_spans(df).collect()
    rendered = {r["doc_id"]: r["rendered"] for r in df.select(
        "doc_id", render_chatml(F.col("turns")).alias("rendered"))
        .collect()}
    # every span must slice out exactly its turn's content
    turns = {did: t for did, t in rows}
    for r in spans:
        content = turns[r["doc_id"]][r["turn"]][1]
        role = turns[r["doc_id"]][r["turn"]][0]
        assert r["role"] == role
        assert r["is_target"] == (1 if role == "assistant" else 0)
        s = rendered[r["doc_id"]]
        assert s[r["span_start"]:r["span_end"]] == content
        assert r["rendered_len"] == len(s)
    # template framing is ChatML-shaped
    assert rendered[2] == "<|im_start|>user\nsolo<|im_end|>\n"


def test_fix_mojibake_roundtrip_and_guards(spark):
    import random

    from pyspark.sql import functions as F

    from nowdb_spark.operators.textops import fix_mojibake, is_mojibake

    rng = random.Random(42)
    alphabet = ("abc XYZ 09" "éüñøàçß" "中文字" "…—")
    cases = []
    for i in range(60):
        clean = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 30)))
        moji = clean.encode("utf-8").decode("latin-1")
        expect_fix = moji != clean   # pure-ASCII strings are a no-op
        cases.append((i, moji, clean, 1 if expect_fix else 0))
    # guard cases: ASCII and genuine latin-1-style text stay put
    cases.append((1000, "just ascii", "just ascii", 0))
    cases.append((1001, "SÃO PAULO", "SÃO PAULO", 0))
    cases.append((1002, "naïve café", "naïve café", 0))

    df = spark.createDataFrame([(i, m) for i, m, _, _ in cases],
                               "id long, t string")
    out = {r["id"]: (r["f"], r["m"]) for r in df.select(
        "id", fix_mojibake(F.col("t")).alias("f"),
        is_mojibake(F.col("t")).alias("m")).collect()}
    for i, _, expect, flag in cases:
        got, got_flag = out[i]
        assert got == expect, (i, got, expect)
        assert got_flag == flag, (i, got_flag, flag)
