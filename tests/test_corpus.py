"""Unit tests for corpus-curation operators — edge cases the
synthetic-documents differential can't reach (short docs, real PII
strings, split determinism under repartitioning)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from nowdb_spark.operators import corpus as C
from nowdb_spark.operators import textops as T


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
