"""BPE tokenizer: trainer modes must agree with each other and with
the pure-python reference; segmentation must match Sennrich's apply
loop including run-of-same-symbol edge cases."""

from pyspark.sql import functions as F

from nowdb_spark.operators import tokenize as TK


def _toy(spark):
    return spark.createDataFrame(
        [(0, "low lower lowest"), (1, "new newer newest"),
         (2, "low low new aaaaa"), (3, "aaaaa aaa lower")],
        "doc_id long, text string")


def test_train_modes_agree(spark):
    docs = _toy(spark)
    drv = TK.bpe_train(docs, n_merges=10, mode="driver")
    dist = TK.bpe_train(docs, n_merges=10, mode="distributed")
    assert [tuple(m) for m in drv] == [tuple(m) for m in dist]
    # and with the python reference over the same word counts
    wf = {r["word"]: r["freq"]
          for r in TK.word_freq(docs).collect()}
    assert drv == TK.train_merges_py(wf, 10)


def test_train_partition_invariance(spark):
    docs = _toy(spark)
    a = TK.bpe_train(docs, n_merges=6, mode="distributed")
    b = TK.bpe_train(docs.repartition(7), n_merges=6,
                     mode="distributed")
    assert [tuple(m) for m in a] == [tuple(m) for m in b]


def test_merge_word_runs():
    """Runs of the merged pair: one left-to-right non-overlapping
    pass (the case where naive single-space string replace
    diverges)."""
    assert TK.merge_word(tuple("aaaaa"), "a", "a") == ("aa", "aa", "a")
    assert TK.merge_word(("aa", "aa", "a"), "aa", "aa") == ("aaaa", "a")
    assert TK.merge_word(tuple("abab"), "a", "b") == ("ab", "ab")


def test_segment_matches_reference(spark):
    docs = _toy(spark)
    merges = TK.bpe_train(docs, n_merges=8)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in TK.bpe_segment(docs, merges).collect()}
    for row in docs.collect():
        want = []
        for w in row["text"].split(" "):
            if w:
                want.extend(TK.segment_word(w, ranks))
        assert got[row["doc_id"]] == (want, len(want))


def test_segment_empty_merges_is_chars(spark):
    docs = spark.createDataFrame([(0, "ab c")],
                                 "doc_id long, text string")
    r = TK.bpe_segment(docs, []).first()
    assert r["tokens"] == ["a", "b", "c"] and r["n_tokens"] == 3


def test_round_trip_preserves_text(spark):
    """Concatenating tokens word-wise reproduces the input — BPE is
    a segmentation, never lossy."""
    docs = _toy(spark)
    merges = TK.bpe_train(docs, n_merges=8)
    seg = TK.bpe_segment(docs, merges)
    joined = seg.join(docs, "doc_id").select(
        "doc_id",
        (F.array_join("tokens", "")
         == F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .alias("ok"))
    assert all(r["ok"] for r in joined.collect())


def test_vocab_and_encode_roundtrip(spark):
    docs = _toy(spark)
    merges = TK.bpe_train(docs, n_merges=8)
    vocab = TK.bpe_vocab(merges, TK.base_chars(docs))
    # ids 0..n_base-1 are the sorted alphabet, then merges in order
    n_base = len(TK.base_chars(docs))
    assert vocab[:n_base] == sorted(set("".join(
        r["text"].replace(" ", "") for r in docs.collect())))
    enc = {r["doc_id"]: r["token_ids"]
           for r in TK.bpe_encode(docs, merges, vocab).collect()}
    seg = {r["doc_id"]: r["tokens"]
           for r in TK.bpe_segment(docs, merges).collect()}
    inv = {i: t for i, t in enumerate(vocab)}
    for did, ids in enc.items():
        assert all(i >= 0 for i in ids)
        assert [inv[i] for i in ids] == seg[did]


def test_encode_unknown_token_is_minus_one(spark):
    train = _toy(spark)
    merges = TK.bpe_train(train, n_merges=4)
    vocab = TK.bpe_vocab(merges, TK.base_chars(train))
    other = spark.createDataFrame([(0, "l0w")],
                                  "doc_id long, text string")
    ids = TK.bpe_encode(other, merges, vocab).first()["token_ids"]
    assert -1 in ids                      # '0' never seen in training
