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


# ---------------------------------------------------------------- unigram LM
def test_viterbi_word_objective_and_ties():
    # 'abab': {ab:5} available -> 2 pieces beat 4 chars
    scores = {"a": 9, "b": 7, "ab": 5, "ba": 5}
    assert TK.viterbi_word("abab", scores) == ["ab", "ab"]
    # tie on piece count (ab+a vs a+ba, both 2 pieces, both sum 14):
    # ascending-i strict-< keeps the SMALLEST split point -> a + ba
    assert TK.viterbi_word("aba", scores) == ["a", "ba"]
    # count tiebreak within equal piece count: higher total frequency
    assert TK.viterbi_word("ab", {"a": 9, "b": 9, "ab": 1}) == ["ab"]
    # unknown character -> whole word as single unknown token
    assert TK.viterbi_word("axb", scores) == ["axb"]
    # loglik mode prefers the same 2-piece split here
    assert TK.viterbi_word("abab", scores,
                           objective="loglik") == ["ab", "ab"]


def test_unigram_train_py_hand_example():
    freqs = {"abab": 10, "ab": 5, "cd": 3}
    vocab = TK.unigram_train_py(freqs, max_piece_len=2,
                                vocab_size=4, min_count=2, iters=1)
    # chars always covered
    for c in "abcd":
        assert c in vocab
    # 'ab' occurs 2*10+5 = 25 times in the seed; after EM every word
    # segments through it, so usage keeps it on top
    assert vocab["ab"] == 25
    assert TK.viterbi_word("abab", vocab, 2) == ["ab", "ab"]
    # 'ba' seeded at 10 but never used by a best path -> pruned
    assert "ba" not in vocab


def test_unigram_spark_matches_python(spark):
    docs = _toy(spark)
    vocab = TK.unigram_train(docs, max_piece_len=3, vocab_size=16,
                             min_count=2, iters=2)
    wf = {r["word"]: r["freq"] for r in TK.word_freq(docs).collect()}
    assert vocab == TK.unigram_train_py(wf, 3, 16, 2, iters=2)
    got = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in TK.unigram_segment(docs, vocab, 3).collect()}
    for row in docs.collect():
        want = []
        for w in row["text"].split(" "):
            if w:
                want.extend(TK.viterbi_word(w, vocab, 3))
        assert got[row["doc_id"]] == (want, len(want))


def test_unigram_ids_dense_and_unknown(spark):
    docs = _toy(spark)
    vocab = TK.unigram_train(docs, max_piece_len=3, vocab_size=16,
                             min_count=2)
    ids = TK.unigram_vocab_ids(vocab)
    assert sorted(ids.values()) == list(range(len(vocab)))
    # ranked by count desc then piece asc
    ranked = sorted(vocab.items(), key=lambda pc: (-pc[1], pc[0]))
    assert [ids[p] for p, _ in ranked] == list(range(len(vocab)))
    out = TK.unigram_segment(
        spark.createDataFrame([(0, "low xyzzy")],
                              "doc_id long, text string"),
        vocab, 3, ids=ids).collect()[0]
    assert -1 in out["token_ids"]           # unknown char word
    assert out["n_tokens"] == len(out["token_ids"])
    known = [i for i in out["token_ids"] if i >= 0]
    assert known and all(0 <= i < len(vocab) for i in known)
