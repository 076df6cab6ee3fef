"""Byte-pair-encoding tokenization for training-data pipelines.

BPE (Sennrich et al. 2016, arXiv:1508.07909) learned from the corpus
itself — the step after cleaning/dedup that turns documents into the
token ids a trainer consumes, and the honest version of tx04's
"BPE-ish regex" token counting.

Division of labor at 100 TB:
  * word counting (`word_freq`) — the only pass over the full corpus;
    one groupBy(word) shuffle with map-side partials.
  * merge learning (`bpe_train`) — runs on the WORD-FREQUENCY table,
    whose size is the vocabulary (≪ corpus, and `top_words` caps it
    like every production tokenizer does). Driver mode collects that
    bounded table and loops in Python (what HuggingFace/SentencePiece
    do after their own distributed-ish counting); distributed mode
    keeps the vocab as a DataFrame and runs one pair-count
    aggregation per merge round — unbounded vocab, n_merges small
    jobs. Both modes produce IDENTICAL merges (same tie-breaks).
  * segmentation (`bpe_segment`) — embarrassingly parallel map over
    docs; the merge ranks broadcast as a plain dict inside an
    Arrow-batched pandas UDF (the per-word min-rank merge loop is a
    data-dependent recurrence with no Column expression, same escape
    hatch as EWMA).

Merge semantics (all paths agree, including the gate's DuckDB
oracle):
  * a word's initial symbols are its characters;
  * pair counts include every adjacent occurrence (overlaps count),
    weighted by word frequency;
  * the best pair = highest count, ties → lexicographically smallest
    (a, b);
  * applying a merge rewrites every non-overlapping occurrence
    left-to-right in one pass;
  * segmentation repeatedly merges the present pair with the LOWEST
    rank until none applies (Sennrich's apply loop).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one full-corpus shuffle."""
    return (df.select(F.explode(F.split(F.col(text_col), " "))
                      .alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


# ---------------------------------------------------------------- python core
def merge_word(syms: tuple, a: str, b: str) -> tuple:
    """One left-to-right non-overlapping merge pass."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_merges_py(freqs: dict, n_merges: int) -> list:
    """Reference/driver BPE trainer over a {word: freq} dict."""
    vocab = {tuple(w): f for w, f in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {merge_word(s, *best): f for s, f in vocab.items()}
    return merges


def segment_word(word: str, ranks: dict) -> list:
    """Sennrich apply: repeatedly merge the lowest-rank present pair."""
    syms = tuple(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        syms = merge_word(syms, *best)
    return list(syms)


# ---------------------------------------------------------------- train
def _merge_pair_col(arr: Column, a: str, b: str) -> Column:
    """Column fold replaying merge_word: left fold that concatenates
    the accumulator's last element with the current symbol when they
    spell (a, b). Equivalent to the two-pointer pass because a merged
    symbol a+b can never equal `a` again within the same pass (b is
    non-empty)."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (s == lb),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.concat(la, lb)))
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(df: DataFrame, n_merges: int = 100,
              text_col: str = "text", mode: str = "driver",
              top_words: int = 1_000_000) -> list:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    ``mode="driver"``: collect the word-frequency table (capped at the
    ``top_words`` most frequent — the standard vocabulary bound; the
    cap is deterministic: freq desc, word asc) and loop in Python.
    ``mode="distributed"``: the vocab stays a DataFrame; each round
    runs one pair-count aggregation + a 1-row argmax collect + a
    map-side merge rewrite, localCheckpointed to keep lineage flat.
    Use it when the vocabulary itself cannot sit on the driver.
    """
    wf = word_freq(df, text_col)
    if mode == "driver":
        rows = (wf.orderBy(F.col("freq").desc(), F.col("word"))
                .limit(top_words).collect())
        return train_merges_py({r["word"]: r["freq"] for r in rows},
                               n_merges)
    if mode != "distributed":
        raise ValueError(f"bpe_train: unknown mode {mode!r}")

    vocab = wf.select(
        F.split(F.col("word"), "").alias("syms"), "freq")
    vocab = vocab.localCheckpoint(eager=True)
    merges: list = []
    for i in range(n_merges):
        pairs = (vocab.select(
            "freq",
            F.explode(F.when(
                F.size("syms") >= 2,
                F.transform(F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda j: F.struct(
                                F.element_at("syms", j).alias("a"),
                                F.element_at("syms", j + 1).alias("b"))))
                .otherwise(F.array().cast(
                    "array<struct<a:string,b:string>>"))).alias("p"))
            .groupBy("p.a", "p.b").agg(F.sum("freq").alias("n")))
        best = (pairs.orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
                .limit(1).collect())
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_pair_col(F.col("syms"), a, b).alias("syms"), "freq")
        # flatten lineage: each round otherwise nests another fold
        vocab = vocab.localCheckpoint(eager=True)
    return merges


# ---------------------------------------------------------------- apply
def bpe_segment(df: DataFrame, merges: list, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Tokenize each document with a learned merge list.

    Returns (id, tokens array<string>, n_tokens). The ranks dict is
    captured in the UDF closure (broadcast once per executor by Spark)
    — map-side only, no shuffle, scales with partition count.
    """
    import pandas as pd
    globals().setdefault("pd", pd)   # type-hint resolution for the udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def run(text):
            out = []
            for w in text.split(" "):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = segment_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out
        return texts.map(run)

    return (df.select(F.col(id_col), seg(F.col(text_col)).alias("tokens"))
            .withColumn("n_tokens", F.size("tokens").cast("long")))


def bpe_vocab(merges: list, base_chars: list) -> list:
    """The tokenizer's vocabulary: sorted base characters first (ids
    0..n_base-1), then one entry per merge in rank order — the id
    layout every BPE implementation ships. Pure function of
    (merges, base alphabet); no data pass."""
    seen = set()
    vocab = []
    for c in sorted(base_chars):
        if c not in seen:
            seen.add(c)
            vocab.append(c)
    for a, b in merges:
        tok = a + b
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)
    return vocab


def base_chars(df: DataFrame, text_col: str = "text") -> list:
    """Distinct characters of the corpus (space excluded) — one
    exploded distinct, bounded by the alphabet."""
    return [r["c"] for r in
            (df.select(F.explode(F.split(F.col(text_col), ""))
                       .alias("c"))
             .filter(F.col("c") != " ")
             .distinct().collect())]


def bpe_encode(df: DataFrame, merges: list, vocab: list,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Segment AND map to vocabulary ids in one Arrow pass — the
    trainer-ready output (id, token_ids array<int>, n_tokens).
    Unknown tokens (characters absent from the vocab) map to -1;
    with a vocab built by bpe_vocab over the training corpus's own
    base_chars, unknowns only arise on out-of-corpus text."""
    import pandas as pd
    globals().setdefault("pd", pd)

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    tok2id = {t: i for i, t in enumerate(vocab)}

    @F.pandas_udf("array<int>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def run(text):
            out = []
            for w in text.split(" "):
                if not w:
                    continue
                ids = cache.get(w)
                if ids is None:
                    ids = [tok2id.get(t, -1)
                           for t in segment_word(w, ranks)]
                    cache[w] = ids
                out.extend(ids)
            return out
        return texts.map(run)

    return (df.select(F.col(id_col),
                      enc(F.col(text_col)).alias("token_ids"))
            .withColumn("n_tokens", F.size("token_ids").cast("long")))


# ================================================================ unigram LM
# SentencePiece-style unigram tokenizer (Kudo 2018, arXiv:1804.10959)
# with an INTEGER Viterbi objective so the whole training loop —
# substring seeding, EM re-estimation, final segmentation — replays
# value-exact in the gate's DuckDB oracle. The float log-likelihood
# objective would hinge on libm ln() ulps that differ across engines
# (the same reason ts07 pins alpha off dyadic values); the integer
# stand-in ranks segmentations by (fewest pieces, then highest total
# piece frequency), which is the longest-match bias every production
# unigram/WordPiece tokenizer converges toward. `objective="loglik"`
# in viterbi_word gives the real -log p DP for in-Python use.
#
# Division of labor at 100 TB (same split as BPE above):
#   * word counting — the only full-corpus pass (word_freq).
#   * seeding + EM — on the word-frequency table, capped at
#     `top_words` (vocabulary-scale, ≪ corpus). Driver mode loops in
#     Python over that bounded table, exactly what SentencePiece does
#     after its own counting pass.
#   * segmentation — embarrassingly parallel Arrow-batched map; the
#     final vocab broadcasts as a plain dict in the UDF closure.

_UNI_K = 10 ** 12    # piece-count dominator: counts stay far below
#                      this, so K·n_pieces − Σcount orders first by
#                      piece count, then by total frequency; 8-piece
#                      paths stay far inside int64


def viterbi_word(word: str, scores: dict, max_piece_len: int = 4,
                 objective: str = "count") -> list:
    """Min-cost segmentation of one word over `scores` (piece→count).

    objective="count": integer cost K − count(piece) per piece —
    smallest-i tie-break (iterate i ascending, strict <), mirrored
    exactly by the oracle's row_number ORDER BY cost, pos.
    objective="loglik": classic −ln(count/total) Viterbi (floats; not
    used by the gate).
    A word with no path (a character absent from scores) comes back
    whole, as a single unknown token.
    """
    import math
    n = len(word)
    if objective == "loglik":
        tot = sum(scores.values()) or 1

        def cost_of(c):
            return -math.log(c / tot)
    else:
        def cost_of(c):
            return _UNI_K - c
    best: list = [None] * (n + 1)
    back: list = [None] * (n + 1)
    best[0] = 0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            if best[i] is None:
                continue
            c = scores.get(word[i:j])
            if c is None:
                continue
            cand = best[i] + cost_of(c)
            if best[j] is None or cand < best[j]:
                best[j], back[j] = cand, i
    if best[n] is None:
        return [word]
    out, j = [], n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def _substring_counts_py(freqs: dict, max_piece_len: int) -> dict:
    """Every substring occurrence (overlaps counted) weighted by word
    frequency — the unigram seed statistics."""
    counts: dict = {}
    for w, f in freqs.items():
        n = len(w)
        for i in range(n):
            for k in range(1, min(max_piece_len, n - i) + 1):
                p = w[i:i + k]
                counts[p] = counts.get(p, 0) + f
    return counts


def _prune_vocab_py(counts: dict, chars: dict, vocab_size: int,
                    min_count: int) -> dict:
    """Model update shared by seeding and every EM round: ALL single
    characters survive (coverage guarantee — a char never in any best
    path carries count 0), multi-char pieces need count ≥ min_count
    and a slot in the top `vocab_size` by (count desc, piece asc)."""
    vocab = {c: counts.get(c, 0) for c in chars}
    multi = sorted(((p, c) for p, c in counts.items()
                    if len(p) >= 2 and c >= min_count),
                   key=lambda pc: (-pc[1], pc[0]))[:vocab_size]
    vocab.update(dict(multi))
    return vocab


def unigram_train_py(freqs: dict, max_piece_len: int = 4,
                     vocab_size: int = 64, min_count: int = 2,
                     iters: int = 1) -> dict:
    """Reference/driver unigram trainer over a {word: freq} dict.

    Seed = substring counts; each EM round Viterbi-segments every
    word under the current model (E) and re-estimates piece counts
    from usage, weighted by word frequency (M). Deterministic —
    integer scores, total tie-breaks — so the DuckDB oracle replays
    it CTE-for-CTE."""
    seed = _substring_counts_py(freqs, max_piece_len)
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    vocab = _prune_vocab_py(seed, chars, vocab_size, min_count)
    for _ in range(iters):
        usage: dict = {}
        for w, f in freqs.items():
            for p in viterbi_word(w, vocab, max_piece_len):
                usage[p] = usage.get(p, 0) + f
        vocab = _prune_vocab_py(usage, chars, vocab_size, min_count)
    return vocab


def unigram_train(df: DataFrame, max_piece_len: int = 4,
                  vocab_size: int = 64, min_count: int = 2,
                  iters: int = 1, text_col: str = "text",
                  top_words: int = 1_000_000) -> dict:
    """Learn a unigram vocabulary (piece → count) from the corpus:
    one word_freq pass, then the bounded-table Python EM loop (cap
    deterministic: freq desc, word asc — same policy as bpe_train)."""
    rows = (word_freq(df, text_col)
            .orderBy(F.col("freq").desc(), F.col("word"))
            .limit(top_words).collect())
    return unigram_train_py({r["word"]: r["freq"] for r in rows},
                            max_piece_len, vocab_size, min_count,
                            iters)


def unigram_vocab_ids(vocab: dict) -> dict:
    """piece → id, ids dense in (count desc, piece asc) order — the
    layout the oracle's row_number reproduces."""
    ranked = sorted(vocab.items(), key=lambda pc: (-pc[1], pc[0]))
    return {p: i for i, (p, _) in enumerate(ranked)}


def unigram_segment(df: DataFrame, vocab: dict,
                    max_piece_len: int = 4, text_col: str = "text",
                    id_col: str = "doc_id",
                    ids: dict | None = None) -> DataFrame:
    """Tokenize each document with a trained unigram vocab.

    Returns (id, tokens array<string>, n_tokens) — or token_ids when
    `ids` (from unigram_vocab_ids; unknowns → -1) is given. Map-side
    only: the vocab rides the UDF closure, per-word DP results are
    memoized per batch."""
    import pandas as pd
    globals().setdefault("pd", pd)

    if ids is not None:
        @F.pandas_udf("array<int>")
        def seg(texts: pd.Series) -> pd.Series:
            cache: dict = {}

            def run(text):
                out = []
                for w in text.split(" "):
                    if not w:
                        continue
                    toks = cache.get(w)
                    if toks is None:
                        toks = [ids.get(p, -1) for p in
                                viterbi_word(w, vocab, max_piece_len)]
                        cache[w] = toks
                    out.extend(toks)
                return out
            return texts.map(run)

        out_col = "token_ids"
    else:
        @F.pandas_udf("array<string>")
        def seg(texts: pd.Series) -> pd.Series:
            cache: dict = {}

            def run(text):
                out = []
                for w in text.split(" "):
                    if not w:
                        continue
                    toks = cache.get(w)
                    if toks is None:
                        toks = viterbi_word(w, vocab, max_piece_len)
                        cache[w] = toks
                    out.extend(toks)
                return out
            return texts.map(run)

        out_col = "tokens"

    return (df.select(F.col(id_col), seg(F.col(text_col)).alias(out_col))
            .withColumn("n_tokens", F.size(out_col).cast("long")))


def unigram_vocab(df: DataFrame, text_col: str = "text",
                  max_len: int = 4, prefix_chars: int = 64,
                  min_count: int = 2,
                  max_vocab: int | None = None) -> dict:
    """Corpus-derived unigram-LM vocabulary (the inference half of
    SentencePiece's unigram model, Kudo 2018): candidate tokens are
    all character n-grams of length 1..max_len over each document's
    first ``prefix_chars`` characters; a candidate survives when its
    corpus count ≥ min_count OR it is a single character (so Viterbi
    segmentation is always feasible). Token log-prob = ln(count/Z)
    over the surviving set, rounded at 1e-6 — the rounding is the
    cross-engine determinism contract the Viterbi fold relies on.

    Returns a {token: logp} dict — a MODEL-scale table (like k-means
    centroids or BPE merges): bounded by min_count and optionally
    max_vocab (top-count, ties by token), independent of corpus size.
    Training itself is two corpus aggregates (explode + count)."""
    pre = F.substring(F.col(text_col), 1, prefix_chars)
    toks = (df.select(pre.alias("s"))
            .select(F.explode(F.flatten(F.transform(
                F.sequence(F.lit(1), F.lit(max_len)),
                lambda ln: F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.length("s")),
                        lambda i: F.col("s").substr(i, ln)),
                    lambda t: F.length(t) == ln)))).alias("tok")))
    vc = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
          .filter((F.col("c") >= min_count)
                  | (F.length("tok") == 1)))
    if max_vocab is not None:
        w = Window.orderBy(F.desc("c"), F.asc("tok"))
        vc = (vc.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= max_vocab).drop("rk"))
    rows = vc.collect()
    z = float(sum(r["c"] for r in rows))
    return {r["tok"]: round(math.log(r["c"] / z), 6) for r in rows}


def unigram_lm_segment(df: DataFrame, vocab: dict,
                       text_col: str = "text", id_col: str = "doc_id",
                       max_len: int = 4,
                       prefix_chars: int = 64) -> DataFrame:
    """Viterbi segmentation under the unigram LM: per document (its
    first ``prefix_chars`` characters), dp[i] = best cumulative
    log-prob of any tokenization of the prefix ending at i, maximized
    over last-token lengths 1..max_len. Deterministic tie-breaks —
    higher score, then fewer tokens, then shorter last token — and
    every dp value re-rounded at 1e-6 per step, so an unrolled SQL
    recurrence replays the fold comparison-for-comparison. Emits
    (doc_id, n_chars, n_tokens, score).

    Scale shape: the vocab dict is a broadcast model table (see
    unigram_vocab); segmentation is a narrow Arrow kernel, zero
    shuffle, O(prefix_chars·max_len) per document."""
    schema = (f"{id_col} long, n_chars long, n_tokens long, "
              "score double")
    NEG = float("-inf")

    def kernel(batches):
        import pandas as _pd

        def seg(s: str):
            s = s[:prefix_chars]
            n = len(s)
            if n == 0:
                return 0, 0, 0.0
            dp = [0.0] + [NEG] * n
            nt = [0] + [0] * n
            for i in range(1, n + 1):
                best = NEG
                bnt = 0
                found = False
                for ln in range(1, min(max_len, i) + 1):
                    lp = vocab.get(s[i - ln:i])
                    if lp is None or dp[i - ln] == NEG:
                        continue
                    sc = round(dp[i - ln] + lp, 6)
                    cnt = nt[i - ln] + 1
                    if (not found or sc > best
                            or (sc == best and cnt < bnt)):
                        best, bnt, found = sc, cnt, True
                if found:
                    dp[i], nt[i] = best, bnt
            if dp[n] == NEG:            # unreachable (unseen char)
                return n, 0, 0.0
            return n, nt[n], dp[n]

        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                n, k, sc = seg(str(txt))
                rows.append((int(did), n, k, round(sc, 6)))
            yield _pd.DataFrame(rows, columns=[
                id_col, "n_chars", "n_tokens", "score"])

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
