"""Text analysis operators for training-data pipelines.

tokenize / text_stats / quality_score / lang_id / fingerprint — all
pure Column compositions (whole-stage codegen, no Python), so they
stream through a 100 TB corpus with zero shuffle (per-row maps).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword lists (heuristic language ID)
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]
# BPE-ish token splitter: runs of word chars, or single non-space symbol
TOKEN_REGEX = r"\w+|[^\w\s]"


def words(text: Column) -> Column:
    """Whitespace tokenization (the corpus is single-space separated)."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    """Regex token count (words + punctuation symbols), BPE-ish proxy."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def with_text_stats(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics: word/char counts, uniqueness, avg word
    length — the signals quality filters cut on."""
    return df.select(id_col, *_text_stats_exprs(text_col))


@lru_cache(maxsize=16)
def _text_stats_exprs(text_col: str):
    """Constant (per column name) stats expression templates, built
    once per process (~40 py4j round-trips per plan build saved —
    guide §7.3 / r14 VERDICT item 3)."""
    ws = words(F.col(text_col))
    wlens = F.transform(ws, lambda w: F.length(w).cast("long"))
    n_words = F.size(ws).cast("long")
    return (
        F.length(text_col).cast("long").alias("n_chars_calc"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_uniq_words"),
        F.round(
            F.aggregate(wlens, F.lit(0).cast("long"), lambda a, x: a + x)
            .cast("double") / n_words, 6).alias("avg_word_len"),
        F.round(F.size(F.array_distinct(ws)).cast("double") / n_words, 6)
        .alias("uniq_ratio"),
    )


def quality_score(text: Column) -> Column:
    """Deterministic logistic quality score from length + uniqueness.

    score = sigmoid(-3 + 0.05*n_words + 2*uniq_ratio); heuristics in
    the spirit of C4/Gopher quality rules, kept reproducible in ANSI
    SQL for the oracle.
    """
    ws = words(text)
    n_words = F.size(ws).cast("double")
    uniq_ratio = F.size(F.array_distinct(ws)).cast("double") / n_words
    z = F.lit(-3.0) + 0.05 * n_words + 2.0 * uniq_ratio
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: English-stopword density threshold.
    (A real model would be a broadcast n-gram table; the decision
    plumbing — per-row map, no shuffle — is identical.)"""
    ws = words(text)
    hits = F.size(F.filter(ws, lambda w: w.isin(*EN_STOPWORDS))).cast("double")
    ratio = hits / F.size(ws).cast("double")
    return F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("unk"))


def bm25_scores(df: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 (Lucene variant) of a fixed query against every doc.

    The retrieval staple of contamination screens and quality-biased
    sampling: score(d) = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df_t + ½)/(df_t + ½) + 1).

    Plan shape at 100 TB: ONE global aggregate produces the whole
    model state — N, Σdl, and one df counter per query term, a single
    row — which broadcast-joins back; scoring is then a map-only pass
    (tf via a filter over the in-row token array, no explode, no
    per-term shuffle). Exactness: Σdl is an integer sum, so
    avgdl = Σdl/N is bit-identical across engines — every floating
    step is a per-row pure function of exact integers, which is what
    lets the DuckDB oracle match to round-6.
    """
    ws = words(F.col(text_col))
    base = df.select(id_col, ws.alias("__ws"),
                     F.size(ws).cast("long").alias("__dl"))
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (F.sum("__dl").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("__avgdl"),
        *[F.sum(F.when(F.array_contains("__ws", t), 1).otherwise(0))
          .cast("double").alias(f"__df{i}")
          for i, t in enumerate(query_terms)])
    scored = base.crossJoin(F.broadcast(stats))
    dl = F.col("__dl").cast("double")

    def _eq(term):
        # NOT `lambda w, t=t:` — a second parameter (even defaulted)
        # makes pyspark pass the array INDEX into it
        return lambda w: w == F.lit(term)

    score = None
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter("__ws", _eq(t))).cast("double")
        dft = F.col(f"__df{i}")
        idf = F.log((F.col("__n") - dft + 0.5) / (dft + 0.5) + 1.0)
        part = (idf * tf * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * dl / F.col("__avgdl"))))
        score = part if score is None else score + part
    return scored.select(F.col(id_col), F.round(score, 6).alias("bm25"))


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct word set (bag-of-words identity; robust to shuffling)."""
    ws = words(text)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws)), " "))


def markdown_to_text(col: Column) -> Column:
    """Strip Markdown to plain text — the markdown twin of
    warc.html_to_text, all JVM regexp_replace (CommonMark-ish subset:
    fenced/inline code, images, links, ATX headers, emphasis,
    blockquotes, thematic breaks). Link/image syntax keeps the
    visible text (alt/label); fenced code BODIES are dropped (they
    are not prose), inline code keeps its content.

    Order matters and is fixed: fences before inline backticks (a
    fence contains backticks), images before links (an image is '!'
    + link syntax), emphasis after links (labels may be emphasized).
    """
    s = F.regexp_replace(col, r"(?s)```.*?```", " ")
    s = F.regexp_replace(s, r"`([^`]*)`", r"$1")
    s = F.regexp_replace(s, r"!\[([^\]]*)\]\([^)]*\)", r"$1")
    s = F.regexp_replace(s, r"\[([^\]]*)\]\([^)]*\)", r"$1")
    s = F.regexp_replace(s, r"(?m)^#{1,6}[ \t]+", "")
    s = F.regexp_replace(s, r"(?m)^[ \t]{0,3}(?:-{3,}|\*{3,})[ \t]*$",
                         " ")
    s = F.regexp_replace(s, r"(?m)^[ \t]*>[ \t]?", "")
    s = F.regexp_replace(s, r"\*\*(.*?)\*\*", r"$1")
    s = F.regexp_replace(s, r"(?<!\w)__(.*?)__(?!\w)", r"$1")
    s = F.regexp_replace(s, r"\*([^*]+)\*", r"$1")
    # intraword underscores are NOT emphasis (CommonMark §6.2)
    s = F.regexp_replace(s, r"(?<!\w)_([^_]+)_(?!\w)", r"$1")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def tfidf_topk(df: DataFrame, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document TF-IDF top-k keyword extraction — the
    keyword/topic-tagging step of corpus curation.

    score = tf · (ln((N+1)/(df+1)) + 1)   (smoothed idf, sklearn's
    formulation), rounded to 6 before ranking; ties break on the
    term string, so the order is engine-exact and the DuckDB oracle
    replays it bit-for-bit.

    Plan shape at 100 TB: explode → per-(doc,term) count with
    map-side combine; the document-frequency table is a
    vocabulary-keyed aggregate joined back on term (hash join — the
    vocabulary is corpus-sized, never broadcast); N is one scalar
    broadcast; the per-doc top-k is a single window over the doc
    partition."""
    from pyspark.sql import Window

    w = df.select(id_col,
                  F.explode(words(F.col(text_col))).alias("term"))
    tf = w.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = w.groupBy("term").agg(
        F.count_distinct(id_col).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n))
              .select(id_col, "term",
                      F.round(
                          F.col("tf")
                          * (F.log((F.col("n") + 1.0)
                                   / (F.col("df") + 1.0)) + 1.0),
                          6).alias("score")))
    win = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                             F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select(id_col,
                    F.col("rank").cast("long").alias("rank"),
                    "term", "score"))


_GOPHER_STOPWORDS = ("the", "a", "of", "and", "to")


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Gopher-style hard quality rules (Rae et al. 2021 §A1.1, the
    published heuristics C4/Gopher corpora ship with), entirely JVM
    and exactly SQL-replayable:
      * word count within [5, 100000],
      * mean word length within [3, 10],
      * symbol-to-word ratio ('#' and '...' occurrences) < 0.1,
      * ≤ 90 % of lines starting with a bullet,
      * ≤ 30 % of lines ending with an ellipsis,
      * ≥ 2 of the required stopwords present.
    Emits every signal plus the conjunction `keep`. Map-only,
    zero-shuffle; fractions are single double divisions rounded to
    6 so the DuckDB oracle compares bit-exactly."""
    lines = F.split(F.col(text_col), "\n")
    ws = F.filter(F.split(F.col(text_col), r"\s+"),
                  lambda x: x != "")
    n_words = F.size(ws)
    n_lines = F.size(lines)
    char_sum = F.aggregate(ws, F.lit(0),
                           lambda acc, x: acc + F.length(x))
    n_sym = (F.size(F.regexp_extract_all(F.col(text_col),
                                         F.lit("#"), 0))
             + F.size(F.regexp_extract_all(F.col(text_col),
                                           F.lit(r"\.\.\."), 0)))
    n_bullet = F.size(F.filter(
        lines, lambda ln: ln.startswith("•") | ln.startswith("- ")))
    n_ellipsis = F.size(F.filter(
        lines, lambda ln: ln.rlike(r"\.\.\.$")))
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(ws), stop_arr))
    mean_wl = F.round(char_sum.cast("double")
                      / n_words.cast("double"), 6)
    sym_ratio = F.round(n_sym.cast("double")
                        / n_words.cast("double"), 6)
    bullet_frac = F.round(n_bullet.cast("double")
                          / n_lines.cast("double"), 6)
    ell_frac = F.round(n_ellipsis.cast("double")
                       / n_lines.cast("double"), 6)
    d = df.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ell_frac.alias("ellipsis_frac"),
        n_stop.cast("long").alias("n_stopwords"))
    return d.withColumn(
        "keep",
        F.col("n_words").between(5, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("n_stopwords") >= 2))


def chunk_overlap(df: DataFrame, size: int = 24, overlap: int = 8,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Sliding-window document chunking — the long-document split
    ahead of embedding/pretraining: token windows of ``size`` with
    ``overlap`` tokens shared between consecutive chunks. One row per
    chunk (doc_id, chunk_idx, n_tokens, chunk). Entirely JVM
    (split → sequence → posexplode → slice/array_join): map-only,
    zero shuffle, no Python in the plan — at 100 TB this is a single
    narrow pass whose output partitioning follows the input's.
    Empty documents yield no chunks; the final window may be shorter
    than ``size``."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: x != "")
    d = (df.select(id_col, toks.alias("_toks"))
           .withColumn("_n", F.size("_toks"))
           .select(
               id_col, "_toks", "_n",
               F.posexplode(F.filter(
                   F.sequence(F.lit(0),
                              F.greatest(F.col("_n") - 1, F.lit(0)),
                              F.lit(step)),
                   lambda s: s < F.col("_n")))
               .alias("chunk_idx", "_start")))
    return d.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(size), F.col("_n") - F.col("_start"))
         .cast("long").alias("n_tokens"),
        F.array_join(F.slice("_toks", F.col("_start") + 1, size), " ")
         .alias("chunk"))


_SENT_ABBREV = r"Dr|Mr|Mrs|Ms|Prof|Sr|Jr|St|vs|etc|e\.g|i\.e|cf|al"
_SENT_SENTINEL = "\x1f"                  # unit separator


def split_sentences(col: Column) -> Column:
    """Rule-based sentence segmentation, entirely JVM: a sentence
    ends at . ! ? followed by whitespace and an upper-case / digit /
    quote sentence OPENER — except after common abbreviations
    (Dr., Mr., e.g., et al. — the classic false boundaries) and
    never inside numbers (3.14 has no following whitespace). The
    boundary is marked with a sentinel (Spark's split drops the
    delimiter; $1 re-keeps the terminator), one split yields the
    array; posexplode for (pos, sentence) rows. Map-only."""
    marked = F.regexp_replace(
        col,
        "(?<!\\b(?:" + _SENT_ABBREV + "))([.!?])\\s+(?=[A-Z0-9\"'])",
        "$1" + _SENT_SENTINEL)
    return F.split(marked, _SENT_SENTINEL)


def chat_spans(df: DataFrame, turns_col: str = "turns",
               id_col: str = "doc_id") -> DataFrame:
    """Chat-template rendering + loss-mask span accounting — the SFT
    corpus preparation step. ``turns_col`` is an
    array<struct<role string, content string>>; each turn renders as
    the ChatML-style segment ``<|im_start|>{role}\\n{content}
    <|im_end|>\\n`` and the output gives, per turn, the character
    span its CONTENT occupies in the concatenated rendering (the
    offsets an SFT loss mask keeps for assistant turns and drops for
    the rest) plus the full rendered length.

    All JVM-side: posexplode + one window over (doc, turn order) for
    the running offset — the same single-shuffle shape as
    sessionization; no Python. Columns: (id, turn, role, is_target,
    span_start, span_end, rendered_len).
    """
    from pyspark.sql.window import Window

    t = df.select(id_col, F.posexplode(turns_col).alias("turn", "tc"))
    seg_pre = F.length(F.col("tc.role")) + F.lit(13)   # <|im_start|> + \n
    seg_len = seg_pre + F.length(F.col("tc.content")) + F.lit(11)
    w = (Window.partitionBy(id_col).orderBy("turn")
         .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy(id_col)
    start = F.coalesce(F.sum(seg_len).over(w), F.lit(0)) + seg_pre
    return t.select(
        id_col,
        F.col("turn").cast("long").alias("turn"),
        F.col("tc.role").alias("role"),
        (F.col("tc.role") == "assistant").cast("long")
        .alias("is_target"),
        start.cast("long").alias("span_start"),
        (start + F.length("tc.content")).cast("long")
        .alias("span_end"),
        F.sum(seg_len).over(wall).cast("long").alias("rendered_len"))


def render_chatml(turns: Column) -> Column:
    """The rendered training string itself (chat_spans' offsets index
    into exactly this): ``<|im_start|>role\\ncontent<|im_end|>\\n``
    per turn, concatenated. Pure JVM expression."""
    return F.aggregate(
        F.transform(turns, lambda t: F.concat(
            F.lit("<|im_start|>"), t["role"], F.lit("\n"),
            t["content"], F.lit("<|im_end|>\n"))),
        F.lit(""), lambda a, x: F.concat(a, x))


def fix_mojibake(col: Column) -> Column:
    """Repair the classic mojibake class: UTF-8 bytes that were
    decoded as latin-1 ('café' → 'cafÃ©') — the dominant encoding
    corruption in web corpora (what ftfy fixes first).

    The inverse transform re-encodes the text as latin-1 and decodes
    the bytes as UTF-8 — applied ONLY when (a) every char fits in
    latin-1, (b) a mojibake lead-byte marker (U+00C2..U+00F4 — the
    latin-1 renderings of UTF-8 lead bytes) is present, and (c) the
    re-encoded bytes are VALID UTF-8. Genuine accented text ('SÃO
    PAULO': Ã followed by an ASCII byte is invalid UTF-8) fails (c)
    and passes through untouched. Pure JVM expression: encode /
    is_valid_utf8 / decode, no Python."""
    b = F.encode(col, "ISO-8859-1")
    fixable = (col.rlike("^[\\x00-ÿ]*$")
               & col.rlike("[Â-ô]")
               & F.is_valid_utf8(b))
    return F.when(fixable, F.decode(b, "UTF-8")).otherwise(col)


def is_mojibake(col: Column) -> Column:
    """The fix_mojibake decision itself (1 when the repair fires)."""
    return (col.rlike("^[\\x00-ÿ]*$")
            & col.rlike("[Â-ô]")
            & F.is_valid_utf8(F.encode(col, "ISO-8859-1"))
            ).cast("long")


def c4_rules(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020 §2.2, the published
    Common-Crawl heuristics), entirely JVM and SQL-replayable:
      * LINE filter: keep only lines that end in terminal
        punctuation (. ! ? ") AND contain ≥ 5 words; lines
        mentioning javascript are dropped regardless,
      * PAGE filter: drop pages with < 3 kept lines, pages
        containing 'lorem ipsum' (case-insensitive) or a curly
        brace.
    Emits per page: line counts, kept-text char count, each page
    flag, and the conjunction `keep`. Map-only, zero shuffle."""
    lines = F.split(F.col(text_col), "\n")
    is_kept = (lambda ln:
               ln.rlike('[.!?"]$')
               & (F.size(F.filter(F.split(ln, r"\s+"),
                                  lambda x: x != "")) >= 5)
               & ~F.lower(ln).contains("javascript"))
    kept = F.filter(lines, is_kept)
    n_kept = F.size(kept)
    kept_chars = F.aggregate(kept, F.lit(0),
                             lambda acc, ln: acc + F.length(ln))
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = (F.col(text_col).contains("{")
                 | F.col(text_col).contains("}"))
    d = df.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        kept_chars.cast("long").alias("kept_chars"),
        has_lorem.cast("long").alias("has_lorem"),
        has_brace.cast("long").alias("has_brace"))
    return d.withColumn(
        "keep",
        (F.col("n_kept") >= 3) & (F.col("has_lorem") == 0)
        & (F.col("has_brace") == 0))


def nfc_normalize(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Unicode NFC normalization — the canonical-composition step of
    corpus normalization (decomposed 'e'+U+0301 and precomposed 'é'
    must tokenize/dedup identically). Arrow-batched kernel over
    Python's unicodedata (the stdlib implementation of UAX #15);
    emits (id, nfc, changed, n_chars_in, n_chars_out). The gate
    oracle is CROSS-ENGINE: DuckDB's own nfc_normalize (ICU-derived)
    must produce the same text."""
    schema = (f"{id_col} long, nfc string, changed long, "
              "n_chars_in long, n_chars_out long")

    def kernel(batches):
        import unicodedata as _ud

        import pandas as _pd

        for pdf in batches:
            out = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                t = str(t)
                n = _ud.normalize("NFC", t)
                out.append((int(did), n, int(n != t), len(t), len(n)))
            yield _pd.DataFrame(out, columns=[
                id_col, "nfc", "changed", "n_chars_in",
                "n_chars_out"])

    return df.select(id_col, text_col).mapInPandas(kernel, schema)


def build_aho_corasick(patterns: list[str]):
    """Classic Aho-Corasick automaton (goto/fail/output) over the
    pattern list. Returns (goto: list[dict[char, state]],
    fail: list[int], out: list[list[int]]). Built once on the driver
    and shipped by closure — the multi-pattern scan is O(text) per
    doc regardless of pattern count, vs O(text · patterns) for a
    regex alternation; the banlist path for 10k+ phrase lists."""
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for pi, p in enumerate(patterns):
        s = 0
        for ch in p:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].append(pi)
    fail = [0] * len(goto)
    from collections import deque
    q = deque()
    for ch, s in goto[0].items():
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s \
                else 0
            out[s] = out[s] + out[fail[s]]
    return goto, fail, out


def multi_pattern_counts(df: DataFrame, patterns: list[str],
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Count ALL (overlapping) occurrences of every pattern in every
    doc with one Aho-Corasick pass per doc; emits (id, pattern,
    n_matches) for patterns that hit. The automaton is built once on
    the driver; the kernel walk is O(len(text)). Narrow mapInPandas
    (a 10k-phrase banlist cannot be one JVM regex)."""
    goto, fail, out = build_aho_corasick(patterns)
    pats = list(patterns)
    schema = f"{id_col} long, pattern string, n_matches long"

    def kernel(batches):
        import pandas as _pd

        rows = []
        for pdf in batches:
            for did, t in zip(pdf[id_col], pdf[text_col]):
                counts = [0] * len(pats)
                s = 0
                for ch in str(t):
                    while s and ch not in goto[s]:
                        s = fail[s]
                    s = goto[s].get(ch, 0)
                    for pi in out[s]:
                        counts[pi] += 1
                for pi, c in enumerate(counts):
                    if c:
                        rows.append((int(did), pats[pi], c))
            yield _pd.DataFrame(rows, columns=[
                id_col, "pattern", "n_matches"])
            rows = []

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
