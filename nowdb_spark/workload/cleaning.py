"""Corpus-curation workload — repetition filters, PII scan,
deterministic splits, stratified sampling, contamination, end-to-end
cleaning — each paired with a bit-exact DuckDB oracle.

Oracle notes:
  - the md5 hash bucket is recomputed digit-by-digit in SQL via
    strpos('0123456789abcdef', ...) (same trick as the SimHash oracle);
  - DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics;
  - fractions are single double divisions of identical integers on
    both sides, so comparisons/rounding are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.operators import corpus as C
from nowdb_spark.workload import register, spread, table

_WORDS = "w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)"


def _md5_hex4(expr: str) -> str:
    """SQL for the integer value of the first 4 hex digits of
    md5(expr) — DuckDB has no hex→int conversion, so walk digits."""
    digit = ("(strpos('0123456789abcdef', "
             f"substr(md5({expr}), {{p}}, 1)) - 1)")
    d = [digit.format(p=p) for p in (1, 2, 3, 4)]
    return f"((({d[0]} * 16 + {d[1]}) * 16 + {d[2]}) * 16 + {d[3]})"


# ------------------------------------------------------------------
@register(
    "tx05_repetition",
    f"""
    WITH {_WORDS},
    bg AS (SELECT doc_id, ws,
                  list_transform(generate_series(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i+1]) AS bs
           FROM w)
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(bs) AS BIGINT) AS n_bigrams,
           round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws),
                 6) AS dup_word_frac,
           round(1.0 - CAST(len(list_distinct(bs)) AS DOUBLE) / len(bs),
                 6) AS dup_bigram_frac,
           round(CAST(list_max(list_transform(list_distinct(bs),
                     x -> len(list_filter(bs, y -> y = x)))) AS DOUBLE)
                 / len(bs), 6) AS top_bigram_frac
    FROM bg
    """,
    doc="Gopher-style repetition signals (dup word/bigram fractions, "
        "top-bigram mass)",
)
def tx05(spark, sf):
    return C.repetition_stats(table(spark, sf, "documents"))


# ------------------------------------------------------------------
def _pii_oracle() -> str:
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(c_name, '{p}')) AS BIGINT) "
        f"AS n_{name}"
        for name, p in C.PII_PATTERNS.items())
    masked = "c_name"
    for p in C.PII_PATTERNS.values():
        masked = f"regexp_replace({masked}, '{p}', '{C.PII_MASK}', 'g')"
    return f"""
    SELECT c_custkey,
           {counts},
           {masked} AS masked
    FROM customer
    """


@register(
    "pii01_scan_mask",
    _pii_oracle(),
    doc="PII pattern counts + masked text (email/ipv4/id-number "
        "regexes over customer names)",
)
def pii01(spark, sf):
    return C.pii_scan(table(spark, sf, "customer"), "c_name", "c_custkey")


# ------------------------------------------------------------------
@register(
    "sp01_hash_split",
    f"""
    WITH b AS (
      SELECT n_chars,
             {_md5_hex4("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY 1
    """,
    doc="deterministic md5-bucket train/valid/test split (80/10/10)",
)
def sp01(spark, sf):
    return (C.with_split(table(spark, sf, "documents"))
            .groupBy("split")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("sum_chars")))


# ------------------------------------------------------------------
@register(
    "sm01_stratified_sample",
    """
    SELECT source, doc_id, rk FROM (
      SELECT source, doc_id,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS rk
      FROM documents)
    WHERE rk <= 5
    """,
    doc="deterministic exact-k-per-stratum sample (rank by md5(id))",
)
def sm01(spark, sf):
    return (C.stratified_sample(table(spark, sf, "documents"),
                                "source", k=5)
            .select("source", "doc_id", F.col("rk").cast("long").alias("rk")))


# ------------------------------------------------------------------
@register(
    "cx01_contamination",
    """
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    g AS (SELECT doc_id, source,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                       || ws[i+3] || ' ' || ws[i+4] AS gram
          FROM (SELECT doc_id, source, ws,
                       unnest(generate_series(1, len(ws) - 4)) AS i
                FROM w)),
    tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0'),
    ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
    SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
    FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id
    """,
    doc="eval-set contamination: distinct 5-gram overlap vs the "
        "src0 slice (broadcast eval n-gram hashes)",
)
def cx01(spark, sf):
    docs = table(spark, sf, "documents")
    return C.contamination(docs.filter(F.col("source") != "src0"),
                           docs.filter(F.col("source") == "src0"), n=5)


# ------------------------------------------------------------------
@register(
    "cc01_clean_corpus",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    st AS (SELECT d.doc_id, d.source, d.lang,
                  CAST(len(ws) AS BIGINT) AS n_words,
                  1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
                    AS dwf,
                  min(d.doc_id) OVER (PARTITION BY md5(d.text)) AS canon
           FROM documents d JOIN w USING (doc_id))
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words
    FROM st
    WHERE lang = 'en' AND n_words BETWEEN 20 AND 100000
      AND dwf <= 0.75 AND doc_id = canon
    GROUP BY source
    """,
    doc="end-to-end curation: lang + length + repetition + exact-dedup "
        "canonical, per-source survivor counts",
)
def cc01(spark, sf):
    cc = C.clean_corpus(table(spark, sf, "documents"))
    return (cc.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("sum_words")))


@register(
    "cx02_det_shuffle",
    """
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (
             ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
             AS BIGINT) AS shuffle_order
    FROM documents
    """,
    doc="seed-stable global shuffle order (epoch-reproducible corpus "
        "order independent of partition layout)",
)
def cx02(spark, sf):
    d = table(spark, sf, "documents").select("doc_id", "n_chars")
    return C.deterministic_shuffle(d, seed=7)


def _pack_oracle() -> str:
    """Recursive-CTE replay of the greedy first-fit packer: one state
    row per document in shuffle order (same md5 order expression as
    cx02), carrying (seq, offset) through the linear recurrence."""
    return """
WITH RECURSIVE ordered AS (
  SELECT doc_id, n_chars AS n,
         row_number() OVER (
           ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
),
st AS (
  SELECT rn, doc_id, n,
         CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS off,
         CAST(CASE WHEN n > 512 THEN 1 ELSE 0 END AS BIGINT) AS seq_next,
         CAST(CASE WHEN n > 512 THEN 0 ELSE n END AS BIGINT) AS off_next
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.doc_id, o.n,
         CASE WHEN s.off_next > 0 AND s.off_next + o.n > 512
              THEN s.seq_next + 1 ELSE s.seq_next END AS seq,
         CASE WHEN s.off_next > 0 AND s.off_next + o.n > 512
              THEN CAST(0 AS BIGINT) ELSE s.off_next END AS off,
         CASE WHEN s.off_next > 0 AND s.off_next + o.n > 512 THEN
                CASE WHEN o.n > 512 THEN s.seq_next + 2
                     ELSE s.seq_next + 1 END
              ELSE
                CASE WHEN o.n > 512 THEN s.seq_next + 1
                     ELSE s.seq_next END
         END AS seq_next,
         CASE WHEN o.n > 512 THEN CAST(0 AS BIGINT)
              WHEN s.off_next > 0 AND s.off_next + o.n > 512 THEN o.n
              ELSE s.off_next + o.n END AS off_next
  FROM st s JOIN ordered o ON o.rn = s.rn + 1
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, seq AS seq_id,
       off AS "offset", n > 512 AS oversize
FROM st
"""


@register(
    "cx03_pack_sequences",
    _pack_oracle(),
    doc="greedy sequence packing into 512-token training bins along "
        "the deterministic shuffle order; oracle replays the "
        "first-fit recurrence as a recursive CTE",
)
def cx03(spark, sf):
    d = table(spark, sf, "documents") \
        .select("doc_id", F.col("n_chars").alias("n_tokens"))
    return C.pack_sequences(d, len_col="n_tokens", max_len=512, seed=7)


# ------------------------------------------------------------------
def _dsir_score_ctes(src: str = "documents",
                     target: str = "lang = 'en'") -> str:
    """Shared oracle CTE chain replaying importance_weights: unigram+
    bigram features, md5 bucket (the hash_bucket idiom), add-1
    smoothed log-ratio weight table, per-doc count·weight sum.
    ``src`` is the table/CTE holding (doc_id, text, …); ``target``
    the SQL boolean naming the in-domain slice."""
    return f"""
ws AS (SELECT *, string_split(text, ' ') AS ws FROM {src}),
feats AS (
  SELECT doc_id, {target} AS t, unnest(ws) AS f FROM ws
  UNION ALL
  SELECT doc_id, {target} AS t, ws[i] || ' ' || ws[i+1] AS f
  FROM (SELECT *, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM ws)
),
fb AS (SELECT doc_id, t,
              {_md5_hex4("f")} % 256 AS b
       FROM feats),
counts AS (
  SELECT b, count(*) AS n_raw, count(*) FILTER (t) AS n_tgt
  FROM fb GROUP BY b
),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM counts),
wtab AS (
  SELECT b, ln((n_tgt + 1.0) / (t_tgt + 256.0))
            - ln((n_raw + 1.0) / (t_raw + 256.0)) AS w
  FROM counts, tot
),
ds AS (
  SELECT fb.doc_id, sum(w) AS s
  FROM fb JOIN wtab USING (b) GROUP BY fb.doc_id
),
scored AS (
  SELECT d.doc_id, round(coalesce(ds.s, 0.0), 6) AS score
  FROM {src} d LEFT JOIN ds USING (doc_id)
)"""


@register(
    "cx04_dsir_weights",
    f"""
    WITH {_dsir_score_ctes()}
    SELECT doc_id, score FROM scored
    """,
    doc="DSIR importance weights (Xie et al. 2023): per-doc "
        "log p_target/p_raw under hashed unigram+bigram bag models, "
        "target = the English slice",
)
def cx04(spark, sf):
    d = table(spark, sf, "documents")
    return C.importance_weights(d, F.col("lang") == "en", buckets=256)


@register(
    "cx05_dsir_resample",
    f"""
    WITH {_dsir_score_ctes()}
    SELECT doc_id, score, key,
           row_number() OVER (ORDER BY key DESC, doc_id) <= 100
             AS selected
    FROM (
      SELECT doc_id, score,
             round(score - ln(-ln(
               ({_md5_hex4("CAST(doc_id AS VARCHAR)")} % 65536 + 0.5)
               / 65536.0)), 6) AS key
      FROM scored)
    """,
    doc="DSIR's sampling half: Gumbel-top-k draw of 100 docs with "
        "probability ∝ exp(score), noise derived deterministically "
        "from md5(doc_id) so both engines select identically",
)
def cx05(spark, sf):
    d = table(spark, sf, "documents")
    return C.importance_resample(d, F.col("lang") == "en", k=100,
                                 buckets=256)


# ------------------------------------------------------------------
def _qc_oracle_sql(buckets: int = 64, iters: int = 4,
                   lr: float = 0.5) -> str:
    """Generated oracle for qc01: the WHOLE logistic-regression
    training loop unrolled as SQL CTEs — per round: margins (weight
    join + sum), sigmoid residuals, per-bucket gradient, weight/bias
    update — then the final forward pass. Deterministic (zero init,
    fixed rounds); cross-engine float noise is ulp-level summation
    order under the round-6 cut, as in the k-means and EWMA oracles."""
    n_sql = "(SELECT n FROM nn)"
    parts = [f"""
WITH ws AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents),
feats AS MATERIALIZED (
  SELECT doc_id, unnest(ws) AS f FROM ws
  UNION ALL
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS f
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, len(ws) - 1)) AS i
        FROM ws)
),
fb AS MATERIALIZED (SELECT doc_id, {_md5_hex4("f")} % {buckets} AS b FROM feats),
dy AS MATERIALIZED (SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       FROM documents),
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM documents),
w0 AS MATERIALIZED (SELECT DISTINCT b, 0.0 AS w FROM fb),
bi0 AS MATERIALIZED (SELECT 0.0 AS bias)"""]
    for i in range(iters):
        parts.append(f""",
m{i} AS MATERIALIZED (
  SELECT d.doc_id, d.y,
         (SELECT bias FROM bi{i}) + coalesce(sum(w.w), 0.0) AS m
  FROM dy d LEFT JOIN fb USING (doc_id) LEFT JOIN w{i} w USING (b)
  GROUP BY d.doc_id, d.y
),
r{i} AS MATERIALIZED (SELECT doc_id, y, 1.0 / (1.0 + exp(-m)) - y AS r FROM m{i}),
g{i} AS MATERIALIZED (SELECT fb.b, sum(r.r) AS g
         FROM fb JOIN r{i} r USING (doc_id) GROUP BY fb.b),
w{i + 1} AS MATERIALIZED (
  SELECT w.b, w.w - {lr} / {n_sql} * coalesce(g.g, 0.0) AS w
  FROM w{i} w LEFT JOIN g{i} g USING (b)
),
bi{i + 1} AS MATERIALIZED (
  SELECT bias - {lr} / {n_sql} * (SELECT sum(r) FROM r{i}) AS bias
  FROM bi{i}
)""")
    parts.append(f""",
mf AS (
  SELECT d.doc_id,
         (SELECT bias FROM bi{iters}) + coalesce(sum(w.w), 0.0) AS m
  FROM dy d LEFT JOIN fb USING (doc_id) LEFT JOIN w{iters} w USING (b)
  GROUP BY d.doc_id
)
SELECT doc_id, round(1.0 / (1.0 + exp(-m)), 6) AS score,
       round(1.0 / (1.0 + exp(-m)), 6) >= 0.5 AS keep
FROM mf
""")
    return "".join(parts)


@register(
    "qc01_quality_classifier",
    _qc_oracle_sql(),
    doc="model-based quality filter: logistic regression on hashed "
        "unigram+bigram features, trained BY the engine (4 GD rounds, "
        "label = the English slice) and applied to every document — "
        "the oracle replays the full training loop as unrolled CTEs",
)
def qc01(spark, sf):
    from nowdb_spark.operators import quality as Q
    d = table(spark, sf, "documents")
    w, b = Q.train_quality_classifier(d, F.col("lang") == "en",
                                      buckets=64, iters=4, lr=0.5)
    return Q.quality_score(d, w, b)


# ------------------------------------------------------------------
@register(
    "px01_perplexity",
    f"""
    WITH ws0 AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
    uni AS (SELECT {_md5_hex4("w")} % 2048 AS b, count(*) AS n
            FROM (SELECT unnest(ws) AS w FROM ws0) GROUP BY 1),
    big AS (SELECT {_md5_hex4("g")} % 2048 AS b, count(*) AS n
            FROM (SELECT ws[i] || ' ' || ws[i+1] AS g
                  FROM (SELECT ws,
                               unnest(generate_series(1, len(ws) - 1))
                                 AS i
                        FROM ws0)) GROUP BY 1),
    pos AS (SELECT doc_id,
                   {_md5_hex4("ws[i]")} % 2048 AS ub,
                   {_md5_hex4("ws[i] || ' ' || ws[i+1]")} % 2048 AS bb
            FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 1)) AS i
                  FROM ws0)),
    lp AS (
      SELECT p.doc_id, count(*) AS n2,
             sum(ln((b.n + 1.0) / (u.n + 2048.0))) AS lp
      FROM pos p
      JOIN uni u ON u.b = p.ub
      JOIN big b ON b.b = p.bb
      GROUP BY p.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(lp.n2, 0) AS BIGINT) AS n_bigrams,
           round(exp(-lp.lp / lp.n2), 6) AS ppl
    FROM documents d LEFT JOIN lp USING (doc_id)
    """,
    doc="perplexity filtering (CCNet, Wenzek et al. 2020): hashed "
        "bigram LM trained on the corpus itself, per-doc ppl — the "
        "model is 2x2048 counts, scoring is a shuffle-free map pass",
)
def px01(spark, sf):
    from nowdb_spark.operators import quality as Q
    d = table(spark, sf, "documents")
    uni, bi = Q.train_bigram_lm(d, buckets=2048)
    return Q.perplexity(d, uni, bi)


# ------------------------------------------------------------------
@register(
    "cc02_curation_pipeline",
    f"""
    WITH wv AS (SELECT doc_id, string_split(text, ' ') AS wv
                FROM documents),
    stv AS (SELECT d.doc_id, d.text, d.lang, d.source,
                  CAST(len(wv) AS BIGINT) AS n_words,
                  1.0 - CAST(len(list_distinct(wv)) AS DOUBLE) / len(wv)
                    AS dwf,
                  min(d.doc_id) OVER (PARTITION BY md5(d.text)) AS canon
           FROM documents d JOIN wv USING (doc_id)),
    cleaned AS (
      SELECT doc_id, text, source FROM stv
      WHERE lang = 'en' AND n_words BETWEEN 20 AND 100000
        AND dwf <= 0.75 AND doc_id = canon
    ),
    {_dsir_score_ctes(src="cleaned", target="source = 'src1'")}
    SELECT doc_id, score, rnk FROM (
      SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
               AS INT) AS rnk
      FROM scored)
    WHERE rnk <= 100
    """,
    doc="end-to-end curation pipeline under ONE oracle: clean "
        "(lang+length+repetition+exact-dedup) → DSIR scoring over the "
        "survivors (target = the src1 slice) → deterministic top-100 "
        "selection — the composed DataFrame graph a real pretraining "
        "prep run executes",
)
def cc02(spark, sf):
    d = table(spark, sf, "documents")
    cleaned = C.clean_corpus(d)
    scored = C.importance_weights(cleaned,
                                  F.col("source") == "src1",
                                  buckets=256)
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (scored
            .withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= 100))


# ------------------------------------------------------------------
@register(
    "ld01_line_dedup",
    """
    WITH w AS (SELECT doc_id, string_split(text, chr(10)) AS ws
               FROM documents),
    l AS (SELECT doc_id, i AS pos, ws[i] AS line
          FROM (SELECT doc_id, ws,
                       unnest(generate_series(1, len(ws))) AS i
                FROM w)),
    nb AS (SELECT doc_id, pos, line,
                  (row_number() OVER (PARTITION BY line
                     ORDER BY doc_id, pos) = 1) AS keep
           FROM l WHERE trim(line) <> ''),
    al AS (SELECT doc_id, pos, line, keep FROM nb
           UNION ALL
           SELECT doc_id, pos, line, TRUE AS keep
           FROM l WHERE trim(line) = '')
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN keep THEN line END,
                               chr(10) ORDER BY pos), '') AS text,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lines_kept,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
             AS n_lines_dropped
    FROM al GROUP BY doc_id
    """,
    doc="C4-style line-level dedup: keep each distinct non-blank line "
        "only at its first corpus occurrence, re-assemble documents "
        "(on the newline-free synthetic corpus this degenerates to "
        "whole-text keep-first — the multi-line path is locked by "
        "tests/test_corpus.py fixtures)",
)
def ld01(spark, sf):
    return C.line_dedup(table(spark, sf, "documents"))


# ------------------------------------------------------------------
@register(
    "dm01_domain_mix",
    """
    WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS c
               FROM documents GROUP BY source),
    z AS (SELECT sum(pow(c, 0.5)) AS z FROM c),
    q AS (SELECT source,
                 CAST(least(c, floor(round(200 * pow(c, 0.5) / z, 6)))
                   AS BIGINT) AS quota
          FROM c, z),
    r AS (SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY md5('13:' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS BIGINT) AS rk
          FROM documents)
    SELECT r.doc_id, r.source, r.rk
    FROM r JOIN q USING (source) WHERE rk <= quota
    """,
    doc="temperature-scaled domain mixture sample (alpha=0.5, "
        "budget=200): per-domain quotas proportional to count^alpha, "
        "deterministic md5-rank selection inside each domain",
)
def dm01(spark, sf):
    return C.domain_mix_sample(table(spark, sf, "documents"),
                               total=200, alpha=0.5, seed=13)


# ------------------------------------------------------------------
@register(
    "cx06_chunk_overlap",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0, greatest(len(toks), 1), 16)) AS st
      FROM t
      WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(st // 16 AS BIGINT) AS chunk_idx,
           CAST(least(24, n - st) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, st + 1, st + 24), ' ')
             AS chunk
    FROM s
    """,
    doc="sliding-window document chunking (size 24, overlap 8): the "
        "long-document split ahead of embedding / pretraining "
        "pipelines, entirely JVM (split -> sequence -> posexplode "
        "-> slice), map-only zero-shuffle; oracle replays every "
        "window boundary and the joined chunk text",
)
def cx06(spark, sf):
    from nowdb_spark.operators import textops as T
    return T.chunk_overlap(table(spark, sf, "documents"),
                           size=24, overlap=8)


# ------------------------------------------------------------------
# Gopher rule battery (qc02): each doc is rendered as a "noisy web
# page" — bullet lines for id%3, an ellipsis teaser for id%4, a
# symbol-run line for id%5 — then the published hard rules run over
# it. The fixture mix makes every rule fire on some slice (short
# docs fail the symbol ratio, teaser-only pages fail the ellipsis
# line fraction, 'a'-heavy docs fail mean word length).
_QC02_PAGE_SQL = """
  SELECT doc_id, text ||
    CASE WHEN doc_id % 3 = 0
         THEN chr(10) || '• item one' || chr(10) || '• item two'
         ELSE '' END ||
    CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'read more...'
         ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN chr(10) || '### ### ###'
         ELSE '' END AS page
  FROM documents
"""


@register(
    "qc02_gopher_rules",
    r"""
    WITH p AS (""" + _QC02_PAGE_SQL + r"""),
    w AS (
      SELECT doc_id, page,
             list_filter(string_split_regex(page, '\s+'),
                         x -> x <> '') AS ws,
             string_split(page, chr(10)) AS lines
      FROM p
    ),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             round(CAST(list_aggregate(list_transform(ws,
                     x -> length(x)), 'sum') AS DOUBLE)
                   / len(ws), 6) AS mean_word_len,
             round(CAST(len(regexp_extract_all(page, '#'))
                        + len(regexp_extract_all(page, '\.\.\.'))
                     AS DOUBLE) / len(ws), 6) AS symbol_ratio,
             round(CAST(len(list_filter(lines, l ->
                     starts_with(l, '•') OR starts_with(l, '- ')))
                     AS DOUBLE) / len(lines), 6) AS bullet_frac,
             round(CAST(len(list_filter(lines, l ->
                     regexp_matches(l, '\.\.\.$'))) AS DOUBLE)
                   / len(lines), 6) AS ellipsis_frac,
             len(list_intersect(list_distinct(ws),
                 ['the', 'a', 'of', 'and', 'to'])) AS n_stopwords
      FROM w
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac,
           CAST(n_stopwords AS BIGINT) AS n_stopwords,
           (n_words BETWEEN 5 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND symbol_ratio < 0.1
             AND bullet_frac <= 0.9
             AND ellipsis_frac <= 0.3
             AND n_stopwords >= 2 AS keep
    FROM m
    """,
    doc="Gopher hard quality rules (word-count and mean-word-length "
        "bounds, symbol-to-word ratio, bullet-line and ellipsis-line "
        "fractions, required-stopword count) over deterministically "
        "rendered noisy pages; entirely JVM, map-only; the oracle "
        "replays the page construction and every rule bit-exactly",
)
def qc02(spark, sf):
    from nowdb_spark.operators import textops as T
    d = table(spark, sf, "documents")
    page = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("\n• item one\n• item two")).otherwise(""),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\nread more...")).otherwise(""),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("\n### ### ###")).otherwise(""))
    return T.gopher_rules(d.select("doc_id", page.alias("text")))


# ------------------------------------------------------------------
# Chat-template rendering + loss-mask spans (cx07): the SFT corpus
# preparation step. Each doc synthesizes a conversation (optional
# system turn on even ids, then doc%4+2 alternating user/assistant
# turns); chat_spans renders the ChatML-style template arithmetic
# and emits, per turn, the character span its content occupies in
# the rendered string — exactly the offsets an SFT loss mask keeps
# (assistant) or drops (user/system). JVM-only: posexplode + one
# window over (doc, turn), the sessionize shuffle shape. The oracle
# replays segment lengths and running offsets with SQL windows.
@register(
    "cx07_chat_template",
    """
    WITH d AS (SELECT doc_id, doc_id % 4 + 2 AS n,
                      doc_id % 2 = 0 AS has_sys
               FROM documents),
    turns AS (
      SELECT doc_id, 0 AS turn, 'system' AS role,
             'sys d' || doc_id AS content
      FROM d WHERE has_sys
      UNION ALL
      SELECT doc_id,
             t + CASE WHEN has_sys THEN 1 ELSE 0 END AS turn,
             CASE WHEN t % 2 = 0 THEN 'user' ELSE 'assistant' END
               AS role,
             CASE WHEN t % 2 = 0 THEN 'u' || doc_id || ' q' || t
                  ELSE 'a' || doc_id || ' r' || t END AS content
      FROM (SELECT doc_id, has_sys, unnest(range(0, n)) AS t FROM d)
    ),
    seg AS (SELECT doc_id, turn, role,
                   length(role) + 13 AS pre,
                   length(content) AS cl,
                   length(role) + 13 + length(content) + 11 AS sl
            FROM turns)
    SELECT doc_id,
           CAST(turn AS BIGINT) AS turn, role,
           CAST(role = 'assistant' AS BIGINT) AS is_target,
           CAST(coalesce(sum(sl) OVER (
                  PARTITION BY doc_id ORDER BY turn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) + pre AS BIGINT) AS span_start,
           CAST(coalesce(sum(sl) OVER (
                  PARTITION BY doc_id ORDER BY turn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) + pre + cl AS BIGINT) AS span_end,
           CAST(sum(sl) OVER (PARTITION BY doc_id) AS BIGINT)
             AS rendered_len
    FROM seg
    """,
    doc="chat-template rendering + loss-mask span accounting for "
        "SFT corpora: ChatML-style segments, per-turn content "
        "character offsets in the rendered string (is_target marks "
        "assistant spans), total rendered length; JVM posexplode + "
        "window, oracle replays offsets with SQL windows",
)
def cx07(spark, sf):
    from nowdb_spark.operators.textops import chat_spans

    d = table(spark, sf, "documents")
    turns = F.expr("""
      concat(
        filter(array(named_struct(
                 'role', 'system',
                 'content', concat('sys d', doc_id))),
               x -> doc_id % 2 = 0),
        transform(sequence(0, int(doc_id % 4 + 1)), t ->
          named_struct(
            'role', if(t % 2 = 0, 'user', 'assistant'),
            'content', if(t % 2 = 0,
                          concat('u', doc_id, ' q', t),
                          concat('a', doc_id, ' r', t)))))""")
    return chat_spans(d.select("doc_id", turns.alias("turns")))


# ------------------------------------------------------------------
# C4 rule battery (qc03): the published Common-Crawl cleaning
# heuristics (Raffel et al. 2020 §2.2) — line-level terminal-punct +
# ≥5-words + javascript-drop, page-level lorem-ipsum / curly-brace /
# <3-kept-lines. The fixture page plants a slice for every rule
# (short line, unterminated line, js line on evens, extra sentence
# on ≡0 mod 3, lorem on ≡0 mod 4, brace on ≡0 mod 5) so each fires
# on part of the corpus; the oracle REPLAYS the generic rule over
# the same constructed lines (list_filter), not hand-derived
# outcomes.
@register(
    "qc03_c4_rules",
    r"""
    WITH d AS (
      SELECT doc_id,
        ['Good sentence with many words here d' || doc_id || '.']
        || ['short line.']
        || ['no terminal punctuation line with words d' || doc_id]
        || CASE WHEN doc_id % 2 = 0
                THEN ['Enable javascript to view this page now.']
                ELSE [] END
        || CASE WHEN doc_id % 3 = 0
                THEN ['Another proper sentence is here d' || doc_id
                      || '!'] ELSE [] END
        || CASE WHEN doc_id % 4 = 0
                THEN ['lorem ipsum dolor sit amet consectetur.']
                ELSE [] END
        || CASE WHEN doc_id % 5 = 0
                THEN ['code { display: none; }'] ELSE [] END
        || ['A third full sentence exists right here d' || doc_id
            || '?'] AS lns
      FROM documents),
    p AS (SELECT doc_id, lns,
                 array_to_string(lns, chr(10)) AS page,
                 list_filter(lns, ln ->
                   regexp_matches(ln, '[.!?"]$')
                   AND len(list_filter(string_split_regex(ln, '\s+'),
                                       x -> x <> '')) >= 5
                   AND NOT contains(lower(ln), 'javascript')) AS kept
          FROM d)
    SELECT doc_id,
           CAST(len(lns) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(coalesce(list_aggregate(list_transform(kept, ln ->
             length(ln)), 'sum'), 0) AS BIGINT) AS kept_chars,
           CAST(contains(lower(page), 'lorem ipsum') AS BIGINT)
             AS has_lorem,
           CAST(contains(page, '{') OR contains(page, '}') AS BIGINT)
             AS has_brace,
           len(kept) >= 3
             AND NOT contains(lower(page), 'lorem ipsum')
             AND NOT (contains(page, '{') OR contains(page, '}'))
             AS keep
    FROM p
    """,
    doc="C4 cleaning rules (published Common-Crawl heuristics): "
        "line-level terminal-punctuation + >=5-words + javascript "
        "drop, page-level lorem-ipsum / curly-brace / <3-kept-lines; "
        "every rule fires on a fixture slice and the oracle replays "
        "the generic rule over the same lines",
)
def qc03(spark, sf):
    from nowdb_spark.operators import textops as T

    d = table(spark, sf, "documents")
    page = F.concat(
        F.lit("Good sentence with many words here d"), F.col("doc_id"),
        F.lit(".\nshort line.\n"
              "no terminal punctuation line with words d"),
        F.col("doc_id"),
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("\nEnable javascript to view this page now."))
        .otherwise(""),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("\nAnother proper sentence is here d"),
                        F.col("doc_id"), F.lit("!"))).otherwise(""),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\nlorem ipsum dolor sit amet consectetur."))
        .otherwise(""),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("\ncode { display: none; }")).otherwise(""),
        F.lit("\nA third full sentence exists right here d"),
        F.col("doc_id"), F.lit("?"))
    return T.c4_rules(d.select("doc_id", page.alias("text")))


# ------------------------------------------------------------------
# Unicode NFC normalization (tx14): decomposed combining sequences
# must canonically compose before tokenize/dedup. This oracle is
# CROSS-ENGINE in the strongest sense: the Spark side normalizes
# with Python's unicodedata (UAX #15 stdlib), the DuckDB side with
# its own nfc_normalize (ICU-derived) — two independent
# implementations of the Unicode standard must emit identical text,
# lengths and changed flags over fixtures mixing decomposed,
# precomposed and ASCII slices.
@register(
    "tx14_nfc_normalize",
    """
    WITH d AS (SELECT doc_id,
      CASE doc_id % 4
        WHEN 0 THEN 'd' || doc_id || ' cafe' || chr(769)
        WHEN 1 THEN 'd' || doc_id || ' café'
        WHEN 2 THEN 'd' || doc_id || ' A' || chr(778) || ' vis'
        ELSE 'd' || doc_id || ' plain ascii' END AS t
      FROM documents)
    SELECT doc_id,
           nfc_normalize(t) AS nfc,
           CAST(nfc_normalize(t) <> t AS BIGINT) AS changed,
           CAST(length(t) AS BIGINT) AS n_chars_in,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS n_chars_out
    FROM d
    """,
    doc="Unicode NFC normalization (canonical composition): "
        "Python unicodedata in the engine vs DuckDB's ICU "
        "nfc_normalize in the oracle — two independent "
        "implementations of UAX #15 compared value-exact",
)
def tx14(spark, sf):
    from nowdb_spark.operators import textops as T

    # NB: the class-0 'café' literal below is DECOMPOSED (e+U+0301)
    # and class-2 holds A+U+030A — visually identical to the
    # precomposed forms but different code points; an editor that
    # NFC-normalizes this file would break the fixture (the oracle
    # spells them chr(769)/chr(778), so the gate would catch it).
    d = table(spark, sf, "documents")
    t = (F.when(F.col("doc_id") % 4 == 0,
                F.concat(F.lit("d"), F.col("doc_id"),
                         F.lit(" café")))
         .when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit("d"), F.col("doc_id"),
                        F.lit(" café")))
         .when(F.col("doc_id") % 4 == 2,
               F.concat(F.lit("d"), F.col("doc_id"),
                        F.lit(" Å vis")))
         .otherwise(F.concat(F.lit("d"), F.col("doc_id"),
                             F.lit(" plain ascii"))))
    return T.nfc_normalize(d.select("doc_id", t.alias("text")))


# ------------------------------------------------------------------
# Multi-pattern banlist scan (qc04): one Aho-Corasick pass counts
# ALL (overlapping) occurrences of every pattern — the phrase-
# banlist primitive that a 10k-entry list needs (O(text) per doc vs
# O(text·patterns) regex alternation). The classic 'ushers' fixture
# makes the suffix-link machinery observable: she/he/hers all end
# inside one 6-char word. The oracle counts every pattern at every
# position (the overlapping-count definition) in SQL.
_QC04_PATTERNS = ["he", "she", "his", "hers", "spark", "shield"]


def _qc04_oracle() -> str:
    t = ("'ushers his d' || doc_id || ' shield she spark'"
         " || CASE WHEN doc_id % 3 = 0 THEN ' hers hers' ELSE '' END"
         " || CASE WHEN doc_id % 4 = 0 THEN ' sparkle' ELSE '' END")
    branches = []
    for p in _QC04_PATTERNS:
        L = len(p)
        cnt = (f"coalesce(list_aggregate(list_transform("
               f"range(1, length(t) - {L} + 2), i -> "
               f"CAST(substr(t, i, {L}) = '{p}' AS INT)), 'sum'), 0)")
        branches.append(
            f"SELECT doc_id, '{p}' AS pattern, "
            f"CAST({cnt} AS BIGINT) AS n_matches "
            f"FROM d WHERE {cnt} > 0")
    return (f"WITH d AS (SELECT doc_id, {t} AS t FROM documents) "
            + " UNION ALL ".join(branches))


@register(
    "qc04_banlist_scan",
    _qc04_oracle(),
    doc="multi-pattern banlist scan via one Aho-Corasick pass "
        "(goto/fail/output automaton, overlapping counts — "
        "she/he/hers all fire inside 'ushers'); O(text) per doc "
        "regardless of pattern count; oracle counts every pattern "
        "at every position in SQL",
)
def qc04(spark, sf):
    from nowdb_spark.operators.textops import multi_pattern_counts

    d = spread(table(spark, sf, "documents"))
    t = F.concat(
        F.lit("ushers his d"), F.col("doc_id"),
        F.lit(" shield she spark"),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit(" hers hers")).otherwise(""),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit(" sparkle")).otherwise(""))
    return multi_pattern_counts(
        d.select("doc_id", t.alias("text")), _QC04_PATTERNS)


# ------------------------------------------------------------------
# Composed pretraining preprocessing (cc03): the capstone recipe —
# noisy synthetic pages (every qc03 rule slice, plus REAL CLONES:
# ids ≡ 7 mod 10 render id-1's page) → C4 line+page gate → exact
# dedup with min-id canonical survivor (the Spark side hashes the
# ACTUAL page text; the oracle may dedup on the construction seed
# because page equality ⟺ seed equality by fixture design) → token
# accounting of the kept lines. One oracle covers the whole chain.
def _cc03_lines_sql() -> str:
    return """
        ['Good sentence with many words here d' || bid || '.']
        || ['short line.']
        || ['no terminal punctuation line with words d' || bid]
        || CASE WHEN bid % 2 = 0
                THEN ['Enable javascript to view this page now.']
                ELSE [] END
        || CASE WHEN bid % 3 = 0
                THEN ['Another proper sentence is here d' || bid
                      || '!'] ELSE [] END
        || CASE WHEN bid % 4 = 0
                THEN ['lorem ipsum dolor sit amet consectetur.']
                ELSE [] END
        || CASE WHEN bid % 5 = 0
                THEN ['code { display: none; }'] ELSE [] END
        || ['A third full sentence exists right here d' || bid
            || '?']"""


@register(
    "cc03_pretrain_pipeline",
    f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 7 AND doc_id > 0
                  THEN doc_id - 1 ELSE doc_id END AS bid
      FROM documents),
    p AS (
      SELECT doc_id, bid, {_cc03_lines_sql()} AS lns
      FROM d),
    k AS (
      SELECT doc_id, bid,
             list_filter(lns, ln ->
               regexp_matches(ln, '[.!?\"]$')
               AND len(list_filter(string_split_regex(ln, '\\s+'),
                                   x -> x <> '')) >= 5
               AND NOT contains(lower(ln), 'javascript')) AS kept,
             contains(lower(array_to_string(lns, chr(10))),
                      'lorem ipsum')
               OR contains(array_to_string(lns, chr(10)), '{{')
               AS page_bad
      FROM p),
    surv AS (
      SELECT doc_id, bid, kept FROM k
      WHERE len(kept) >= 3 AND NOT page_bad),
    canon AS (
      SELECT doc_id, bid, kept,
             min(doc_id) OVER (PARTITION BY bid) AS canonical
      FROM surv)
    SELECT doc_id,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(len(list_filter(string_split_regex(
                  array_to_string(kept, ' '), '\\s+'),
                x -> x <> '')) AS BIGINT) AS n_tokens
    FROM canon WHERE doc_id = canonical
    """,
    doc="composed pretraining preprocessing: noisy pages with "
        "planted clones -> C4 line+page gate -> exact dedup on the "
        "REAL page hash with min-id canonical survivor -> "
        "whitespace-token accounting of kept text, the whole recipe "
        "under ONE oracle",
)
def cc03(spark, sf):
    from nowdb_spark.operators.textops import c4_rules

    d = table(spark, sf, "documents")
    bid = F.when((F.col("doc_id") % 10 == 7) & (F.col("doc_id") > 0),
                 F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    page = F.concat(
        F.lit("Good sentence with many words here d"), bid,
        F.lit(".\nshort line.\n"
              "no terminal punctuation line with words d"), bid,
        F.when(bid % 2 == 0,
               F.lit("\nEnable javascript to view this page now."))
        .otherwise(""),
        F.when(bid % 3 == 0,
               F.concat(F.lit("\nAnother proper sentence is here d"),
                        bid, F.lit("!"))).otherwise(""),
        F.when(bid % 4 == 0,
               F.lit("\nlorem ipsum dolor sit amet consectetur."))
        .otherwise(""),
        F.when(bid % 5 == 0,
               F.lit("\ncode { display: none; }")).otherwise(""),
        F.lit("\nA third full sentence exists right here d"),
        bid, F.lit("?"))
    pages = d.select("doc_id", page.alias("text"))
    flags = c4_rules(pages).select("doc_id", "keep", "n_kept")
    kept_text = F.concat_ws(
        " ", F.filter(
            F.split(F.col("text"), "\n"),
            lambda ln: ln.rlike('[.!?"]$')
            & (F.size(F.filter(F.split(ln, r"\s+"),
                               lambda x: x != "")) >= 5)
            & ~F.lower(ln).contains("javascript")))
    surv = (pages.join(flags, "doc_id").filter("keep")
            .select("doc_id", "n_kept",
                    kept_text.alias("ktext")))
    from pyspark.sql.window import Window
    canon = (surv
             .withColumn("canonical",
                         F.min("doc_id").over(
                             Window.partitionBy(F.md5("ktext"))))
             .filter(F.col("doc_id") == F.col("canonical")))
    n_tokens = F.size(F.filter(F.split(F.col("ktext"), r"\s+"),
                               lambda x: x != ""))
    return canon.select(
        "doc_id", "n_kept",
        n_tokens.cast("long").alias("n_tokens"))
