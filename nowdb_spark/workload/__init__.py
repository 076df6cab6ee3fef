"""The oracle-checked query battery (driver contract).

Each entry pairs a PySpark implementation with an ANSI-SQL oracle that
DuckDB runs over the same parquet tables. Column names/aliases are kept
identical on both sides (the driver's compare sorts columns by name and
hashes values). Floating-point aggregates are rounded on BOTH sides at
a precision far above cross-engine summation-order noise.

Registry shape:
    QUERIES: dict[name, QuerySpec(spark=callable(spark, sf_dir) -> DF,
                                  oracle=SQL string | None)]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from nowdb_spark.timeutil import normalize_stamps


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn
    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver supplies its own SparkSession; the engine's stamp
    # policy is int64 ns regardless of the file's physical encoding:
    # TIMESTAMP(NANOS) needs the read-time conf (Spark otherwise
    # refuses NANOS parquet), timestamp[us] / TIMESTAMP_NTZ are
    # rewritten post-read by normalize_stamps (session-tz-proof).
    # Only the STAMP column is normalized ("ts", the events stamp —
    # TESTDATA.md contract): TPC-H date columns (l_shipdate,
    # o_orderdate) stay native timestamps, matching the oracle's
    # date-literal comparisons on both sides.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_stamps(df, columns=("ts",))


def spread(df: DataFrame) -> DataFrame:
    """Fan a small CPU-heavy input across every core.

    Gate/bench-scale parquet files arrive as 1-2 splits, so a per-row
    CPU-bound map (md5 MinHash folds, pure-Python decodes) would run
    on one core while 31 idle. At production scale inputs already
    carry >= defaultParallelism partitions and this is a no-op; below
    that, the round-robin shuffle of a few MB is noise next to the map
    it parallelizes.
    """
    try:
        p = df.sparkSession.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect has no sparkContext/rdd surface — fall back
        # to an unconditional spread (still a no-op cost-wise at the
        # file sizes where this path matters)
        return df.repartition(32)
    return df.repartition(p) if n < p else df


# populate the registry
from nowdb_spark.workload import core  # noqa: E402,F401
from nowdb_spark.workload import dialect  # noqa: E402,F401
from nowdb_spark.workload import graph  # noqa: E402,F401
from nowdb_spark.workload import pipeline  # noqa: E402,F401
from nowdb_spark.workload import timeseries  # noqa: E402,F401
from nowdb_spark.workload import cleaning  # noqa: E402,F401
from nowdb_spark.workload import streams  # noqa: E402,F401
from nowdb_spark.workload import sketch  # noqa: E402,F401


# ------------------------------------------------------------------
# Registration order IS the driver contract: the correctness gate
# checks only the FIRST 50 registered queries. Rebuild the registry so
# every distinct operator family (reference relational core, graph,
# dedup, text, ANN, multimodal, time-series) lands inside that window;
# redundant variants of already-covered families (extra TPC-H shapes,
# dialect spellings of in-window operators) are relegated past 50.
# Relegated queries stay registered and remain fully oracle-verified by
# tests/test_workload.py — only the driver row is forgone.
_PRIORITY_ORDER = [
    # reference relational core — one per SURVEY §2.2/§2.3/§2.4 family
    "q01_scan_filter", "q02_point_lookup", "q03_in_list",
    "q04_time_range", "q05_distinct", "q06_count_by_key",
    "q07_countall", "q08_group_agg", "q09_global_agg",
    "q10_median_stddev", "q11_order_topk",
    "q13_time_extract", "q14_null_semantics", "q15_join_origin",
    "q16_join_two_dims", "q19_semi_join", "q20_anti_join",
    # sessionize/as-of gate rows run the SQL-dialect spellings
    # (nq18/nq19: parser→binder→framed window) — the DataFrame twins
    # q22/q23 are relegated past-window, still oracle-verified by
    # tests/test_workload.py
    # nq19's window-spelled as-of yields its slot to nq25 (round 7):
    # the ASOF JOIN dialect syntax checked against DuckDB's NATIVE
    # ASOF LEFT JOIN — a cross-engine semantics oracle, not a rewrite.
    # nq19 stays oracle-verified by the pytest sweep.
    "nq18_dialect_sessionize", "nq25_dialect_asof_join",
    # q28's CASE/priority semantics are covered in-window by q14/nq02.
    # cx05's DSIR resample is subsumed by cc02 (whose oracle replays
    # the same hashed-ngram scoring AND the Gumbel-top-k selection as
    # one pipeline) — relegated round 9, pytest-verified.
    # q26's approx-agg bounds gate proved green in-window round 9;
    # relegated round 10 (pytest-verified, test_approx) — its slot
    # carries the WebDataset tar-shard ingest wd01, the training-data
    # container format no other row demonstrates.
    # q21's PROD aggregate proved green in-window rounds 1-9;
    # relegated round 10b (pytest-verified — aggregates keep
    # q08/q09/q10/q31/ts-family rows in-window). Its slot carries
    # wd07, the TFRecord ingest: masked-CRC-32C framing + a protobuf
    # wire parser built from the public specs — the hardest new
    # container machinery of round 10.
    "wd01_webdataset", "wd07_tfrecord", "q31_mode",
    # dialect front-end (parser → binder → DataFrame) representatives
    # (q12's scalar-formula battery is covered in-window by nq02; its
    # slot goes to the window-function extension. g05's k-hop slot
    # goes to subqueries — graph keeps three rows, k-hop stays
    # pytest-verified. nq07's many-aggs spelling is covered by the
    # in-window aggregate rows q08/q09/q10/q21/q31/ts03 plus the three
    # remaining dialect rows — relegated round 9, pytest-verified.)
    # nq10's subquery spelling proved green in-window rounds 5–9;
    # relegated round 10 (pytest-verified — the binder's subquery
    # machinery also underlies in-window nq02/nq08/nq18/nq25). Its
    # slot carries the PDF text-extraction gate dc01: ISO 32000-1
    # object scan + FlateDecode + page-tree walk + Tj/TJ tokenizer,
    # a document-format class no other row demonstrates.
    "nq02_dialect_formulas",
    "nq08_dialect_window", "dc01_pdf_extract",
    # graph operators (g01's co-supply pair emission is the building
    # block g02's triangle count already exercises — wedge generation
    # IS hot-key-blocked pair emission — and plain self-joins are
    # covered by q15/q16/q19/q20; relegated round 9, pytest-verified.
    # sk02b's CMS targeted probe proved green in-window round 9;
    # relegated round 10 (pytest-verified; the sketch family keeps
    # sk01 HLL + sk03 KLL in-window). Its slot carries the IMA ADPCM
    # sample-decode gate mm15, whose oracle replays the entire
    # predictor/step-index state machine as a SQL list_reduce fold —
    # the hardest oracle construction of round 9.)
    "g02_triangles", "g03_components",
    "g04_pagerank", "mm15_adpcm_decode",
    # dedup family (dd02 signatures are subsumed by dd03's LSH path;
    # dd05 simhash is a third signature flavor — relegated round 7,
    # still oracle-verified by pytest; its slot carries the KLL
    # quantile sketch, a capability class no other row demonstrates.
    # dd04's exact n-gram Jaccard shares dd03's exploded-token
    # inverted-index machinery — same explode→join→group shape with an
    # exact denominator instead of banded signatures — relegated
    # round 9 like its containment cousin dd07, pytest-verified.
    # wc01's WARC ingest proved green in-window round 9; relegated
    # round 10 in favor of wc05, the composed crawl pipeline that
    # SUBSUMES it (robots gate → the same WARC round trip → the same
    # HTML→text extraction → token count, all under one oracle) and
    # now also exercises the RFC 9309 parser.)
    # dd01's exact-hash dedup proved green in-window rounds 1–9;
    # relegated round 10 (pytest-verified — its groupBy-hash shape is
    # also q05_distinct's). Its slot carries wc06, the RFC 3986 URL
    # canonicalization gate (crawl-frontier keying), new this round —
    # rotated in immediately rather than lagging a round.
    "wc06_url_canonicalize", "dd03_minhash_lsh_pairs",
    # sk03's KLL gate proved green in-window rounds 7-9; relegated
    # round 10b (pytest-verified; sk01 HLL keeps the sketch row).
    # Its slot carries dd10, the composed dedup END: LSH pairs ->
    # connected-components closure -> canonical survivor, oracled by
    # a recursive reachability CTE.
    "wc05_crawl_pipeline", "dd10_dedup_canonical",
    # dd06's bounded crossJoin is subsumed by its own documented scale
    # path: dd09 SemDeDup (cluster-bounded pairwise cosine).
    # dd07 containment is dd04 jaccard's cousin (same inverted-index
    # machinery, different denominator) — relegated; its slot carries
    # the incremental index+probe shape (di01), a capability no other
    # dedup row demonstrates. dd07 stays oracle-verified by pytest.
    # dd09's embedding near-dup proved green in-window rounds 5-9;
    # relegated round 10b (pytest-verified; the embedding family
    # keeps ann03/ann04/di01 in-window). Its slot carries mm29, the
    # VISUAL near-dup operator: real decode -> DCT pHash with the
    # basis constants inlined into both engines.
    "mm29_phash", "di01_incremental_lsh",
    # text analysis (tx03 fingerprinting relegated past-window — its
    # slot goes to the audio modality; still oracle-verified by pytest)
    # tx02's heuristic quality/lang scores yield to the model-based
    # filter: qc01 trains a logistic regression IN the engine and its
    # oracle replays the whole GD loop (tx02 stays oracle-verified by
    # the workload differential suite)
    # tx01's basic text stats proved green in-window rounds 1-9;
    # relegated round 10b (pytest-verified — the weakest text row;
    # stats shapes also underlie qc01/qc02/qc03). Its slot carries
    # tx14, the strongest oracle class in the repo: Python
    # unicodedata vs DuckDB's independent ICU nfc_normalize — two
    # implementations of UAX #15 compared value-exact.
    "tx14_nfc_normalize", "qc01_quality_classifier",
    # tx04's whitespace/regex token counting is subsumed by the
    # corpus-trained BPE tokenizer gate (training + segmentation both
    # oracle-replayed)
    "tx06_bpe_tokenize",
    # similarity search (ann01 brute-force is the easier baseline —
    # relegated past-window, still oracle-verified by pytest; the two
    # scale-path variants LSH + IVF take the driver rows)
    "ann03_lsh_topk", "ann04_ivf_topk",
    # multimodal: mm07 is the Huffman-DCT JPEG gate — round 6 made it
    # decode BASELINE (even ids) and PROGRESSIVE SOF2 multi-scan (odd
    # ids) under one bit-exact oracle, the hardest entropy path in the
    # codec set, so it takes the image row. The audio row carries the
    # MP3 frame-header walk mm08 (ID3v2 syncsafe skip + per-frame
    # sync/VBR parse — the harder container path; mm05's RIFF/PCM16
    # sample decode relegated round 9, pytest-verified) and the video
    # row carries the MP4/H.264 metadata gate mm09 (ISO BMFF box walk
    # + Exp-Golomb SPS parse). mm04's four-format decode (bmp/ppm +
    # the REAL zlib/DEFLATE png and variable-width-LZW gif paths),
    # mm01/mm02/mm03 and the y4m video round trip mm06 relegated,
    # still oracle-verified by pytest.
    # mm08's MP3 frame-header walk proved green in-window round 9;
    # relegated round 10 (pytest-verified) — the audio row upgrades
    # to mm11, the REAL FLAC sample decode (Rice partitions +
    # escapes, CONSTANT/VERBATIM/FIXED/LPC subframes, stereo
    # decorrelation, CRC-8/16), the hardest entropy path of round 9.
    # mm07's JPEG decode proved green in-window rounds 6–9; relegated
    # round 10 (pytest-verified) — the image row upgrades to mm19,
    # the REAL WebP-lossless (VP8L) sample decode new this round
    # (prefix codes + LZ77 + color cache + meta groups + all four
    # inverse transforms), rotated in immediately.
    "mm19_webp_decode", "mm11_flac_decode", "mm09_mp4_meta",
    # time-series (ts02's row-frame moving aggregates are covered
    # in-window by nq08's window-function row; its slot carries the
    # streaming extension gate — a REAL readStream→memory-sink run
    # whose final state the oracle replays exactly. ts02 stays
    # oracle-verified by tests/test_workload.py.)
    # ts05 OHLC is another bucketed-agg flavor of ts01's downsample —
    # relegated (still oracle-verified by pytest); its slot carries the
    # stream-stream interval join st03, a streaming capability st01's
    # windowed agg doesn't demonstrate.
    # ts04 gap-fill is another bucketed-domain flavor — relegated
    # round 7 (pytest-verified); its slot carries the HLL sketch gate
    # whose oracle replays the registers, collisions and correction
    # branch value-exact (operators/sketches.py)
    # ts03's trapezoid integral proved green in-window rounds 4-9;
    # relegated round 10b (pytest-verified; ts keeps ts01 + both
    # streaming rows). Its slot carries mm27, the DSP front end:
    # Hann/rfft/mel with the O(N^2) DFT definition replayed in SQL.
    "ts01_downsample", "st01_stream_window_agg", "mm27_log_mel",
    "sk01_hll_distinct", "st03_stream_interval_join",
    # corpus curation (cleaning.py; tx05/pii01/sp01/sm01 are the
    # relegated, pytest-verified spellings of the same family)
    # cc02 runs cc01's cleaning AND the DSIR selection stage under
    # one oracle — the composed pipeline takes the window row
    "cx01_contamination", "cc02_curation_pipeline",
]                                                # exactly 50 entries


def _reorder() -> None:
    assert len(_PRIORITY_ORDER) == 50, len(_PRIORITY_ORDER)
    missing = [n for n in _PRIORITY_ORDER if n not in QUERIES]
    assert not missing, f"priority entries not registered: {missing}"
    tail = sorted(n for n in QUERIES if n not in _PRIORITY_ORDER)
    ordered = {n: QUERIES[n] for n in [*_PRIORITY_ORDER, *tail]}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()
