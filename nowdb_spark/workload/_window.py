"""The 50-row driver window (registration-order contract).

The correctness gate checks only the FIRST 50 registered queries, so
registration order IS the contract. The window is rebuilt each round
so every distinct operator family (reference relational core, graph,
dedup, text/quality, ANN, multimodal, documents, web-corpus, shard
containers, time-series, streaming, curation) keeps at least one row
inside it, and newly-built operators rotate in while long-green rows
rotate out. Relegated rows stay registered and remain fully
oracle-verified by tests/test_workload.py — only the driver row is
forgone. The per-row relegation rationale lives in PARITY.md
("Driver-window rotation log"), not here.

Round 14 rebuild (optimization round — rotation serves verification):
every row whose execution path changed this round rotates IN so the
driver itself re-verifies the optimized code (ts07 ewma→applyInArrow;
g01 pairs_from_groups reshape; dd02/dd02x hoisted MinHash folds;
ann01 hoisted topk exprs; q17/q22/q23 hoisted agg/window exprs;
mm38/mm39 share the optimized MP3 entropy decode that mm36 locks),
and 11 of the 21 rows rotated out in r13 (q02/q03/q05/q06/q09/q11/
q13/q14/q15/q19/q20 — VERDICT r13 item 6, ">=10") rotate back so no
path goes more than ~2 rounds driver-unverified. All 21 r13
newcomers keep their seats; 21 long-green rows relegate (each
family keeps >=1 row; q08/q10/q16/mm36/mm37 already in-window cover
the remaining changed paths).
"""

PRIORITY_ORDER = [
    # reference relational core — incl. the r13-relegated band back
    # for its 2-round re-verify, and the r14-hoisted q17/q22/q23
    "q01_scan_filter", "q02_point_lookup", "q03_in_list",
    "q05_distinct", "q06_count_by_key", "q08_group_agg",
    "q09_global_agg", "q10_median_stddev", "q11_order_topk",
    "q13_time_extract", "q14_null_semantics", "q15_join_origin",
    "q16_join_two_dims", "q17_degree", "q19_semi_join",
    "q20_anti_join", "q22_sessionize", "q23_asof_view_before_purchase",
    # dialect front-end (parser → binder → DataFrame)
    "nq09_dialect_window_frames", "nq11_dialect_setops",
    "nq12_dialect_exists",
    # shard/container ingestion
    "wd02_zip_shards", "wd03_multimodal_samples",
    # documents
    "dc01_pdf_extract",
    # graph — g01 carries the r14 pairs_from_groups reshape
    "g01_cosupply_pairs", "g08_kcore",
    # web corpus
    "wc02_link_extract", "wc03_robots_filter",
    # dedup — both MinHash fold backends carry the r14 expr hoist
    "dd02_minhash_signature", "dd02x_minhash_xxhash",
    # text analysis / quality
    "qc01_quality_classifier",
    "tx09_unigram_tokenize", "tx17_unigram_segment",
    # similarity search — ann01 carries the r14 expr hoist
    "ann01_bruteforce_topk",
    # multimodal — mm36/37 lock the r14 entropy-decode speedups,
    # mm38/39 share the same decode_frames path
    "mm36_mp3_decode", "mm37_vp8_intra", "mm38_mp3_reservoir",
    "mm39_mp3_ms_stereo",
    # time-series + streaming — ts07 carries the applyInArrow port
    "ts07_ewma", "ts14_cusum", "ts06_zscore",
    "ts08_gap_fill_interp", "ts09_asof_join",
    "st02_stream_session_window", "st04_stream_dedup",
    # sketches
    "sk02_cms_heavy_hitters", "sk03_kll_quantiles",
    "sk04_bloom_membership", "sk05_kmv_overlap",
    # corpus curation / mixing
    "cc04_ppl_buckets",
]                                                # exactly 50 entries
