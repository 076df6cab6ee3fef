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

Round 13 rebuild: the round-12 newcomers (g08, ts14, cc04, tx17) and
the repaired tx09 rotate in, and a second rotation band swaps 16
long-green rows (q02/q03/q05/q06/q09/q11/q13-q15/q19/q20 green since
rounds 1-3; nq02/nq08/nq18, wd01/wd07, wc06, sk01, g06, mm29, tx16
green since rounds 4-9) for 16 never-windowed rows across the
sketch, streaming, time-series, dialect, web-corpus and shard
families. 20 first-time rows; never-windowed backlog 92 → 72.
"""

PRIORITY_ORDER = [
    # reference relational core — one per SURVEY §2.2/§2.3/§2.4 family
    "q01_scan_filter", "q04_time_range", "q07_countall",
    "q08_group_agg", "q10_median_stddev", "q16_join_two_dims",
    # dialect front-end (parser → binder → DataFrame)
    "nq25_dialect_asof_join", "nq09_dialect_window_frames",
    "nq11_dialect_setops", "nq12_dialect_exists",
    # shard/container ingestion
    "wd12_zarr_store", "wd02_zip_shards", "wd03_multimodal_samples",
    # documents
    "dc01_pdf_extract",
    # graph
    "g07_hyperball", "g08_kcore",
    # dedup / web corpus
    "wc08_registrable_domain", "wc02_link_extract",
    "wc03_robots_filter", "dd10_dedup_canonical", "ann11_maxsim",
    # text analysis / quality
    "qc01_quality_classifier", "qc04_banlist_scan",
    "tx09_unigram_tokenize", "tx17_unigram_segment",
    # similarity search
    "ann12_residual_quant", "ann10_binary_quant",
    # multimodal (image / audio / video, real sample decode + DSP)
    "mm34_webp_anim", "mm37_vp8_intra", "mm35_aiff_decode",
    "mm31_mp2_decode", "mm36_mp3_decode", "mm30_h264_ipcm",
    "mm33_mdct_roundtrip",
    # time-series + streaming
    "ts13_holt_linear", "ts14_cusum", "ts06_zscore",
    "ts08_gap_fill_interp", "ts09_asof_join",
    "st01_stream_window_agg", "st02_stream_session_window",
    "st03_stream_interval_join", "st04_stream_dedup",
    # sketches
    "sk02_cms_heavy_hitters", "sk03_kll_quantiles",
    "sk04_bloom_membership", "sk05_kmv_overlap",
    # corpus curation / mixing
    "dm02_temperature_mix", "cc03_pretrain_pipeline",
    "cc04_ppl_buckets",
]                                                # exactly 50 entries
