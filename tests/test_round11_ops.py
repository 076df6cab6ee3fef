"""Round-11 operators: MaxSim late interaction, registrable-domain
(PSL eTLD+1), Kneser-Ney bigram LM, MDCT/TDAC primitive."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from nowdb_spark.operators import similarity as S
from tests.conftest import SF_DIR


def test_maxsim_matches_naive(spark):
    """maxsim_topk == a driver-side numpy recompute of
    sum-of-max-cosines on the same token bags."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(60)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    toks = emb.select((F.col("vec_id") / 5).cast("long")
                      .alias("doc_id"), "vec_id", "embedding")
    q = (toks.filter(F.col("doc_id") == 0)
         .select(F.col("vec_id").alias("qtok_id"),
                 F.col("embedding").alias("qvec")))
    got = {r["doc_id"]: (r["score"], r["rnk"]) for r in
           S.maxsim_topk(toks.filter(F.col("doc_id") != 0), q,
                         k=5).collect()}

    def cos(a, b):
        return round(float(a @ b)
                     / (np.linalg.norm(a) * np.linalg.norm(b)), 6)

    qs = [v for i, v in rows.items() if i < 5]
    scores = {}
    for d in {i // 5 for i in rows} - {0}:
        bag = [v for i, v in rows.items() if i // 5 == d]
        scores[d] = round(sum(max(cos(qv, dv) for dv in bag)
                              for qv in qs), 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == {d: (s, r + 1) for r, (d, s) in enumerate(want)}


def test_registrable_domain_rule_classes(spark):
    from nowdb_spark.sources.warc import registrable_domain
    cases = [
        ("www.example.com", "example.com"),        # normal 1-label
        ("a.b.example.co.uk", "example.co.uk"),    # normal 2-label
        ("user.github.io", "user.github.io"),      # private entry
        ("x.y.ck", "x.y.ck"),                      # wildcard *.ck
        ("y.ck", None),                            # IS a public suffix
        ("www.ck", "www.ck"),                      # exception rule
        ("co.uk", None),                           # bare suffix
        ("com", None),                             # bare TLD
        ("host.unknowntld", "host.unknowntld"),    # default '*' rule
        ("unknowntld", None),
        ("WWW.Example.COM", "example.com"),        # case folding
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["reg"] for r in
           df.select(registrable_domain(F.col("host")).alias("reg"))
           .collect()]
    assert got == [want for _, want in cases]


def test_kneser_ney_matches_naive(spark):
    """kneser_ney_bigram_scores == a dict-based KN recompute."""
    from nowdb_spark.operators.corpus import kneser_ney_bigram_scores
    docs = [(0, "a b a b c"), (1, "a b c d"), (2, "b c b c"),
            (3, "d a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
           for r in kneser_ney_bigram_scores(df).collect()}

    bgs = {}
    for _, t in docs:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            bgs[(a, b)] = bgs.get((a, b), 0) + 1
    cx = {}
    nf = {}
    npr = {}
    for (a, b), c in bgs.items():
        cx[a] = cx.get(a, 0) + c
        nf[a] = nf.get(a, 0) + 1
        npr[b] = npr.get(b, 0) + 1
    nt = float(len(bgs))
    want = {}
    for did, t in docs:
        ws = t.split(" ")
        lps = []
        for a, b in zip(ws, ws[1:]):
            p = (max(bgs[(a, b)] - 0.75, 0.0) / cx[a]
                 + (0.75 * nf[a] / cx[a]) * (npr[b] / nt))
            lps.append(math.log(p))
        want[did] = (len(lps), round(sum(lps) / len(lps), 6))
    assert got == want


def test_kn_probabilities_normalize():
    """Interpolated KN must be a proper distribution: for a fixed w1,
    sum over the observed-vocabulary continuation of P(w2|w1) with
    the continuation unigram restricted to observed types sums to 1
    when every w2 type is enumerated."""
    bgs = {("a", "b"): 3, ("a", "c"): 1, ("b", "a"): 2,
           ("c", "a"): 1, ("b", "c"): 1}
    cx = {}
    nf = {}
    npr = {}
    for (a, b), c in bgs.items():
        cx[a] = cx.get(a, 0) + c
        nf[a] = nf.get(a, 0) + 1
        npr[b] = npr.get(b, 0) + 1
    nt = float(len(bgs))
    vocab = {b for _, b in bgs}
    for w1 in cx:
        tot = sum((max(bgs.get((w1, w2), 0) - 0.75, 0.0) / cx[w1]
                   + (0.75 * nf[w1] / cx[w1]) * (npr[w2] / nt))
                  for w2 in vocab)
        # Pcont sums to sum(npr)/nt over the vocab = 1 by definition
        assert abs(tot - 1.0) < 1e-12, (w1, tot)


def test_mdct_roundtrip_rows(spark):
    """mm33's kernel: reconstruction segment sums equal the
    closed-form input sums (TDAC PR), spectral sums finite."""
    from nowdb_spark.operators.dsp import mdct_roundtrip_real
    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    out = mdct_roundtrip_real(ids).collect()
    assert out
    for r in out:
        did, f = r["doc_id"], r["frame"]
        h = did % 5 + 3
        if f < h - 2:
            seg = sum(((did * 7 + (18 * (f + 1) + i) * 13) % 2001)
                      - 1000 for i in range(18))
            assert r["recon_sum"] == round(float(seg), 3), r
        else:
            assert r["recon_sum"] is None
        assert r["spec_abs_sum"] >= abs(r["spec_sum"])


def test_webp_anim_iccp_container_roundtrip():
    """encode_extended(anim_frames, icc) -> parse_extended recovers
    ANIM bg/loop, every ANMF header field, the ICC header, and the
    frames' VP8L pixels exactly."""
    from nowdb_spark.operators.webpcodec import make_webp_codec
    c = make_webp_codec()
    frames = []
    for f in range(3):
        px = [0xFF000000
              | (((f * 40 + x * 7 + y * 11) % 256) << 16)
              | (((x + y) % 256) << 8) | (f % 256)
              for y in range(4) for x in range(4)]
        frames.append({"x": 2 * (f % 2), "y": 2 * (f // 2),
                       "w": 4, "h": 4, "pixels": px,
                       "duration_ms": 40 + f * 10,
                       "blend": f % 2 == 0, "dispose_bg": f == 0})
    b = c.encode_extended([], 6, 6,
                          icc=c.synth_icc("mntr", "RGB ", 7),
                          anim_frames=frames,
                          anim_bg=(9, 0, 255, 255), anim_loops=3)
    m = c.parse_extended(b)
    assert m["flags"]["anim"] and m["flags"]["icc"]
    assert m["anim"] == {"bg_bgra": (9, 0, 255, 255),
                         "loop_count": 3}
    assert m["icc"]["device_class"] == "mntr"
    assert m["icc"]["color_space"] == "RGB"
    assert m["icc"]["profile_size"] == 128 + 4 + 7
    assert len(m["frames"]) == 3
    for f, fr in enumerate(m["frames"]):
        assert (fr["x"], fr["y"]) == (2 * (f % 2), 2 * (f // 2))
        assert fr["duration_ms"] == 40 + f * 10
        assert fr["blend"] == (f % 2 == 0)
        assert fr["dispose_bg"] == (f == 0)
        exp = [((f * 40 + x * 7 + y * 11) % 256, (x + y) % 256,
                f % 256) for y in range(4) for x in range(4)]
        assert [t for row in fr["image"]["rows"] for t in row] == exp


def test_webp_anim_odd_offset_rejected():
    import pytest as _pytest

    from nowdb_spark.operators.webpcodec import make_webp_codec
    c = make_webp_codec()
    fr = {"x": 1, "y": 0, "w": 2, "h": 2,
          "pixels": [0xFF000000] * 4}
    with _pytest.raises(ValueError):
        c.encode_extended([], 4, 4, anim_frames=[fr])


def test_webp_still_path_unchanged():
    """The pre-existing still VP8X path (mm20's shape) is untouched
    by the animation extension."""
    from nowdb_spark.operators.webpcodec import make_webp_codec
    c = make_webp_codec()
    px = [0xFF000000 | (x << 16 | y) for y in range(4)
          for x in range(4)]
    b = c.encode_extended(px, 4, 4, xmp="<x/>")
    m = c.parse_extended(b)
    assert m["frames"] == [] and m["anim"] is None
    assert m["image"] is not None and m["xmp"] == "<x/>"


def test_holt_linear_matches_scalar_fold(spark):
    """holt_linear == the textbook recurrence run driver-side."""
    from nowdb_spark.operators.timeseries import holt_linear
    rows = [("a", i * 1_000_000_000, float((i * 7) % 13))
            for i in range(25)] + \
           [("b", i * 1_000_000_000, float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    got = {r["k"]: (r["n_buckets"], r["level"], r["trend"],
                    r["forecast_1"])
           for r in holt_linear(df, "ts", "v", 5_000_000_000,
                                alpha=0.4, beta=0.3,
                                key_col="k").collect()}
    # alpha must not be dyadic (the ts07 lesson): 0.5 over these
    # fixed-decimal inputs lands values exactly on 6dp rounding
    # boundaries where Spark round (HALF_UP) and Python round
    # (half-even) disagree
    a, b_ = 0.4, 0.3
    one_a, ba, one_ba = 1.0 - a, b_ * a, 1.0 - b_ * a
    for k in ("a", "b"):
        series = {}
        for kk, ts, v in rows:
            if kk != k:
                continue
            bkt = ts - ts % 5_000_000_000
            series[bkt] = series.get(bkt, 0.0) + v
        xs = [v for _, v in sorted(series.items())]
        l, bb = xs[0], 0.0
        for x in xs[1:]:
            l, bb = (a * x + one_a * l + one_a * bb,
                     ba * x - ba * l + one_ba * bb)
        assert got[k] == (len(xs), round(l, 6), round(bb, 6),
                          round(l + bb, 6)), k


def test_holt_linear_form_equals_textbook():
    """The expanded linear recurrence IS Holt's l/b update."""
    import random
    rng = random.Random(4)
    a, b_ = 0.5, 0.3
    l = rng.random()
    bb = rng.random()
    l2, b2 = l, bb
    for _ in range(50):
        x = rng.random() * 100
        # textbook
        l_new = a * x + (1 - a) * (l + bb)
        bb = b_ * (l_new - l) + (1 - b_) * bb
        l = l_new
        # expanded
        l2, b2 = (a * x + (1 - a) * l2 + (1 - a) * b2,
                  b_ * a * x - b_ * a * l2 + (1 - b_ * a) * b2)
        assert abs(l - l2) < 1e-9 and abs(bb - b2) < 1e-9


def test_hyperball_round0_and_accuracy(spark):
    """HyperBall on a known graph: a path 0-1-2-3-4 plus an isolated
    clique — 2-hop ball sizes are exact small sets, so the linear-
    counting branch makes the estimate ≈ exact (small-range HLL is
    near-exact at these cardinalities)."""
    from nowdb_spark.operators.graph import hyperball
    edges = [(0, 1), (1, 2), (2, 3), (3, 4),
             (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["estimate"]
           for r in hyperball(df, rounds=2).collect()}
    exact = {0: 3, 1: 4, 2: 5, 3: 4, 4: 3, 10: 3, 11: 3, 12: 3}
    assert set(got) == set(exact)
    for n, e in exact.items():
        assert abs(got[n] - e) / e < 0.35, (n, got[n], e)


def test_temperature_mix_weights(spark):
    from nowdb_spark.workload import QUERIES
    out = QUERIES["dm02_temperature_mix"].spark(
        spark, SF_DIR).collect()
    assert out
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-4
    # tau < 1 flattens: max/min weight ratio < max/min count ratio
    ws = sorted(r["weight"] for r in out)
    ns = sorted(r["n_docs"] for r in out)
    if ns[0] < ns[-1]:
        assert ws[-1] / ws[0] < ns[-1] / ns[0] + 1e-9


def test_zarr_zipstore_roundtrip_and_gates():
    import io
    import json
    import zipfile

    import pytest as _pytest

    from nowdb_spark.sources.zarrstore import (decode_zarr_zipstore,
                                               encode_zarr_zipstore)
    arr = np.arange(35, dtype="<i8").reshape(5, 7) - 10
    for comp in (None, "zlib"):
        m = decode_zarr_zipstore(
            encode_zarr_zipstore(arr, (2, 3), compressor=comp))
        assert m["shape"] == (5, 7) and m["n_chunks_stored"] == 9
        assert (m["values"] == arr).all()
    # sparse store: a dropped chunk reads back as fill_value
    m = decode_zarr_zipstore(
        encode_zarr_zipstore(arr, (2, 3), drop_chunks={"1.1"}))
    exp = arr.copy()
    exp[2:4, 3:6] = 0
    assert (m["values"] == exp).all() and m["n_chunks_stored"] == 8
    # float dtype through zlib
    af = (np.arange(12, dtype="<f4") / 4).reshape(3, 4)
    m = decode_zarr_zipstore(
        encode_zarr_zipstore(af, (2, 2), compressor="zlib"))
    assert np.allclose(m["values"], af) and m["dtype"] == "<f4"
    # honest gates: v3, exotic compressor
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(".zarray", json.dumps({"zarr_format": 3}))
    with _pytest.raises(NotImplementedError):
        decode_zarr_zipstore(buf.getvalue())
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(".zarray", json.dumps(
            {"zarr_format": 2, "shape": [2], "chunks": [2],
             "dtype": "<i8", "compressor": {"id": "blosc"}}))
    with _pytest.raises(NotImplementedError):
        decode_zarr_zipstore(buf.getvalue())


def test_aiff_codec_roundtrip():
    from nowdb_spark.operators.audiocodec import make_audio_codec
    c = make_audio_codec()
    for r in (8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000):
        assert c.ext80_to_rate(c.rate_to_ext80(r)) == r, r
    # the canonical 44100 ext80 bytes: 0x400E AC44 0000 0000 0000
    assert c.rate_to_ext80(44100) == bytes(
        [0x40, 0x0E, 0xAC, 0x44, 0, 0, 0, 0, 0, 0])
    samples = [((i * 37) % 4001) - 2000 for i in range(51)]
    b = c.encode_aiff(samples, rate=22050)
    assert c.audio_sniff(b) == "aiff"
    assert c.aiff_decode(b)["samples"] == samples
    f = c.features(b)
    assert f["fmt"] == "aiff" and f["n_samples"] == 51
    assert f["sq_sum"] == sum(s * s for s in samples)
    assert c.aiff_decode(b[:20]) is None
    # WAV payloads still route through the RIFF path
    wav = c.encode_wav(b"".join(
        int(s).to_bytes(2, "little", signed=True)
        for s in samples[:10]), rate=8000)
    assert c.features(wav)["fmt"].startswith("wav")


def test_zarr_float_store_gated_in_checksum_reader(spark):
    """read_zarr_zipstores emits LONG checksums; a float store must
    be an honest gate, not a silent truncation (ADVICE r11)."""
    import pytest as _pytest

    from nowdb_spark.sources.zarrstore import (encode_zarr_zipstore,
                                               read_zarr_zipstores)
    af = (np.arange(12, dtype="<f4") / 4).reshape(3, 4)
    df = spark.createDataFrame(
        [(1, bytearray(encode_zarr_zipstore(af, (2, 2))))],
        "doc_id long, payload binary")
    with _pytest.raises(Exception, match="float"):
        read_zarr_zipstores(df).collect()
