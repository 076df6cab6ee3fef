"""JPEG codec tests (baseline + progressive): exactness guarantees,
lossy tolerances, Huffman/marker edge cases, honest rejections."""

from __future__ import annotations

import struct

import pytest

from nowdb_spark.operators.jpegcodec import make_jpeg_codec

C = make_jpeg_codec()


def _maxerr_gray(decoded, rows):
    return max(abs(decoded["rows"][y][x][0] - rows[y][x])
               for y in range(len(rows)) for x in range(len(rows[0])))


def test_uniform_gray_unit_quant_bit_exact():
    """DC-only blocks with unit tables round-trip exactly — the
    property the mm07 oracle relies on."""
    for v in (0, 1, 127, 128, 137, 254, 255):
        rows = [[v] * 13 for _ in range(9)]       # non-multiple-of-8
        d = C.decode(C.encode_gray(13, 9, rows, unit_quant=True))
        assert d["rows"] == [[(v, v, v)] * 13 for _ in range(9)]
        assert (d["width"], d["height"]) == (13, 9)


def test_gradient_unit_quant_tight():
    w, h = 24, 17
    rows = [[(3 * x + 7 * y) % 256 for x in range(w)] for y in range(h)]
    d = C.decode(C.encode_gray(w, h, rows, unit_quant=True))
    assert _maxerr_gray(d, rows) <= 1


def test_standard_tables_lossy_but_close():
    """Smooth ramp (no sawtooth wraps — those legitimately ring under
    coarse quantization) stays close under the Annex K tables."""
    w, h = 32, 24
    rows = [[x * 3 + y * 2 + 20 for x in range(w)] for y in range(h)]
    b = C.encode_gray(w, h, rows)                 # Annex K tables
    d = C.decode(b)
    assert _maxerr_gray(d, rows) <= 24            # quantization loss
    # compression actually happened vs raw
    assert len(b) < w * h


def test_rgb_444_roundtrip():
    w, h = 16, 16
    rows = [[((3 * x + y) % 256, (x + 5 * y) % 256, (x * y) % 256)
             for x in range(w)] for y in range(h)]
    d = C.decode(C.encode_rgb(w, h, rows, unit_quant=True))
    assert d["n_components"] == 3
    err = max(abs(d["rows"][y][x][c] - rows[y][x][c])
              for y in range(h) for x in range(w) for c in range(3))
    assert err <= 2                               # YCbCr rounding


def test_sparse_block_exercises_zrl():
    """A single bright pixel at the block's end forces long zero runs
    (ZRL codes) in the AC stream."""
    rows = [[0] * 8 for _ in range(8)]
    rows[7][7] = 255
    d = C.decode(C.encode_gray(8, 8, rows, unit_quant=True))
    assert abs(d["rows"][7][7][0] - 255) <= 1
    assert abs(d["rows"][0][0][0] - 0) <= 1


def test_meta_without_full_decode():
    b = C.encode_gray(10, 4, [[9] * 10] * 4, unit_quant=True)
    m = C.decode_meta(b)
    assert (m["width"], m["height"], m["n_components"]) == (10, 4, 1)


def test_lossless_and_hierarchical_rejected():
    b = bytearray(C.encode_gray(8, 8, [[1] * 8] * 8))
    i = b.index(b"\xFF\xC0")
    for sof in (0xC3, 0xC7, 0xCB, 0xCF):          # lossless/hier/etc
        b[i + 1] = sof
        assert C.decode(bytes(b)) is None


# ------------------------------------------------------------------
# Arithmetic coding (SOF9 + DAC, T.81 Annex D QM coder + F.2 models)


def test_arith_gray_matches_progressive_twin():
    """The arithmetic encoder shares _coef_blocks with the
    progressive encoder, so their decodes must agree bit-for-bit —
    this pins the whole QM layer (state table, conditional exchange,
    carry/stacked-FF byteout, DC contexts, AC bin groups)."""
    import random
    rng = random.Random(42)
    for w, h in [(8, 8), (17, 9), (33, 31), (64, 48)]:
        rows = [[rng.randrange(256) for _ in range(w)]
                for _ in range(h)]
        ga = C.decode(C.encode_gray_arith(w, h, rows,
                                          unit_quant=True))
        gp = C.decode(C.encode_progressive_gray(w, h, rows,
                                                unit_quant=True))
        assert ga is not None and ga["rows"] == gp["rows"], (w, h)


@pytest.mark.parametrize("sampling", ["444", "422", "420"])
def test_arith_color_matches_progressive_twin(sampling):
    w, h = 37, 26
    rows = [[((3 * x + y) % 256, (x * x + 7 * y) % 256,
              (255 - x * y) % 256) for x in range(w)]
            for y in range(h)]
    for uq in (True, False):
        ga = C.decode(C.encode_rgb_arith(w, h, rows, unit_quant=uq,
                                         sampling=sampling))
        gp = C.decode(C.encode_progressive_rgb(
            w, h, rows, unit_quant=uq, sampling=sampling))
        assert ga is not None and ga["rows"] == gp["rows"], uq


def test_arith_restart_intervals():
    """RSTn in arithmetic scans resets the coder, the statistics
    areas, DC predictions and contexts (F.1.4.4.3)."""
    import random
    rng = random.Random(9)
    w, h = 48, 32
    rows = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    base = C.decode(C.encode_gray_arith(w, h, rows, unit_quant=True))
    for dri in (1, 2, 5):
        ga = C.decode(C.encode_gray_arith(w, h, rows,
                                          unit_quant=True, dri=dri))
        assert ga is not None and ga["rows"] == base["rows"], dri


def test_arith_beats_huffman_on_smooth_content():
    w, h = 64, 64
    rows = [[(x + y) % 256 for x in range(w)] for y in range(h)]
    assert len(C.encode_gray_arith(w, h, rows)) < len(
        C.encode_gray(w, h, rows))


def test_arith_corruption_and_truncation_safe():
    b = C.encode_gray_arith(
        16, 16, [[x * y % 256 for x in range(16)] for y in range(16)],
        unit_quant=True)
    for cut in (10, 50, len(b) // 2, len(b) - 3):
        C.decode(b[:cut])                         # must not raise
    bad = bytearray(b)
    bad[len(b) // 2] ^= 0xFF
    C.decode(bytes(bad))
    assert C.decode_meta(b)["width"] == 16        # SOF9 meta


def test_qm_coder_bit_level_fuzz():
    """Raw QM coder over random adaptive contexts: every decoded bit
    equals the encoded bit, across renorms, carries and stacked-FF
    resolution. Uses biased streams to reach renorm-free MPS runs."""
    import random
    rng = random.Random(1)
    for trial in range(40):
        n = rng.randrange(1, 2000)
        nbins = rng.randrange(1, 8)
        bits = [(rng.randrange(nbins), rng.randrange(2))
                for _ in range(n)]
        if trial % 3 == 0:
            bits = [(i, 0 if rng.random() < 0.95 else 1)
                    for i, _ in bits]
        enc = C._ArithEnc()
        st_e = C._stats(nbins)
        for i, bit in bits:
            enc.encode(st_e, i, bit)
        data = enc.finish() + b"\xff\xd9"
        dec = C._ArithDec(data, 0)
        st_d = C._stats(nbins)
        for j, (i, bit) in enumerate(bits):
            assert dec.decode(st_d, i) == bit, (trial, j)


def test_arith_property_random_images():
    """Hypothesis sweep: arithmetic and progressive decodes agree on
    arbitrary gradient-noise content and geometry."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(st.integers(1, 3000), st.integers(6, 30), st.integers(6, 24))
    def prop(seed, w, h):
        rows = [[(x * 31 + y * 17 + seed * 53) % 256
                 for x in range(w)] for y in range(h)]
        ga = C.decode(C.encode_gray_arith(w, h, rows,
                                          unit_quant=True))
        gp = C.decode(C.encode_progressive_gray(w, h, rows,
                                                unit_quant=True))
        assert ga is not None and ga["rows"] == gp["rows"]

    prop()


def test_progressive_gray_matches_baseline():
    """SOF2 multi-scan decode (DC first/refine, AC spectral bands,
    successive-approximation refinements) reconstructs the identical
    coefficients, so pixels match the baseline decode exactly."""
    w, h = 24, 17
    rows = [[(3 * x + 7 * y) % 256 for x in range(w)] for y in range(h)]
    dp = C.decode(C.encode_progressive_gray(w, h, rows,
                                            unit_quant=True))
    db = C.decode(C.encode_gray(w, h, rows, unit_quant=True))
    assert dp["rows"] == db["rows"]
    assert _maxerr_gray(dp, rows) <= 1


@pytest.mark.parametrize("sampling", ["444", "422", "420"])
def test_progressive_color_matches_baseline(sampling):
    """Pad-block geometry differs between interleaved DC scans (full
    MCU grid) and non-interleaved AC scans (component's own ceil/8
    grid) — odd dims across all samplings cover both."""
    w, h = 20, 15
    rows = [[((x * 11) % 256, (y * 13) % 256, ((x + y) * 7) % 256)
             for x in range(w)] for y in range(h)]
    for uq in (True, False):
        dp = C.decode(C.encode_progressive_rgb(
            w, h, rows, unit_quant=uq, sampling=sampling))
        db = C.decode(C.encode_rgb(
            w, h, rows, unit_quant=uq, sampling=sampling))
        assert dp is not None and dp["rows"] == db["rows"]


def test_progressive_meta_and_dispatch():
    from nowdb_spark.operators.imagecodec import make_image_codec

    ic = make_image_codec()
    b = C.encode_progressive_gray(6, 5, [[200] * 6] * 5,
                                  unit_quant=True)
    assert ic.sniff(b) == "jpeg"
    assert ic.decode_meta(b)["width"] == 6
    assert ic.decode(b)["rows"][0][0] == (200, 200, 200)


@pytest.mark.parametrize("sampling,tol", [("444", 2), ("422", 40),
                                          ("420", 40)])
def test_chroma_subsampling_roundtrip(sampling, tol):
    """4:2:2 / 4:2:0: chroma is box-downsampled then replication-
    upsampled, so smooth chroma stays within tolerance while luma
    stays tight."""
    w, h = 19, 14                                 # odd dims on purpose
    rows = [[(min(255, x * 6 + 40), min(255, y * 7 + 30),
              min(255, x * 3 + y * 3 + 20)) for x in range(w)]
            for y in range(h)]
    d = C.decode(C.encode_rgb(w, h, rows, unit_quant=True,
                              sampling=sampling))
    err = max(abs(d["rows"][y][x][c] - rows[y][x][c])
              for y in range(h) for x in range(w) for c in range(3))
    assert err <= tol, err
    # luma alone must stay tight even when chroma is subsampled
    lum = max(abs(sum(d["rows"][y][x]) / 3 - sum(rows[y][x]) / 3)
              for y in range(h) for x in range(w))
    assert lum <= 16


def test_restart_intervals_roundtrip():
    """DRI/RSTn: encoder emits a restart every 2 MCUs, decoder must
    re-sync and reset DC prediction."""
    w, h = 40, 24                                 # 15 MCUs at 8x8
    rows = [[(x * 11 + y * 5) % 256 for x in range(w)]
            for y in range(h)]
    b = C.encode_gray(w, h, rows, unit_quant=True, dri=2)
    assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
    assert _maxerr_gray(C.decode(b), rows) <= 1
    # color + subsampling + restarts together
    rows3 = [[(min(255, x * 9), min(255, y * 8), 128)
              for x in range(w)] for y in range(h)]
    b3 = C.encode_rgb(w, h, rows3, unit_quant=True, sampling="420",
                      dri=1)
    assert C.decode(b3) is not None


def test_corrupt_restart_rejected():
    b = bytearray(C.encode_gray(40, 24,
                                [[(x + y) % 256 for x in range(40)]
                                 for y in range(24)],
                                unit_quant=True, dri=2))
    i = next(j for j in range(len(b) - 1)
             if b[j] == 0xFF and 0xD0 <= b[j + 1] <= 0xD7)
    b[i + 1] = 0xD9                               # RST -> EOI
    assert C.decode(bytes(b)) is None


def test_truncation_and_garbage():
    b = C.encode_gray(8, 8, [[7] * 8] * 8, unit_quant=True)
    assert C.decode(b[:20]) is None
    assert C.decode(b"\xFF\xD8\xFF\xFE" + b"\x00\x04garbage") is None
    assert C.sniff(b"BM......") is None


def test_byte_stuffing_roundtrip():
    """Content chosen to produce 0xFF bytes in the entropy stream —
    the unstuffing path must reconstruct it. (Run over many seeds so
    at least some streams contain stuffed bytes.)"""
    hit = False
    for seed in range(12):
        w, h = 16, 16
        rows = [[(x * 31 + y * 17 + seed * 53) % 256
                 for x in range(w)] for y in range(h)]
        b = C.encode_gray(w, h, rows, unit_quant=True)
        body = b[b.index(b"\xFF\xDA") + 2:-2]
        if b"\xFF\x00" in body:
            hit = True
        assert _maxerr_gray(C.decode(b), rows) <= 1
    assert hit


def test_decodes_through_image_codec_dispatch():
    from nowdb_spark.operators.imagecodec import make_image_codec

    ic = make_image_codec()
    b = C.encode_gray(6, 5, [[200] * 6] * 5, unit_quant=True)
    assert ic.sniff(b) == "jpeg"
    assert ic.decode_meta(b)["width"] == 6
    assert ic.decode(b)["rows"][0][0] == (200, 200, 200)


def test_progressive_random_content_property():
    """Randomized content/geometry sweep: progressive and baseline
    encode different entropy streams of the SAME quantized
    coefficients, so their decodes must agree pixel-for-pixel. Random
    pixels drive the refinement paths (correction bits, ZRL-in-refine,
    EOB runs) through states gradient fixtures never reach."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.integers(1, 3000), st.integers(6, 26), st.integers(6, 22),
           st.sampled_from(["444", "422", "420"]))
    def prop(seed, w, h, sampling):
        rows = [[(((x * 31 + y * 17 + seed * 53) % 256),
                  ((x * 7 + y * 29 + seed * 11) % 256),
                  ((x * 13 + y * 3 + seed * 97) % 256))
                 for x in range(w)] for y in range(h)]
        dp = C.decode(C.encode_progressive_rgb(w, h, rows,
                                               unit_quant=True,
                                               sampling=sampling))
        db = C.decode(C.encode_rgb(w, h, rows, unit_quant=True,
                                   sampling=sampling))
        assert dp is not None and db is not None
        assert dp["rows"] == db["rows"]

    prop()
