"""DSP front end: mel filterbank construction + log-mel kernel."""

import math

import numpy as np

from nowdb_spark.operators import dsp
from nowdb_spark.operators.audiocodec import make_audio_codec


def test_mel_filterbank_shape_and_triangles():
    fb = np.array(dsp.mel_filterbank())
    assert fb.shape == (4, 9)
    # every filter peaks at exactly 1 somewhere OR straddles bins with
    # positive weight; weights are in [0, 1]
    assert (fb >= 0).all() and (fb <= 1).all()
    # filters are ordered: the weighted mean bin index increases
    centers = [(row * np.arange(9)).sum() / row.sum() for row in fb]
    assert centers == sorted(centers)
    # edge construction: filter 1 rises then falls (unimodal)
    row = fb[1]
    peak = row.argmax()
    assert (np.diff(row[:peak + 1]) >= 0).all()
    assert (np.diff(row[peak:]) <= 0).all()


def test_hann_window_periodic():
    w = dsp.hann_window()
    assert w[0] == 0.0
    assert abs(w[8] - 1.0) < 1e-12          # peak at n/2
    for i in range(1, 8):                   # periodic symmetry
        assert abs(w[i] - w[16 - i]) < 1e-12


def test_log_mel_matches_naive_dft(spark):
    # one known clip: the kernel's rfft path must match the O(N²)
    # DFT definition with the same window/filterbank constants
    did = 7
    n = did % 50 + 10                        # 17 samples → 1 frame
    samples = [((did * 7 + i * 13) % 4001) - 2000 for i in range(n)]
    codec = make_audio_codec()
    wav = codec.encode_wav(samples, rate=8000, bits=16)
    df = spark.createDataFrame([(did, bytearray(wav))],
                               "doc_id long, payload binary")
    rows = {(r["frame"], r["band"]): r["logmel"]
            for r in dsp.log_mel_real(df).collect()}
    assert len(rows) == 4                    # 1 frame × 4 bands

    w = dsp.hann_window()
    fb = dsp.mel_filterbank()
    xs = [samples[i] * w[i] for i in range(16)]
    power = []
    for k in range(9):
        re = sum(xs[i] * math.cos(2 * math.pi * k * i / 16.0)
                 for i in range(16))
        im = sum(xs[i] * math.sin(2 * math.pi * k * i / 16.0)
                 for i in range(16))
        power.append(re * re + im * im)
    for b in range(4):
        expect = math.log10(1.0 + sum(fb[b][k] * power[k]
                                      for k in range(9)))
        assert abs(rows[(0, b)] - round(expect, 3)) < 1e-9


def test_log_mel_short_clip_emits_nothing(spark):
    codec = make_audio_codec()
    wav = codec.encode_wav([100] * 10, rate=8000, bits=16)  # < 16
    df = spark.createDataFrame([(1, bytearray(wav))],
                               "doc_id long, payload binary")
    assert dsp.log_mel_real(df).count() == 0


def test_log_mel_frame_count(spark):
    codec = make_audio_codec()
    wav = codec.encode_wav(list(range(40)), rate=8000, bits=16)
    df = spark.createDataFrame([(1, bytearray(wav))],
                               "doc_id long, payload binary")
    out = dsp.log_mel_real(df).collect()
    # (40-16)//8+1 = 4 frames × 4 bands
    assert len(out) == 16
    assert {r["frame"] for r in out} == {0, 1, 2, 3}


def test_dct8_basis_orthonormal():
    C = np.array(dsp.dct8_basis())
    np.testing.assert_allclose(C @ C.T, np.eye(8), atol=1e-12)


def test_phash_clone_collision_and_sensitivity(spark):
    from nowdb_spark.operators.imagecodec import make_image_codec
    from nowdb_spark.operators.multimodal import phash_real

    codec = make_image_codec()

    def img(seed, flip_one_pixel=False):
        rows = [[((seed * 3 + 5 * x + 7 * y) % 256,
                  (seed + x) % 256, (seed * x * y) % 256)
                 for x in range(16)] for y in range(16)]
        if flip_one_pixel:
            # a large local change: pHash is robust to small noise
            # but a 255-luma block flip must move SOME coefficient
            rows[0] = [(255, 255, 255)] * 16
        return codec.encode_png(16, 16, rows)

    df = spark.createDataFrame(
        [(0, bytearray(img(9))), (1, bytearray(img(9))),
         (2, bytearray(img(40))), (3, bytearray(img(9, True))),
         (4, bytearray(codec.encode_bmp(2, 2, [[(0, 0, 0)] * 2] * 2)))],
        "doc_id long, payload binary")
    out = {r["doc_id"]: r["phash"] for r in phash_real(df).collect()}
    assert out[0] == out[1]                 # exact clone collides
    assert len(out[0]) == 63 and set(out[0]) <= {"0", "1"}
    assert out[0] != out[2]                 # different structure
    assert out[0] != out[3]                 # whole-row wipe changes it
    assert out[4] is None                   # non-16x16 contract
