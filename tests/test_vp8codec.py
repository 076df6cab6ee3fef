"""Lossy VP8 intra codec: boolean-coder round trips, token/mode
trees, integer transform identities, reconstruction, gates.

Reference parity note: the reference engine has no media handling
(SURVEY §2 extension family); the layout follows public RFC 6386 —
see operators/vp8codec.py's docstring for the structure-vs-data
split (probability/dequant tables are hook-installed data).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from nowdb_spark.operators.vp8codec import (DC_PRED, H_PRED,
                                            TM_PRED, V_PRED,
                                            ZIGZAG, make_vp8_codec)

C = make_vp8_codec()


def _content(did: int):
    y2 = [((did * 3 + j * 7) % 21) - 10 for j in range(16)]
    y = [[0] + [((did * 5 + i * 11 + j * 3) % 13) - 6
                if j < 10 else 0 for j in range(1, 16)]
         for i in range(16)]
    uv = [[((did * 7 + i * 3 + j * 5) % 9) - 4 if j < 6 else 0
           for j in range(16)] for i in range(8)]
    return y2, y, uv


def test_bool_coder_roundtrip():
    """The §7 boolean coder is exact over random bit/probability
    sequences — the foundation everything else stands on."""
    rng = random.Random(7)
    for _ in range(100):
        n = rng.randint(1, 400)
        bits = [rng.randint(0, 1) for _ in range(n)]
        probs = [rng.randint(1, 254) for _ in range(n)]
        e = C.BoolEnc()
        for b, p in zip(bits, probs):
            e.put(b, p)
        d = C.BoolDec(e.bytes())
        assert [d.get(p) for p in probs] == bits


def test_bool_coder_compresses_skewed_bits():
    """Entropy sanity: 400 zeros at prob 250 must code far smaller
    than at prob 128 (≈1 bit each)."""
    e1, e2 = C.BoolEnc(), C.BoolEnc()
    for _ in range(400):
        e1.put(0, 250)
        e2.put(0, 128)
    assert len(e1.bytes()) < len(e2.bytes()) / 10


def test_frame_roundtrip_exact():
    for did in (0, 1, 2, 7, 55, 312, 999, 4998):
        y2, y, uv = _content(did)
        mode = [DC_PRED, V_PRED, H_PRED, TM_PRED][did % 4]
        out = C.decode_frame(
            C.encode_frame(mode, y2, y, uv, q_index=did % 128),
            fixture=True)
        assert out["ymode"] == mode and out["q_index"] == did % 128
        assert out["y2_coeffs"] == y2
        for i in range(16):
            assert out["y_coeffs"][i][1:] == y[i][1:], (did, i)
        assert out["uv_coeffs"] == uv
        assert 0 <= out["y"].min() and out["y"].max() <= 255


def test_prediction_modes_differ():
    """Same residuals, different modes → shifted reconstructions
    (DC=128, V=127, H=TM=129 for a neighborless MB)."""
    y2, y, uv = _content(3)
    recs = {}
    for mode in (DC_PRED, V_PRED, H_PRED, TM_PRED):
        recs[mode] = C.decode_frame(
            C.encode_frame(mode, y2, y, uv, q_index=20),
            fixture=True)["y"]
    # away from clamping, DC − V == 1 and H == TM
    assert np.array_equal(recs[H_PRED], recs[TM_PRED])
    inner = (recs[DC_PRED] > 0) & (recs[DC_PRED] < 255)
    assert ((recs[DC_PRED] - recs[V_PRED])[inner] == 1).all()


def test_idct_properties():
    # DC impulse → flat block
    flat = C.idct4x4([8] + [0] * 15)
    assert len(set(flat)) == 1
    # zero block → zero
    assert C.idct4x4([0] * 16) == [0] * 16
    # linearity up to rounding: idct(2x) ≈ 2·idct(x) within 1
    x = [((j * 37) % 15) - 7 for j in range(16)]
    a = np.array(C.idct4x4(x))
    b = np.array(C.idct4x4([2 * v for v in x]))
    assert np.abs(b - 2 * a).max() <= 2


def test_iwalsh_dc_impulse():
    out = C.iwalsh4x4([16] + [0] * 15)
    # dc propagates to every tmp then halves through the row pass:
    # (16 + 3) >> 3 = 2 at all 16 positions
    assert len(set(out)) == 1 and out[0] == 2


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG) == list(range(16))


def test_sniff_and_gates():
    y2, y, uv = _content(1)
    b = C.encode_frame(DC_PRED, y2, y, uv)
    assert C.sniff(b) == "vp8"
    # inter frame bit → gate
    b2 = bytearray(b)
    b2[0] |= 1
    with pytest.raises(NotImplementedError, match="inter"):
        C.decode_frame(bytes(b2), fixture=True)
    # bad start code
    b3 = bytearray(b)
    b3[3] = 0
    with pytest.raises(ValueError, match="start code"):
        C.decode_frame(bytes(b3), fixture=True)
    # undeclared provenance → honest gate, REGARDLESS of version
    # (version 3 is a legal RFC profile, so it cannot mark fixtures)
    with pytest.raises(NotImplementedError, match="set_coeff_probs"):
        C.decode_frame(bytes(b))             # twin bytes, no claim
    b4 = bytearray(b)
    tag = b4[0] | (b4[1] << 8) | (b4[2] << 16)
    tag = (tag & ~0b1110) | (0 << 1)         # version 0
    b4[0], b4[1], b4[2] = tag & 0xFF, (tag >> 8) & 0xFF, \
        (tag >> 16) & 0xFF
    with pytest.raises(NotImplementedError, match="set_coeff_probs"):
        C.decode_frame(bytes(b4))
    # partial real tables + allow_foreign still refuses, naming the
    # missing families
    c2 = make_vp8_codec()
    c2.set_quant_tables([4] * 128, [4] * 128)
    with pytest.raises(NotImplementedError, match="cat.*coeff|coeff"):
        c2.decode_frame(bytes(b), allow_foreign=True)
    # B_PRED encode gate; oversized coefficient gate
    with pytest.raises(NotImplementedError):
        C.encode_frame(4, y2, y, uv)
    bad = [row[:] for row in y]
    bad[0][1] = 3000
    with pytest.raises(ValueError, match="cat6"):
        C.encode_frame(DC_PRED, y2, bad, uv)
    # quant table installer validates shape
    with pytest.raises(ValueError):
        C.set_quant_tables([4] * 100, [4] * 128)


def test_cat_extra_bits_roundtrip():
    """Large coefficients exercise every category's extra bits."""
    y2 = [0] * 16
    vals = [5, 6, 7, 10, 11, 18, 19, 34, 35, 66, 67, 600, -600,
            -67, -35]
    y = [[0] + vals[:15] for _ in range(16)]
    uv = [[0] * 16 for _ in range(8)]
    out = C.decode_frame(C.encode_frame(DC_PRED, y2, y, uv),
                         fixture=True)
    for i in range(16):
        assert out["y_coeffs"][i][1:] == vals[:15], i
