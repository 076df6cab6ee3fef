"""Round-13 operator tests: MP3 bit reservoir, window switching
(short / start / stop / mixed blocks), linbits escape machinery,
count1 table A, stereo (independent, MS joint, long-block
intensity) — all against independent Python models or exact
structural assertions, never the codec's own output alone."""
import math

import numpy as np
import pytest

from nowdb_spark.operators.mp3codec import (CNT1_A, IMDCT12_WIN,
                                            IMDCT_WINS,
                                            SFB_SHORT_BOUNDS,
                                            make_mp3_codec)

C = make_mp3_codec()


def _long_content(seed, g):
    isv = [0] * 576
    for i in range(16):
        isv[i] = ((seed + 3 * g + i) % 3) - 1
    for i in range(16, 96):
        isv[i] = ((seed * 7 + g * 5 + i * 3) % 5) - 2
    scf = [(seed + 7 * g + b) % 8 for b in range(21)]
    return isv, scf, 200 + (seed + g) % 32


# ------------------------------------------------------------------
# bit reservoir
# ------------------------------------------------------------------

def test_reservoir_roundtrip_and_nonzero_mdb():
    """Three frames with very different payload sizes: the stream
    packer must produce nonzero main_data_begin on the later frames
    (verified in the raw side-info bytes, not just the decoder's
    word) and decode must reproduce every granule's codes exactly."""
    frames = []
    for f in range(3):
        g0 = _long_content(f, 0)
        g1 = _long_content(f, 1)
        if f == 0:                 # tiny frame 0 → big reservoir
            g0 = ([0] * 576, g0[1], g0[2])
            g1 = ([1] + [0] * 575, g1[1], g1[2])
        frames.append({"is2": [g0[0], g1[0]], "scf2": [g0[1], g1[1]],
                       "gains": [g0[2], g1[2]]})
    b = C.encode_stream(frames)
    flen = 576
    mdbs = []
    for k in range(3):
        mdbs.append(b[4 + k * flen] << 1 | (b[5 + k * flen] >> 7))
    assert mdbs[0] == 0
    assert mdbs[1] > 0 and mdbs[2] > 0       # reservoir actually used
    decoded = C.decode_frames(b)
    assert [f["mdb"] for f in decoded] == mdbs
    for k in range(3):
        for g in range(2):
            assert decoded[k]["granules"][g]["is"] == \
                list(frames[k]["is2"][g])
            assert decoded[k]["granules"][g]["scf"] == \
                list(frames[k]["scf2"][g])


def test_reservoir_equals_no_reservoir_decode():
    """The same granule content encoded (a) as independent frames and
    (b) through the stream packer must requantize identically —
    the reservoir is transport, not semantics."""
    specs = []
    payload = b""
    for f in range(3):
        g0 = _long_content(f + 5, 0)
        g1 = _long_content(f + 5, 1)
        if f == 1:
            g0 = ([1] + [0] * 575, g0[1], g0[2])
        specs.append({"is2": [g0[0], g1[0]], "scf2": [g0[1], g1[1]],
                      "gains": [g0[2], g1[2]]})
        payload += C.encode_frame([g0[0], g1[0]], [g0[1], g1[1]],
                                  [g0[2], g1[2]])
    a = C.decode_frames(payload)
    bdec = C.decode_frames(C.encode_stream(specs))
    for fa, fb in zip(a, bdec):
        for ga, gb in zip(fa["granules"], fb["granules"]):
            assert ga["is"] == gb["is"]
            np.testing.assert_allclose(ga["xr"], gb["xr"])
            np.testing.assert_allclose(ga["ts"], gb["ts"])


def test_reservoir_limits():
    g0 = _long_content(1, 0)
    # a frame whose granule exceeds its region + zero reservoir
    big = [2] * 480 + [0] * 96
    with pytest.raises(ValueError, match="overflow|region"):
        C.encode_stream([{"is2": [big, big],
                          "scf2": [g0[1], g0[1]],
                          "gains": [g0[2], g0[2]],
                          "table_select": (3, 3, 3)}], kbps=32)
    # truncating the lead-in frames starves the reservoir
    frames = [{"is2": [[0] * 576, [0] * 576],
               "scf2": [g0[1], g0[1]], "gains": [210, 210]},
              {"is2": [g0[0], g0[0]], "scf2": [g0[1], g0[1]],
               "gains": [g0[2], g0[2]]}]
    b = C.encode_stream(frames)
    with pytest.raises(ValueError, match="reservoir underrun"):
        C.decode_frames(b[576:])


def test_part2_3_length_overflow_raises():
    """A granule beyond 4095 bits must raise, not truncate the
    12-bit side-info field into an undecodable frame. Only linbits
    escape pairs (15 bits each) can push a granule past 4095."""
    c = make_mp3_codec()
    c.set_tables(9, LINBITS_TAB)
    dense = [16 if (i % 2) else -16 for i in range(576)]
    with pytest.raises(ValueError, match="4095|12-bit"):
        c.encode_stream([{"is2": [dense, dense],
                          "scf2": [[0] * 21] * 2,
                          "gains": [210, 210],
                          "table_select": (9, 9, 9)}], kbps=320)


# ------------------------------------------------------------------
# short blocks (block_type 2) + start/stop windows
# ------------------------------------------------------------------

def _short_content(seed):
    isv = [0] * 576
    for i in range(96):
        isv[i] = ((seed * 5 + i * 3) % 5) - 2
    scf_s = [[(seed + w * 3 + b) % 8 for b in range(12)]
             for w in range(3)]
    return isv, scf_s


def test_short_block_roundtrip_codes_and_scf():
    isv, scf_s = _short_content(4)
    lg = _long_content(4, 1)
    b = C.encode_frame([isv, lg[0]], [scf_s, lg[1]], [205, lg[2]],
                       block_type=(2, 0), table_select=(3, 3, 3),
                       subblock_gain=((1, 0, 2), (0, 0, 0)))
    f = C.decode_frames(b)[0]
    g0, g1 = f["granules"]
    assert g0["block_type"] == 2 and g1["block_type"] == 0
    assert g0["is"] == isv
    assert g0["scf_s"] == scf_s
    assert g1["is"] == lg[0] and g1["scf"] == lg[1]


def test_short_block_requantize_reorder_model():
    """Independent model: requantize each (window, sfb) run of the
    transmit order and place it at line 3·i + window; subblock_gain
    scales window w by 2^(−2·sbg[w])."""
    isv, scf_s = _short_content(7)
    sbg = (0, 1, 3)
    gg = 210
    b = C.encode_frame([isv, [0] * 576], [scf_s, [0] * 21],
                       [gg, 210], block_type=(2, 0),
                       table_select=(3, 3, 3),
                       subblock_gain=(sbg, (0, 0, 0)))
    g0 = C.decode_frames(b)[0]["granules"][0]
    sbounds = SFB_SHORT_BOUNDS[48000]
    exp = np.zeros(576)
    for s in range(13):
        lo, hi = sbounds[s], sbounds[s + 1]
        width = hi - lo
        for w in range(3):
            scf_v = scf_s[w][s] if s < 12 else 0
            gain = (2.0 ** ((gg - 210) / 4.0 - 2.0 * sbg[w])
                    * 2.0 ** (-0.5 * scf_v))
            for i in range(width):
                v = isv[3 * lo + w * width + i]
                if v:
                    exp[3 * lo + 3 * i + w] = math.copysign(
                        abs(v) ** (4.0 / 3.0), v) * gain
    np.testing.assert_allclose(g0["xr"], exp, rtol=1e-12)


def test_short_block_imdct_model():
    """ts must equal three 12-point IMDCTs per subband (spectral
    stride 3) overlap-added at 6-sample offsets — computed here
    from xr with an independent loop."""
    isv, scf_s = _short_content(9)
    b = C.encode_frame([isv, [0] * 576], [scf_s, [0] * 21],
                       [210, 210], block_type=(2, 0),
                       table_select=(3, 3, 3))
    g0 = C.decode_frames(b)[0]["granules"][0]
    spec = g0["xr"].reshape(32, 18)
    z = np.zeros((32, 36))
    for sb in range(32):
        for w in range(3):
            pts = spec[sb, w::3]
            for n in range(12):
                acc = 0.0
                for k in range(6):
                    acc += pts[k] * math.cos(
                        math.pi / 24 * (2 * n + 1 + 6) * (2 * k + 1))
                z[sb, 6 + 6 * w + n] += acc * math.sin(
                    math.pi / 12 * (n + 0.5))
    ts = z[:, :18]                  # overlap state starts at zero
    ts[1::2, 1::2] = -ts[1::2, 1::2]
    np.testing.assert_allclose(g0["ts"], ts.T, atol=1e-12)


def test_start_stop_windows():
    """block_type 1/3 use the published asymmetric 36-point windows;
    round-trip plus window-shape spot checks."""
    w1 = IMDCT_WINS[1] / np.where(IMDCT_WINS[0] == 0, 1,
                                  IMDCT_WINS[0])
    # start window: flat 1 over samples 18-23, zero over 30-35
    assert np.allclose(IMDCT_WINS[1][30:], 0)
    assert np.allclose(IMDCT_WINS[3][:6], 0)
    del w1
    lg = _long_content(3, 0)
    b = C.encode_frame([lg[0], lg[0]], [lg[1], lg[1]],
                       [lg[2], lg[2]], block_type=(1, 3),
                       table_select=(3, 3, 3))
    f = C.decode_frames(b)[0]
    assert [g["block_type"] for g in f["granules"]] == [1, 3]
    assert f["granules"][0]["is"] == lg[0]
    # same codes under bt0 vs bt1/3 differ only via the IMDCT
    # window: granule 0's first half is identical (the bt0 and bt1
    # windows agree on samples 0-17), the difference surfaces in the
    # overlap fed to granule 1 and in granule 1's own bt3 window
    b0 = C.encode_frame([lg[0], lg[0]], [lg[1], lg[1]],
                        [lg[2], lg[2]], table_select=(3, 3, 3))
    f0 = C.decode_frames(b0)[0]
    np.testing.assert_allclose(f0["granules"][0]["xr"],
                               f["granules"][0]["xr"])
    np.testing.assert_allclose(f0["granules"][0]["ts"],
                               f["granules"][0]["ts"])
    assert not np.allclose(f0["granules"][1]["ts"],
                           f["granules"][1]["ts"])


def test_scfsi_rejected_with_window_switching():
    lg = _long_content(1, 0)
    with pytest.raises(ValueError, match="scfsi"):
        C.encode_stream([{"is2": [lg[0], lg[0]],
                          "scf2": [lg[1], lg[1]],
                          "gains": [210, 210],
                          "block_type": (2, 0), "scfsi": (1, 0, 0, 0)}])


# ------------------------------------------------------------------
# linbits escapes + count1 table A
# ------------------------------------------------------------------

# a synthetic-but-valid linbits table over |x|,|y| ∈ {0,1,15}: the
# escape machinery is what's under test; published tables install
# the same way (set_tables validates Kraft completeness)
LINBITS_TAB = {
    (0, 0): (2, 0, 4), (0, 1): (2, 1, 4), (1, 0): (3, 4, 4),
    (1, 1): (3, 5, 4), (0, 15): (4, 12, 4), (15, 0): (4, 13, 4),
    (1, 15): (4, 14, 4), (15, 1): (5, 30, 4), (15, 15): (5, 31, 4),
}


def test_linbits_escape_roundtrip():
    c = make_mp3_codec()
    c.set_tables(9, LINBITS_TAB)
    isv = [0] * 576
    vals = [17, -30, 15, -15, 1, -1, 16, 0, 29, -16]
    isv[:len(vals)] = vals
    scf = [0] * 21
    b = c.encode_frame([isv, [0] * 576], [scf, scf], [210, 210],
                       table_select=(9, 9, 9))
    g0 = c.decode_frames(b)[0]["granules"][0]
    assert g0["is"] == isv
    # |v| − 15 beyond the 4 linbits range must be rejected at encode
    isv2 = [31, 0] + [0] * 574
    with pytest.raises(ValueError, match="linbits"):
        c.encode_frame([isv2, [0] * 576], [scf, scf], [210, 210],
                       table_select=(9, 9, 9))


def test_linbits_bitstream_order():
    """ISO order: codeword, x-linbits, x-sign, y-linbits, y-sign.
    Verified against a hand-assembled bitstream for one pair."""
    c = make_mp3_codec()
    c.set_tables(9, LINBITS_TAB)
    isv = [-20, 16] + [0] * 574
    b = c.encode_frame([isv, [0] * 576], [[0] * 21] * 2, [210, 210],
                       table_select=(9, 9, 9))
    # main data starts at byte 21; 63 scalefactor bits of zeros (21
    # bands × 3) precede the first codeword
    r_bits = []
    for byte in b[21:21 + 16]:
        r_bits.extend((byte >> (7 - k)) & 1 for k in range(8))
    bits = r_bits[63:]
    # (15,15) codeword 11111, x: linbits 0101 (5), sign 1,
    # y: linbits 0001 (1), sign 0
    assert bits[:5] == [1, 1, 1, 1, 1]
    assert bits[5:9] == [0, 1, 0, 1]
    assert bits[9] == 1
    assert bits[10:14] == [0, 0, 0, 1]
    assert bits[14] == 0


def test_count1_table_a_roundtrip_and_bit():
    isv = [0] * 576
    isv[:16] = [1, 0, -1, 1, 0, 0, 0, 0, -1, -1, 1, 0, 1, 1, -1, 1]
    scf = [1] * 21
    bA = C.encode_frame([isv, isv], [scf, scf], [210, 210],
                        count1_quads=4, count1_table="A")
    bB = C.encode_frame([isv, isv], [scf, scf], [210, 210],
                        count1_quads=4, count1_table="B")
    assert bA != bB
    # count1table_select is the last bit of each granule's side info
    fA = C.decode_frames(bA)
    fB = C.decode_frames(bB)
    for fa, fb in zip(fA, fB):
        for ga, gb in zip(fa["granules"], fb["granules"]):
            assert ga["is"] == isv and gb["is"] == isv
            np.testing.assert_allclose(ga["xr"], gb["xr"])


def test_count1_table_a_is_prefix_free_and_shorter_for_sparse():
    """Structural truths of the bundled table: Kraft equality,
    prefix-freeness (import-time asserted, re-checked here) and the
    entropy property that motivates table A — all-zero quads get the
    1-bit code."""
    assert CNT1_A[0][0] == 1
    total = sum(2.0 ** -ln for ln, _ in CNT1_A.values())
    assert abs(total - 1.0) < 1e-12
    codes = sorted((ln, cd) for ln, cd in CNT1_A.values())
    for i, (la, ca) in enumerate(codes):
        for lb, cb in codes[i + 1:]:
            if la < lb:
                assert (cb >> (lb - la)) != ca


def test_imdct12_matrix_shape():
    assert IMDCT12_WIN.shape == (12, 6)
    # short window symmetry: w[n] = w[11-n]
    win = [IMDCT12_WIN[n, 0]
           / math.cos(math.pi / 24 * (2 * n + 1 + 6))
           for n in range(12)]
    np.testing.assert_allclose(win, win[::-1], atol=1e-12)


# ------------------------------------------------------------------
# mixed blocks (block_type 2 + mixed_block_flag)
# ------------------------------------------------------------------

def _mixed_content(seed):
    isv = [0] * 576
    for i in range(120):
        isv[i] = ((seed * 5 + i * 7) % 5) - 2
    scf_l = [(seed + b) % 8 for b in range(8)]
    scf_s = [[0] * 12 for _ in range(3)]
    for w in range(3):
        for b in range(3, 12):
            scf_s[w][b] = (seed + 2 * w + b) % 8
    return isv, (scf_l, scf_s)


def test_mixed_block_roundtrip():
    isv, scf = _mixed_content(5)
    b = C.encode_frame([isv, [0] * 576],
                       [scf, [0] * 21], [208, 210],
                       block_type=(2, 0), mixed=(1, 0),
                       table_select=(3, 3, 3),
                       subblock_gain=((0, 1, 2), (0, 0, 0)))
    g0 = C.decode_frames(b)[0]["granules"][0]
    assert g0["block_type"] == 2 and g0["mixed"] == 1
    assert g0["is"] == isv
    assert g0["scf_l"] == scf[0]
    assert g0["scf_s"] == scf[1]


def test_mixed_block_requantize_model():
    """Lines 0-35: long formula over long bands 0-7 (no reorder, no
    subblock gain); lines 36+: short formula from short sfb 3 with
    the 3i+w reorder. Verified against an independent model."""
    from nowdb_spark.operators.mp3codec import (PRETAB, SFB_BOUNDS_48K)
    isv, scf = _mixed_content(9)
    sbg = (1, 0, 3)
    gg = 208
    b = C.encode_frame([isv, [0] * 576],
                       [scf, [0] * 21], [gg, 210],
                       block_type=(2, 0), mixed=(1, 0),
                       table_select=(3, 3, 3),
                       subblock_gain=(sbg, (0, 0, 0)))
    g0 = C.decode_frames(b)[0]["granules"][0]
    exp = np.zeros(576)
    for b2 in range(8):                       # long part
        lo, hi = SFB_BOUNDS_48K[b2], SFB_BOUNDS_48K[b2 + 1]
        gain = (2.0 ** ((gg - 210) / 4.0)
                * 2.0 ** (-0.5 * (scf[0][b2] + 0 * PRETAB[b2])))
        for j in range(lo, hi):
            if isv[j]:
                exp[j] = math.copysign(
                    abs(isv[j]) ** (4.0 / 3.0), isv[j]) * gain
    sbounds = SFB_SHORT_BOUNDS[48000]
    for s in range(3, 13):                    # short part
        lo, hi = sbounds[s], sbounds[s + 1]
        width = hi - lo
        for w in range(3):
            scf_v = scf[1][w][s] if s < 12 else 0
            gain = (2.0 ** ((gg - 210) / 4.0 - 2.0 * sbg[w])
                    * 2.0 ** (-0.5 * scf_v))
            for i in range(width):
                v = isv[3 * lo + w * width + i]
                if v:
                    exp[3 * lo + 3 * i + w] = math.copysign(
                        abs(v) ** (4.0 / 3.0), v) * gain
    np.testing.assert_allclose(g0["xr"], exp, rtol=1e-12)


def test_mixed_block_alias_and_imdct_split():
    """The long half of a mixed granule behaves exactly like the
    same content in a pure long granule restricted to subbands 0-1
    (alias butterflies at the one boundary, 36-point window); the
    short half matches the pure-short path for subbands 2+."""
    # content confined to lines 0..35 → only the long half is active
    isv = [0] * 576
    for i in range(36):
        isv[i] = ((i * 7) % 5) - 2
    scf_l = [2] * 8
    scf_s = [[0] * 12 for _ in range(3)]
    scf_long21 = [2] * 8 + [0] * 13
    bm = C.encode_frame([isv, [0] * 576],
                        [(scf_l, scf_s), [0] * 21], [210, 210],
                        block_type=(2, 0), mixed=(1, 0),
                        table_select=(3, 3, 3))
    bl = C.encode_frame([isv, [0] * 576],
                        [scf_long21, [0] * 21], [210, 210],
                        table_select=(3, 3, 3), region0_count=7)
    gm = C.decode_frames(bm)[0]["granules"][0]
    gl = C.decode_frames(bl)[0]["granules"][0]
    np.testing.assert_allclose(gm["xr"][:36], gl["xr"][:36])
    # subband 0 sees only the boundary-1 butterfly, which both paths
    # apply identically — its ts must agree exactly. (Subband 1 is
    # NOT comparable: the pure-long path also runs the boundary-2
    # butterfly, which scales sb1's top lines by cs[j] even when
    # everything above is zero; mixed correctly skips it.)
    np.testing.assert_allclose(gm["ts"][:, :1], gl["ts"][:, :1],
                               atol=1e-12)
    # and a mixed granule is NOT the same as pure short on the same
    # content: the long half must differ from the short decode
    bs = C.encode_frame([isv, [0] * 576],
                        [[[0] * 12] * 3, [0] * 21], [210, 210],
                        block_type=(2, 0), table_select=(3, 3, 3))
    gs = C.decode_frames(bs)[0]["granules"][0]
    assert not np.allclose(gm["ts"][:, :2], gs["ts"][:, :2])


def test_mixed_gate_validation():
    isv, scf = _mixed_content(1)
    with pytest.raises(ValueError, match="mixed"):
        C.encode_frame([isv, [0] * 576], [scf, [0] * 21],
                       [210, 210], block_type=(1, 0), mixed=(1, 0))


# ------------------------------------------------------------------
# stereo: independent two-channel and MS joint stereo
# ------------------------------------------------------------------

def _stereo_frame(seed, ms=False):
    c0g0 = _long_content(seed, 0)
    c0g1 = _long_content(seed, 1)
    c1g0 = _long_content(seed + 7, 0)
    c1g1 = _long_content(seed + 7, 1)
    spec = {"is2": [c0g0[0], c0g1[0]], "scf2": [c0g0[1], c0g1[1]],
            "gains": [c0g0[2], c0g1[2]],
            "ch1": {"is2": [c1g0[0], c1g1[0]],
                    "scf2": [c1g0[1], c1g1[1]],
                    "gains": [c1g0[2], c1g1[2]]}}
    if ms:
        spec["mode_ext"] = 0b10
    return spec, (c0g0, c0g1, c1g0, c1g1)


def test_stereo_roundtrip_independent():
    """Two-channel frames: 32-byte side info, granule-major channel-
    minor main data, per-channel codes/scfs recovered exactly."""
    spec, cs = _stereo_frame(3)
    b = C.encode_stream([spec])
    assert len(b) == 576                    # frame size is per-frame
    f = C.decode_frames(b)[0]
    assert f["nch"] == 2
    # header: mode 00 (stereo)
    assert (b[3] >> 6) & 0b11 == 0b00
    for g in range(2):
        gr = f["granules"][g]
        assert gr["nch"] == 2 and gr["ms"] is False
        assert gr["is"][0] == cs[g][0]
        assert gr["is"][1] == cs[2 + g][0]
        assert gr["scf_ch"][0]["scf"] == cs[g][1]
        assert gr["scf_ch"][1]["scf"] == cs[2 + g][1]


def test_stereo_ms_recombine_model():
    """MS joint stereo: the decoder must produce L,R = (M±S)/√2 from
    the transmitted MID/SIDE spectra — checked against the two
    channels' independent-stereo decode of the same codes."""
    spec_ms, _ = _stereo_frame(9, ms=True)
    spec_plain = dict(spec_ms)
    spec_plain.pop("mode_ext")
    fm = C.decode_frames(C.encode_stream([spec_ms]))[0]
    fp = C.decode_frames(C.encode_stream([spec_plain]))[0]
    assert fm["granules"][0]["ms"] is True
    inv = 1.0 / math.sqrt(2.0)
    for g in range(2):
        m = fp["granules"][g]["xr"][0]
        s = fp["granules"][g]["xr"][1]
        np.testing.assert_allclose(fm["granules"][g]["xr"][0],
                                   (m + s) * inv)
        np.testing.assert_allclose(fm["granules"][g]["xr"][1],
                                   (m - s) * inv)
    # codes on the wire are the M/S integers, unchanged
    assert fm["granules"][0]["is"] == fp["granules"][0]["is"]


def test_stereo_ms_short_blocks():
    """MS with short blocks on both channels: recombine commutes
    with the reorder (it is per-line), so the short path works
    unchanged; mismatched splits must raise at encode."""
    isv, scf_s = _short_content(2)
    isv2, scf_s2 = _short_content(11)
    spec = {"is2": [isv, [0] * 576], "scf2": [scf_s, [0] * 21],
            "gains": [205, 210], "block_type": (2, 0),
            "table_select": (3, 3, 3), "mode_ext": 0b10,
            "ch1": {"is2": [isv2, [0] * 576],
                    "scf2": [scf_s2, [0] * 21],
                    "gains": [206, 210], "block_type": (2, 0),
                    "table_select": (3, 3, 3)}}
    f = C.decode_frames(C.encode_stream([spec]))[0]
    assert f["granules"][0]["block_type"] == [2, 2]
    assert f["granules"][0]["is"][0] == isv
    bad = dict(spec)
    bad["ch1"] = dict(spec["ch1"])
    bad["ch1"]["block_type"] = (0, 0)
    with pytest.raises(ValueError, match="block split"):
        C.encode_stream([bad])


def test_stereo_reservoir():
    """The reservoir works identically for stereo streams (capacity
    is frame_len − 36)."""
    specs = []
    for k in range(2):
        spec, _ = _stereo_frame(k)
        if k == 0:
            spec["is2"] = [[0] * 576, [0] * 576]
            spec["ch1"]["is2"] = [[0] * 576, [0] * 576]
        specs.append(spec)
    b = C.encode_stream(specs)
    f = C.decode_frames(b)
    assert f[0]["mdb"] == 0 and f[1]["mdb"] > 0
    _, cs = _stereo_frame(1)
    assert f[1]["granules"][0]["is"][0] == cs[0][0]


def test_stereo_scfsi_per_channel():
    """scfsi flags are per channel: reuse on channel 1 only."""
    c0g0 = _long_content(4, 0)
    c0g1 = _long_content(4, 1)
    c1 = _long_content(21, 0)
    spec = {"is2": [c0g0[0], c0g1[0]], "scf2": [c0g0[1], c0g1[1]],
            "gains": [c0g0[2], c0g1[2]],
            "ch1": {"is2": [c1[0], c1[0]], "scf2": [c1[1], c1[1]],
                    "gains": [c1[2], c1[2]],
                    "scfsi": (1, 1, 1, 1)}}
    f = C.decode_frames(C.encode_stream([spec]))[0]
    assert f["granules"][1]["scf_ch"][0]["scf"] == c0g1[1]
    assert f["granules"][1]["scf_ch"][1]["scf"] == c1[1]


def test_intensity_stereo_long_blocks():
    """Intensity (mode_ext 01): above the right channel's zero part,
    ch1's scalefactors are is_pos values and the decoder spreads the
    carried signal as L = M·r/(1+r), R = M/(1+r), r = tan(is_pos·
    π/12); is_pos 6 = hard left, 7 = band untouched. Verified
    against an independent model, border derived from content."""
    from nowdb_spark.operators.mp3codec import SFB_BOUNDS_48K as B
    c0g0 = _long_content(3, 0)
    # right channel: nonzero only in lines 0..15 → border at the
    # first sfb bound >= 16 (= sfb 4)
    is_r = [((3 + i) % 3) - 1 for i in range(16)] + [0] * 560
    if not any(is_r):
        is_r[0] = 1
    is_pos = [(b % 8) for b in range(21)]    # includes 6 and 7 cases
    spec = {"is2": [c0g0[0], [0] * 576], "scf2": [c0g0[1], [0] * 21],
            "gains": [c0g0[2], 210], "mode_ext": 0b01,
            "ch1": {"is2": [is_r, [0] * 576],
                    "scf2": [is_pos, [0] * 21], "gains": [207, 210]}}
    plain = {k: v for k, v in spec.items() if k != "mode_ext"}
    fi = C.decode_frames(C.encode_stream([spec]))[0]
    fp = C.decode_frames(C.encode_stream([plain]))[0]
    nz1 = max(j for j in range(576) if is_r[j])
    border = next(sb for sb in range(22) if B[sb] >= nz1 + 1)
    xl_p = fp["granules"][0]["xr"][0]
    xl_i = fi["granules"][0]["xr"][0]
    xr_i = fi["granules"][0]["xr"][1]
    exp_l = xl_p.copy()
    exp_r = fp["granules"][0]["xr"][1].copy()
    for sb in range(border, 22):
        p = is_pos[min(sb, 20)]
        lo, hi = B[sb], B[sb + 1]
        if p == 7:
            continue
        if p == 6:
            rl, rr = 1.0, 0.0
        else:
            t = math.tan(p * math.pi / 12.0)
            rl, rr = t / (1.0 + t), 1.0 / (1.0 + t)
        exp_r[lo:hi] = exp_l[lo:hi] * rr
        exp_l[lo:hi] = exp_l[lo:hi] * rl
    np.testing.assert_allclose(xl_i, exp_l)
    np.testing.assert_allclose(xr_i, exp_r)
    # below the border both channels decode as plain stereo
    np.testing.assert_allclose(xl_i[:B[border]], xl_p[:B[border]])


def test_intensity_stereo_gates():
    # combined MS + intensity stays gated on both sides
    spec, _ = _stereo_frame(5)
    spec["mode_ext"] = 0b11
    with pytest.raises(NotImplementedError, match="MS \\+ intensity"):
        C.encode_stream([spec])
    spec["mode_ext"] = 0b10
    b = bytearray(C.encode_stream([spec]))
    b[3] |= 0b00110000                       # mode_ext 11: MS + IS
    with pytest.raises(NotImplementedError, match="MS \\+ intensity"):
        C.decode_frames(bytes(b))
    # intensity with window switching stays gated
    isv, scf_s = _short_content(2)
    spec2 = {"is2": [isv, [0] * 576], "scf2": [scf_s, [0] * 21],
             "gains": [205, 210], "block_type": (2, 0),
             "table_select": (3, 3, 3), "mode_ext": 0b01,
             "ch1": {"is2": [[0] * 576, [0] * 576],
                     "scf2": [[0] * 21, [0] * 21],
                     "gains": [210, 210]}}
    with pytest.raises(NotImplementedError, match="window switching"):
        C.encode_stream([spec2])


def test_stereo_pcm_shape():
    spec, _ = _stereo_frame(6)
    pcm = C.decode_pcm(C.encode_stream([spec, _stereo_frame(7)[0]]))
    assert pcm.shape == (4, 2, 18, 32)
    # channel separation: decoding channel content through the mono
    # path gives the same PCM per channel
    c0g0 = _long_content(6, 0)
    c0g1 = _long_content(6, 1)
    mono = C.encode_frame([c0g0[0], c0g1[0]], [c0g0[1], c0g1[1]],
                          [c0g0[2], c0g1[2]])
    pcm_mono = C.decode_pcm(mono)
    np.testing.assert_allclose(pcm[:2, 0], pcm_mono, atol=1e-12)
