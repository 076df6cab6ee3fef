"""FLAC frame codec: every decoder path round-trips bit-exactly,
corrupt streams fail loudly (never silently wrong samples)."""

from __future__ import annotations

import random

import pytest

from nowdb_spark.operators.flaccodec import make_flac_codec

C = make_flac_codec()


def _interleave(chans):
    n = len(chans[0])
    out = [0] * (n * len(chans))
    for i, ch in enumerate(chans):
        out[i::len(chans)] = ch
    return out


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("kind", ["verbatim", "fixed0", "fixed1",
                                  "fixed2", "fixed3", "fixed4", "lpc"])
def test_mono_roundtrip_grid(bits, kind):
    rng = random.Random(bits * 100 + len(kind))
    lim = 1 << (bits - 1)
    s = [rng.randrange(-lim, lim) for _ in range(53)]
    b = C.encode([s], rate=44100, bits=bits, block_size=16,
                 subframe=kind)
    d = C.decode(b)
    assert d["samples"] == s
    assert (d["bits"], d["channels"], d["sample_rate"]) \
        == (bits, 1, 44100)


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
@pytest.mark.parametrize("kind", ["verbatim", "fixed2", "lpc"])
def test_stereo_decorrelation_roundtrip(mode, kind):
    rng = random.Random(hash((mode, kind)) & 0xFFFF)
    left = [rng.randrange(-30000, 30000) for _ in range(41)]
    right = [rng.randrange(-30000, 30000) for _ in range(41)]
    b = C.encode([left, right], rate=48000, bits=16, block_size=16,
                 subframe=kind, stereo_mode=mode)
    assert C.decode(b)["samples"] == _interleave([left, right])


def test_constant_subframe():
    b = C.encode([[-123] * 64], rate=8000, bits=16, block_size=32,
                 subframe="constant")
    assert C.decode(b)["samples"] == [-123] * 64


def test_wasted_bits():
    s = [x * 8 for x in range(-40, 40)]      # 3 low zero bits
    b = C.encode([s], rate=8000, bits=16, block_size=16,
                 subframe="fixed1", wasted_bits=3)
    assert C.decode(b)["samples"] == s


def test_rice_escape_partition():
    s = list(range(-20, 44))
    b = C.encode([s], rate=8000, bits=16, block_size=64,
                 subframe="fixed2", rice_escape=True)
    assert C.decode(b)["samples"] == s


@pytest.mark.parametrize("po", [0, 1, 2, 3])
def test_rice_partition_orders(po):
    rng = random.Random(po)
    s = [rng.randrange(-1000, 1000) for _ in range(64)]
    b = C.encode([s], rate=16000, bits=16, block_size=32,
                 subframe="fixed1", rice_partition_order=po)
    assert C.decode(b)["samples"] == s


def test_short_tail_block_falls_back():
    """65 samples at block 16: the 1-sample tail cannot carry an
    order-2 predictor — the encoder falls back to verbatim and the
    decoder still reconstructs exactly."""
    s = list(range(65))
    for kind in ("fixed2", "fixed4", "lpc"):
        b = C.encode([s], rate=8000, bits=16, block_size=16,
                     subframe=kind)
        assert C.decode(b)["samples"] == s


def test_crc_corruption_raises():
    b = bytearray(C.encode([[5, -7, 9, 11] * 8], rate=8000, bits=16))
    b[-3] ^= 0x20                            # flip a bit in frame body
    with pytest.raises(ValueError, match="CRC"):
        C.decode(bytes(b))
    hdr = bytearray(C.encode([[1, 2, 3, 4] * 8], rate=8000, bits=16))
    # corrupt a frame-header byte (after 4 magic + 4 hdr + 34 SI):
    # the blocksize-follows field sits inside the CRC-8 span
    hdr[42 + 6] ^= 0x01
    with pytest.raises(ValueError):
        C.decode(bytes(hdr))


def test_non_flac_returns_none():
    assert C.decode(b"not flac at all") is None
    assert C.features(b"") is None


def test_truncated_stream_raises():
    b = C.encode([list(range(100))], rate=8000, bits=16, block_size=16)
    with pytest.raises(ValueError):
        C.decode(b[:-30])


def test_features_exact():
    s = [3, -4, 5, 0]
    m = C.features(C.encode([s], rate=8000, bits=16))
    assert m == {"n_samples": 4, "channels": 1, "sample_rate": 8000,
                 "duration_ms": 0, "peak": 5, "sq_sum": 50}


def test_multiframe_frame_numbers():
    """300 samples at block 64 = 5 frames; UTF-8 frame numbers and
    per-frame CRCs all verified by a full decode."""
    rng = random.Random(9)
    s = [rng.randrange(-2000, 2000) for _ in range(300)]
    b = C.encode([s], rate=44100, bits=16, block_size=64,
                 subframe="fixed2", rice_partition_order=1)
    assert C.decode(b)["samples"] == s
