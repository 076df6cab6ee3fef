"""Y4M video codec unit tests (mirrors test_imagecodec/test_audiocodec
coverage style: round trips, malformed input, every colorspace)."""

from __future__ import annotations

import pytest

from nowdb_spark.operators.videocodec import make_video_codec

C = make_video_codec()


def _frames(w, h, n, csx=2, csy=2, mono=False):
    ysz, csz = w * h, 0 if mono else (w // csx) * (h // csy)
    out = []
    for f in range(n):
        y = bytes((f * 13 + i * 3) % 256 for i in range(ysz))
        u = bytes((f * 11 + i * 7) % 256 for i in range(csz))
        v = bytes((f * 17 + i * 5) % 256 for i in range(csz))
        out.append((y, u, v))
    return out


def test_roundtrip_c420():
    fr = _frames(8, 6, 3)
    b = C.encode_y4m(fr, 8, 6, (30, 1))
    assert C.sniff(b) == "y4m"
    d = C.decode(b)
    assert (d["width"], d["height"], d["n_frames"]) == (8, 6, 3)
    assert (d["fps_num"], d["fps_den"]) == (30, 1)
    assert d["colorspace"] == "C420jpeg"
    assert d["frames"] == fr


@pytest.mark.parametrize("cs,csx,csy,mono", [
    ("C420", 2, 2, False), ("C420mpeg2", 2, 2, False),
    ("C420paldv", 2, 2, False), ("C422", 2, 1, False),
    ("C444", 1, 1, False), ("Cmono", 0, 0, True),
])
def test_colorspaces(cs, csx, csy, mono):
    fr = _frames(4, 4, 2, max(csx, 1), max(csy, 1), mono)
    b = C.encode_y4m(fr, 4, 4, colorspace=cs)
    d = C.decode(b)
    assert d["colorspace"] == cs and d["frames"] == fr


def test_frame_sample_every_2():
    fr = _frames(8, 6, 5)
    b = C.encode_y4m(fr, 8, 6, (25, 1))
    s = C.frame_sample(b, 2)
    d = C.decode(s)
    assert d["n_frames"] == 3
    assert d["frames"] == fr[0::2]
    # duration preserved: fps denominator scaled
    assert (d["fps_num"], d["fps_den"]) == (25, 2)


def test_frame_sample_offset():
    fr = _frames(4, 4, 6)
    b = C.encode_y4m(fr, 4, 4)
    d = C.decode(C.frame_sample(b, 3, offset=1))
    assert d["frames"] == fr[1::3]


def test_features_exact():
    fr = _frames(4, 4, 4)
    b = C.encode_y4m(fr, 4, 4, (25, 1))
    ft = C.features(b, every_n=2)
    sampled = fr[::2]
    assert ft["n_frames"] == 4 and ft["n_sampled"] == 2
    assert ft["luma_sum"] == sum(sum(y) for y, _, _ in sampled)
    assert ft["luma_max"] == max(max(y) for y, _, _ in sampled)
    assert ft["chroma_sum"] == sum(sum(u) + sum(v) for _, u, v in sampled)
    assert ft["duration_ms"] == 4 * 1000 // 25


def test_frame_params_tolerated():
    """FRAME lines may carry parameters (spec: 'FRAME' + optional
    ' <params>'); the decoder must skip them."""
    fr = _frames(4, 4, 2)
    b = C.encode_y4m(fr, 4, 4)
    b2 = b.replace(b"FRAME\n", b"FRAME Xsome-param\n")
    d = C.decode(b2)
    assert d["frames"] == fr


def test_malformed_inputs():
    assert C.sniff(b"RIFF....WAVE") is None
    assert C.decode(b"YUV4MPEG2 W4\n") is None          # missing H
    assert C.decode(b"not a video") is None
    fr = _frames(4, 4, 2)
    b = C.encode_y4m(fr, 4, 4)
    assert C.decode(b[:-3]) is None                     # truncated plane
    assert C.decode(b.replace(b"FRAME\n", b"FRAMX\n", 1)) is None
    with pytest.raises(ValueError):
        C.encode_y4m([(b"\0" * 3, b"", b"")], 4, 4)     # bad plane size
