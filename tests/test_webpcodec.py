"""VP8L (WebP-lossless) codec: every decoder path round-trips
bit-exactly; corrupt/out-of-scope streams fail loudly."""

from __future__ import annotations

import pytest

from nowdb_spark.operators.webpcodec import make_webp_codec

C = make_webp_codec()
W, H = 13, 9


def _grid(run_len=3, alpha_varies=True):
    px = []
    for y in range(H):
        for x in range(W):
            xx = x // run_len
            r = (xx * 7 + y * 11) % 256
            g = (xx * 13 + y * 3) % 256
            b = (xx * 3 + y * 5) % 256
            a = 255 - ((x + y) % 2 if alpha_varies else 0)
            px.append((a << 24) | (r << 16) | (g << 8) | b)
    return px


def _flat(img):
    return [(a << 24) | (r << 16) | (g << 8) | b
            for row, arow in zip(img["rows"], img["alpha_rows"])
            for (r, g, b), a in zip(row, arow)]


@pytest.mark.parametrize("kw", [
    dict(transform="none", cache_bits=0, use_backrefs=False),
    dict(transform="none", cache_bits=0, use_backrefs=True),
    dict(transform="none", cache_bits=5, use_backrefs=True),
    dict(transform="subtract_green", cache_bits=4),
    dict(transform="color", color_elem=(37, 236, 99)),
])
def test_roundtrip_plain_and_transforms(kw):
    px = _grid()
    img = C.decode(C.encode(px, W, H, **kw))
    assert img["fmt"] == "webp-lossless"
    assert (img["width"], img["height"]) == (W, H)
    assert _flat(img) == px


@pytest.mark.parametrize("mode", range(14))
@pytest.mark.parametrize("combo", ["predictor", "green_predictor"])
def test_roundtrip_all_predictors(mode, combo):
    px = _grid()
    b = C.encode(px, W, H, transform=combo, predictor_mode=mode,
                 cache_bits=3)
    assert _flat(C.decode(b)) == px


@pytest.mark.parametrize("n_colors", [2, 4, 9, 16, 40])
def test_roundtrip_palette_all_bundle_widths(n_colors):
    """≤2 colors pack 8/pixel, ≤4 pack 4, ≤16 pack 2, >16 unbundled
    — plus the delta-coded palette stream itself."""
    pal = [0xFF000000 | (((10 + i * 5) % 256) << 16)
           | (((3 + i * 7) % 256) << 8) | ((i * 11) % 256)
           for i in range(n_colors)]
    px = [pal[(x + y * 2) % n_colors]
          for y in range(H) for x in range(W)]
    assert _flat(C.decode(C.encode(px, W, H, transform="palette"))) == px


def test_roundtrip_odd_width_bundling():
    """Width not divisible by the bundle factor: the last packed
    pixel of each row carries fewer real pixels."""
    w, h = 7, 3
    pal = [0xFF0000FF, 0xFF00FF00, 0xFFFF0000]
    px = [pal[(x * y) % 3] for y in range(h) for x in range(w)]
    img = C.decode(C.encode(px, w, h, transform="palette"))
    assert (img["width"], img["height"]) == (w, h)
    assert _flat(img) == px


def test_long_run_backrefs():
    """Runs longer than 4096-capable length coding and row-crossing
    distance-1 references."""
    w, h = 64, 70                           # 4480 px single color run
    px = [0xFF102030] * (w * h)
    img = C.decode(C.encode(px, w, h, use_backrefs=True))
    assert _flat(img) == px


@pytest.mark.parametrize("n_groups,bits", [(2, 2), (4, 3), (3, 4)])
def test_roundtrip_meta_prefix_groups(n_groups, bits):
    """Meta prefix codes: the subresolution entropy image assigns a
    code GROUP per (1<<bits)-pixel tile; groups carry independent
    Huffman codes."""
    px = _grid()
    b = C.encode(px, W, H, cache_bits=3, meta_bits=bits,
                 n_groups=n_groups)
    img = C.decode(b)
    assert _flat(img) == px


def test_meta_groups_with_transform():
    px = _grid()
    b = C.encode(px, W, H, transform="subtract_green",
                 meta_bits=2, n_groups=2)
    assert _flat(C.decode(b)) == px


def test_non_webp_returns_none_and_scope_errors():
    assert C.decode(b"not even riff") is None
    assert C.decode(b"RIFF\x00\x00\x00\x00WAVEfmt \x00\x00\x00\x00") is None
    lossy = (b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
             + b"VP8 " + (0).to_bytes(4, "little"))
    with pytest.raises(ValueError, match="lossy"):
        C.decode(lossy)


def test_truncated_stream_raises():
    b = C.encode(_grid(), W, H)
    with pytest.raises(ValueError):
        C.decode(b[:-6] )
    bad_sig = bytearray(b)
    bad_sig[20] = 0x2E                      # not the VP8L signature
    with pytest.raises(ValueError, match="signature"):
        C.decode(bytes(bad_sig))


def test_features_match_pixels():
    px = _grid()
    f = C.features(C.encode(px, W, H, transform="subtract_green",
                            cache_bits=4))
    chk = 0
    a_sum = 0
    for p in range(W * H):
        v = px[p]
        chk += (p + 1) * (((v >> 16) & 0xFF) + 2 * ((v >> 8) & 0xFF)
                          + 3 * (v & 0xFF))
        a_sum += v >> 24
    assert f == {"fmt": "webp-lossless", "width": W, "height": H,
                 "n_px": W * H, "px_check": chk, "a_sum": a_sum}


def test_extended_vp8x_roundtrip():
    """VP8X container: flags + canvas, embedded VP8L decode, EXIF as
    a real TIFF stream (tiffcodec reuse), XMP text, RIFF padding."""
    px = _grid()
    b = C.encode_extended(
        px, W, H,
        exif_pages=[{"width": 123, "height": 88, "bits": 8,
                     "compression": 1, "photometric": 2,
                     "samples": 3}],
        xmp="<x:xmpmeta>t</x:xmpmeta>",
        transform="subtract_green", cache_bits=3)
    m = C.parse_extended(b)
    assert m["chunks"] == ["VP8X", "VP8L", "EXIF", "XMP"]
    assert (m["canvas_w"], m["canvas_h"]) == (W, H)
    assert m["flags"]["exif"] and m["flags"]["xmp"]
    assert m["flags"]["alpha"]          # _grid alpha varies
    assert not m["flags"]["anim"] and not m["flags"]["icc"]
    assert m["exif"][0]["width"] == 123 and m["exif"][0]["samples"] == 3
    assert m["xmp"] == "<x:xmpmeta>t</x:xmpmeta>"
    assert _flat(m["image"]) == px


def test_extended_plain_and_missing_parts():
    px = [0xFF010203] * (W * H)
    m = C.parse_extended(C.encode_extended(px, W, H))
    assert m["chunks"] == ["VP8X", "VP8L"]
    assert m["exif"] is None and m["xmp"] is None
    assert not m["flags"]["alpha"]      # constant 0xFF alpha
    assert _flat(m["image"]) == px
    # a simple (non-extended) member still walks: one VP8L chunk
    m2 = C.parse_extended(C.encode(px, W, H))
    assert m2["chunks"] == ["VP8L"] and m2["canvas_w"] is None
    assert _flat(m2["image"]) == px
    assert C.parse_extended(b"junk") is None


def test_single_pixel_and_one_row():
    for w, h in [(1, 1), (5, 1), (1, 6)]:
        px = [(0xFF000000 | (i * 37 % 256) << 8) for i in range(w * h)]
        assert _flat(C.decode(C.encode(px, w, h))) == px
