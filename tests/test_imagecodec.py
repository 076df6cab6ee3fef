"""Pure-Python BMP/PPM codec + the REAL multimodal decode path.

The codec is the round-3 answer to "multimodal decoders are stubs":
uncompressed formats need no codec libraries, so header + pixel
arithmetic decode for real. The Spark tests drive the same kernels the
mm02/mm03 gates use and assert against the closed-form pixel function
the DuckDB oracle replays.
"""

from __future__ import annotations

import os

import pytest

from nowdb_spark.operators import multimodal as M
from nowdb_spark.operators.imagecodec import make_image_codec

SF_DIR = os.environ.get("NOWDB_TEST_SF_DIR", "/root/testdata/sf0.001")

codec = make_image_codec()


def _grad(w, h, seed=0):
    return [[((seed + 3 * x + 7 * y) % 256, (2 * seed + 5 * x + y) % 256,
              (seed + x * y) % 256) for x in range(w)] for y in range(h)]


# ------------------------------------------------------------------
# codec unit tests
def test_bmp_roundtrip_padded_stride():
    # w=3 -> 9-byte rows padded to 12: exercises the stride math
    for w, h in [(3, 2), (4, 4), (5, 3), (1, 1)]:
        rows = _grad(w, h, seed=w * h)
        b = codec.encode_bmp(w, h, rows)
        assert codec.sniff(b) == "bmp"
        assert codec.decode_meta(b) == {
            "fmt": "bmp", "width": w, "height": h, "n_bytes": len(b)}
        img = codec.decode(b)
        assert img["rows"] == rows          # top-down after decode
        stride = (3 * w + 3) // 4 * 4
        assert len(b) == 54 + stride * h


def test_bmp_topdown_negative_height():
    import struct
    rows = _grad(3, 2, seed=9)
    b = bytearray(codec.encode_bmp(3, 2, rows))
    # flip to the top-down convention: negative height, rows in order
    struct.pack_into("<i", b, 22, -2)
    stride = (3 * 3 + 3) // 4 * 4
    px = bytearray()
    for row in rows:                         # top-down pixel array
        for r, g, bl in row:
            px += bytes((bl, g, r))
        px += b"\x00" * (stride - 9)
    b[54:] = px
    img = codec.decode(bytes(b))
    assert img["height"] == 2 and img["rows"] == rows


def test_ppm_p6_roundtrip_and_comments():
    rows = _grad(4, 3, seed=5)
    b = codec.encode_ppm(4, 3, rows)
    assert codec.sniff(b) == "ppm"
    assert codec.decode(b)["rows"] == rows
    # header comments + weird whitespace are tolerated
    hairy = b"P6 # comment\n# another\n 4\t3 # dims\n255\n" + b[b.index(b"255\n") + 4:]
    assert codec.decode(hairy)["rows"] == rows


def test_ppm_p3_ascii():
    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (250, 251, 252)]]
    ascii_ppm = b"P3\n2 2\n255\n1 2 3 4 5 6\n7 8 9 250 251 252\n"
    img = codec.decode(ascii_ppm)
    assert img["width"] == 2 and img["rows"] == rows


def test_decode_rejects_garbage_and_truncation():
    assert codec.decode(b"") is None
    assert codec.decode(b"xx not an image") is None
    assert codec.decode(b"P6\n4 4\n255\n\x00\x01") is None   # truncated
    good = codec.encode_bmp(4, 4, _grad(4, 4))
    assert codec.decode(good[:40]) is None                   # short header


def test_resize_nn_exact_indices():
    w, h, tw, th = 8, 6, 4, 3
    rows = _grad(w, h, seed=2)
    out = codec.decode(codec.resize_nn(codec.encode_ppm(w, h, rows), tw, th))
    assert (out["width"], out["height"]) == (tw, th)
    for y in range(th):
        for x in range(tw):
            assert out["rows"][y][x] == rows[y * h // th][x * w // tw]


def test_decode_image_entry_real_formats():
    b = codec.encode_bmp(2, 2, _grad(2, 2))
    img = M.decode_image(b)
    assert img["fmt"] == "bmp" and img["width"] == 2
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG\r\n\x1a\n not decodable here")


# ------------------------------------------------------------------
# Spark kernels (same path as the mm02/mm03 gates)
def test_real_decode_matches_pixel_function(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    out = {r["doc_id"]: r
           for r in M.decode_meta_real(M.synth_images(docs)).collect()}
    assert len(out) == 40
    for did, r in out.items():
        w, h = did % 12 + 2, did % 7 + 2
        assert (r["width"], r["height"]) == (w, h)
        assert r["fmt"] == ("bmp" if did % 2 == 0 else "ppm")
        chk = sum((y * w + x + 1) * ((did + 3 * x + 7 * y) % 256
                                     + 2 * ((2 * did + 5 * x + y) % 256)
                                     + 3 * ((did + x * y) % 256))
                  for y in range(h) for x in range(w))
        assert r["px_check"] == chk


def test_real_resize_kernel(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    resized = M.resize_image_real(M.synth_images(docs), 5, 4)
    out = M.decode_meta_real(resized, payload_col="resized").collect()
    assert len(out) == 10
    for r in out:
        assert (r["width"], r["height"], r["fmt"]) == (5, 4, "bmp")
        assert r["n_bytes"] == 118


def test_real_decode_null_on_garbage(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, bytearray(codec.encode_ppm(2, 2, _grad(2, 2))))],
        "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in M.decode_meta_real(df).collect()}
    assert rows[1]["width"] is None and rows[1]["fmt"] is None
    assert rows[1]["n_bytes"] == 12
    assert rows[2]["width"] == 2 and rows[2]["fmt"] == "ppm"


# --- PNG (entropy-coded path: stdlib zlib DEFLATE + filters) --------

def test_png_roundtrip_all_filters():
    """encode_png cycles filter types y%5, so decoding a tall image
    exercises None/Sub/Up/Average/Paeth reconstruction."""
    from nowdb_spark.operators.imagecodec import make_image_codec
    c = make_image_codec()
    for (w, h) in [(7, 9), (1, 5), (13, 11)]:
        rows = [[((x * 7 + y * 3) % 256, (x + y * 11) % 256,
                  (x * x + y) % 256) for x in range(w)]
                for y in range(h)]
        b = c.encode_png(w, h, rows)
        assert c.sniff(b) == "png"
        m = c.decode_meta(b)
        assert (m["width"], m["height"]) == (w, h)
        assert c.decode(b)["rows"] == rows


def test_png_crc_rejected():
    from nowdb_spark.operators.imagecodec import make_image_codec
    c = make_image_codec()
    b = bytearray(c.encode_png(3, 3, [[(1, 2, 3)] * 3] * 3))
    b[20] ^= 0xFF                      # corrupt IHDR payload → CRC fail
    assert c.decode(bytes(b)) is None
    assert c.decode_meta(bytes(b)) is None


def test_png_gray_and_palette():
    """Hand-built gray (color type 0) and palette (type 3) PNGs decode
    through the same path (gray replicates to RGB; palette indexes
    PLTE)."""
    import struct
    import zlib
    from nowdb_spark.operators.imagecodec import make_image_codec
    c = make_image_codec()

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # 3x2 grayscale, filter 0 rows
    raw = b"\x00\x10\x20\x30" + b"\x00\x40\x50\x60"
    g = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    img = c.decode(g)
    assert img["rows"] == [[(0x10,) * 3, (0x20,) * 3, (0x30,) * 3],
                           [(0x40,) * 3, (0x50,) * 3, (0x60,) * 3]]
    # 2x1 palette
    plte = bytes((255, 0, 0, 0, 255, 0))
    p = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
         + chunk(b"PLTE", plte)
         + chunk(b"IDAT", zlib.compress(b"\x00\x00\x01"))
         + chunk(b"IEND", b""))
    assert c.decode(p)["rows"] == [[(255, 0, 0), (0, 255, 0)]]


def test_png_resize_path():
    from nowdb_spark.operators.imagecodec import make_image_codec
    c = make_image_codec()
    rows = [[(x * 30 % 256, y * 30 % 256, 0) for x in range(8)]
            for y in range(8)]
    out = c.resize_nn(c.encode_png(8, 8, rows), 4, 4)
    img = c.decode(out)
    assert img["fmt"] == "bmp" and img["width"] == 4
    assert img["rows"][0][0] == rows[0][0]


# ---------------------------------------------------------------
# GIF: the second real entropy-coded path (variable-width LZW)

_GIF_1PX = bytes.fromhex(
    # the canonical 1x1 white GIF: 2-bit LZW, codes CLEAR(4), 0, EOI(5)
    "474946383961010001008000"
    "00ffffff000000"
    "2c00000000010001000002"
    "024401003b")


def test_gif_known_vector_decodes():
    d = codec.decode(_GIF_1PX)
    assert d is not None
    assert (d["fmt"], d["width"], d["height"]) == ("gif", 1, 1)
    assert d["rows"] == [[(255, 255, 255)]]


def _gif_descriptor_off(b):
    """Image-descriptor offset: header + LSD + global color table."""
    n = 2 << (b[10] & 0x07) if b[10] & 0x80 else 0
    return 13 + 3 * n


def test_gif_roundtrip_crosses_code_widths():
    """200 distinct colors over 64x32 pixels: the LZW table grows from
    9-bit through 11-bit codes, so the width-switch logic on both
    sides must agree exactly."""
    w, h = 64, 32
    rows = [[(lambda v: (v, (v * 3) % 256, (v * 7) % 256))
             ((x * 17 + y * 29) % 200)
             for x in range(w)] for y in range(h)]
    assert len({px for r in rows for px in r}) == 200
    b = codec.encode_gif(w, h, rows)
    d = codec.decode(b)
    assert d["rows"] == rows
    assert codec.decode_meta(b)["width"] == w


def test_gif_roundtrip_two_colors_and_repetitions():
    """Long runs exercise the KwKwK case (code == next table slot)."""
    w, h = 24, 24
    rows = [[(255, 0, 0) if (x + y) % 9 else (0, 0, 255)
             for x in range(w)] for y in range(h)]
    assert codec.decode(codec.encode_gif(w, h, rows))["rows"] == rows


def test_gif_interlaced():
    """Set the interlace flag on a stream whose rows were stored in
    4-pass order; the decoder must reassemble the original grid."""
    w, h = 5, 13
    rows = [[((x * 3 + y) % 256, (y * 5) % 256, (x + 7 * y) % 256)
             for x in range(w)] for y in range(h)]
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(s, h, st)]
    b = codec.encode_gif(w, h, [rows[r] for r in order])
    i = _gif_descriptor_off(b)
    assert b[i] == 0x2C
    b = b[:i + 9] + bytes([b[i + 9] | 0x40]) + b[i + 10:]
    assert codec.decode(b)["rows"] == rows


def test_gif_extension_blocks_skipped():
    """A graphic-control extension before the image descriptor (what
    every real-world GIF89a carries) must be skipped cleanly."""
    rows = [[(1, 2, 3), (4, 5, 6)]]
    b = codec.encode_gif(2, 1, rows)
    i = _gif_descriptor_off(b)
    assert b[i] == 0x2C
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    b = b[:i] + gce + b[i:]
    assert codec.decode(b)["rows"] == rows


def test_gif_malformed():
    assert codec.decode(b"GIF89a") is None
    b = codec.encode_gif(2, 2, [[(0, 0, 0), (1, 1, 1)],
                                [(2, 2, 2), (3, 3, 3)]])
    assert codec.decode(b[:-6]) is None          # truncated data
    with pytest.raises(ValueError):
        codec.encode_gif(1, 300, [[(i, 0, 0)] for i in range(256)]
                         + [[(0, 1, 0)] for _ in range(44)])


# --- PNG textual metadata (tEXt / zTXt / iTXt) ---------------------------

def test_png_text_chunks_roundtrip():
    from nowdb_spark.operators.imagecodec import make_image_codec
    c = make_image_codec()
    png = c.encode_png(2, 1, [[(1, 2, 3), (4, 5, 6)]])
    t = c.png_add_text(png, [("Title", "hello"), ("Author", "A B")])
    t = c.png_add_text(t, [("Z", "zipped text")], compressed=True)
    assert c.png_text(t) == [("Title", "hello"), ("Author", "A B"),
                             ("Z", "zipped text")]
    # pixel decode unaffected by the extra chunks
    assert c.decode(t)["width"] == 2
    # iTXt uncompressed-utf8 form
    import struct
    import zlib as _z
    data = b"K\x00\x00\x00lang\x00tr\x00caf\xc3\xa9"
    chunk = (struct.pack(">I", len(data)) + b"iTXt" + data
             + struct.pack(">I", _z.crc32(b"iTXt" + data) & 0xFFFFFFFF))
    at = t.rfind(b"IEND") - 4
    t2 = t[:at] + chunk + t[at:]
    assert c.png_text(t2)[-1] == ("K", "café")
    assert c.png_text(b"not png") is None
    assert c.png_text(png) == []
