"""Pure-Python BMP / PPM image codec — the real decode path for the
multimodal operators.

The container ships no codec libraries (PIL, libav), so formats that
need entropy decoding stay honestly stubbed in `multimodal.py`. But
uncompressed formats are header + pixel arithmetic, which plain Python
does fine:

  BMP  — 14-byte file header ('BM', file size, pixel-array offset) +
         BITMAPINFOHEADER (40 bytes: width, height, planes, bpp),
         24-bit uncompressed pixels, BGR order, rows bottom-up
         (top-down when height < 0), stride padded to 4 bytes.
  PPM  — netpbm 'P6' (binary) / 'P3' (ascii): whitespace/comment
         tolerant header `P6 <w> <h> <maxval>` then RGB triplets.

Everything is built by `make_image_codec()` as NESTED closures so
cloudpickle ships the code by value to executors — a mapInPandas
kernel can close over the returned codec without requiring
`nowdb_spark` to be importable on the worker (same self-containment
rule as the other multimodal kernels).

Reference parity note: the reference engine has no media handling at
all; this module belongs to the training-data-pipeline extension
surface (SURVEY.md §2 pipeline family), not reference parity.
"""

from __future__ import annotations

from types import SimpleNamespace


def make_image_codec() -> SimpleNamespace:
    """Build the codec as self-contained closures.

    Returns a namespace with:
      sniff(b)            -> 'bmp' | 'ppm' | None
      decode_meta(b)      -> {fmt, width, height, n_bytes} | None
      decode(b)           -> {fmt, width, height, n_bytes, rows} | None
                             rows = list[list[(r, g, b)]], top-down
      encode_bmp(w,h,rows)-> bytes (24-bit, bottom-up, padded stride)
      encode_ppm(w,h,rows)-> bytes (binary P6)
      resize_nn(b, tw, th)-> bytes | None (nearest-neighbor, BMP out)
    """
    import struct

    def sniff(b: bytes):
        if len(b) >= 2 and b[:2] == b"BM":
            return "bmp"
        if len(b) >= 2 and b[:2] in (b"P6", b"P3"):
            return "ppm"
        return None

    # -- PPM header scanning (whitespace + '#'-comment tolerant) -----
    def _ppm_tokens(b: bytes, n_tokens: int):
        """First n_tokens whitespace-separated tokens after the magic,
        skipping '#' comments; returns (tokens, offset_after_last)."""
        toks, i, tok = [], 2, b""
        while i < len(b) and len(toks) < n_tokens:
            c = b[i:i + 1]
            if c == b"#":
                while i < len(b) and b[i:i + 1] != b"\n":
                    i += 1
            elif c in b" \t\r\n":
                if tok:
                    toks.append(tok)
                    tok = b""
            else:
                tok += c
            i += 1
        if tok and len(toks) < n_tokens:
            toks.append(tok)
        return toks, i

    def decode_meta(b: bytes):
        fmt = sniff(b)
        if fmt == "bmp":
            if len(b) < 26:
                return None
            w = struct.unpack_from("<i", b, 18)[0]
            h = struct.unpack_from("<i", b, 22)[0]
            return {"fmt": "bmp", "width": abs(w), "height": abs(h),
                    "n_bytes": len(b)}
        if fmt == "ppm":
            toks, _ = _ppm_tokens(b, 2)
            if len(toks) < 2:
                return None
            try:
                w, h = int(toks[0]), int(toks[1])
            except ValueError:
                return None
            return {"fmt": "ppm", "width": w, "height": h,
                    "n_bytes": len(b)}
        return None

    def decode(b: bytes):
        fmt = sniff(b)
        if fmt == "bmp":
            if len(b) < 54:
                return None
            off = struct.unpack_from("<I", b, 10)[0]
            w = struct.unpack_from("<i", b, 18)[0]
            h = struct.unpack_from("<i", b, 22)[0]
            bpp = struct.unpack_from("<H", b, 28)[0]
            comp = struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or comp != 0 or w <= 0 or h == 0:
                return None          # only the uncompressed 24-bit form
            top_down = h < 0
            ah = abs(h)
            stride = (3 * w + 3) // 4 * 4
            rows = []
            for r in range(ah):
                src_r = r if top_down else ah - 1 - r
                base = off + src_r * stride
                row = []
                for x in range(w):
                    i = base + 3 * x
                    bl, g, rd = b[i], b[i + 1], b[i + 2]
                    row.append((rd, g, bl))
                rows.append(row)
            return {"fmt": "bmp", "width": w, "height": ah,
                    "n_bytes": len(b), "rows": rows}
        if fmt == "ppm":
            binary = b[:2] == b"P6"
            toks, off = _ppm_tokens(b, 3)
            if len(toks) < 3:
                return None
            w, h, maxval = (int(t) for t in toks)
            if w <= 0 or h <= 0 or maxval <= 0 or maxval > 255:
                return None
            if binary:
                px = b[off:off + 3 * w * h]
                if len(px) < 3 * w * h:
                    return None
                it = iter(px)
            else:
                vals, _ = _ppm_tokens(b, 3 + 3 * w * h)
                if len(vals) < 3 + 3 * w * h:
                    return None
                it = iter(int(v) for v in vals[3:])
            rows = [[(next(it), next(it), next(it)) for _ in range(w)]
                    for _ in range(h)]
            return {"fmt": "ppm", "width": w, "height": h,
                    "n_bytes": len(b), "rows": rows}
        return None

    def encode_bmp(w: int, h: int, rows) -> bytes:
        stride = (3 * w + 3) // 4 * 4
        size = 54 + stride * h
        out = bytearray()
        out += b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
        out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           stride * h, 2835, 2835, 0, 0)
        pad = b"\x00" * (stride - 3 * w)
        for r in range(h - 1, -1, -1):       # bottom-up
            for rd, g, bl in rows[r]:
                out += bytes((bl, g, rd))
            out += pad
        return bytes(out)

    def encode_ppm(w: int, h: int, rows) -> bytes:
        out = bytearray(b"P6\n%d %d\n255\n" % (w, h))
        for row in rows:
            for rd, g, bl in row:
                out += bytes((rd, g, bl))
        return bytes(out)

    def resize_nn(b: bytes, tw: int, th: int):
        img = decode(b)
        if img is None:
            return None
        w, h, rows = img["width"], img["height"], img["rows"]
        resized = [[rows[r * h // th][x * w // tw] for x in range(tw)]
                   for r in range(th)]
        return encode_bmp(tw, th, resized)

    return SimpleNamespace(sniff=sniff, decode_meta=decode_meta,
                           decode=decode, encode_bmp=encode_bmp,
                           encode_ppm=encode_ppm, resize_nn=resize_nn)


# Driver-side convenience instance (kernels must call
# make_image_codec() themselves / close over a local instance so the
# closures ship by value).
CODEC = make_image_codec()
