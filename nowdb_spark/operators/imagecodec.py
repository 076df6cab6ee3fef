"""Pure-Python BMP / PPM / PNG image codec — the real decode path for
the multimodal operators.

The container ships no codec libraries (PIL, libav); formats whose
entropy coder is NOT in the stdlib (JPEG arithmetic/Huffman-DCT,
video) stay honestly stubbed in `multimodal.py`. Everything the
stdlib can express is decoded for real:

  BMP  — 14-byte file header ('BM', file size, pixel-array offset) +
         BITMAPINFOHEADER (40 bytes: width, height, planes, bpp),
         24-bit uncompressed pixels, BGR order, rows bottom-up
         (top-down when height < 0), stride padded to 4 bytes.
  PPM  — netpbm 'P6' (binary) / 'P3' (ascii): whitespace/comment
         tolerant header `P6 <w> <h> <maxval>` then RGB triplets.
  PNG  — real entropy-coded path: chunk stream (IHDR/PLTE/IDAT/IEND,
         CRC-verified), IDAT inflated with stdlib zlib (DEFLATE =
         LZ77 + Huffman), per-scanline filters None/Sub/Up/Average/
         Paeth reversed; 8-bit gray / truecolor / palette / +alpha,
         non-interlaced.
  GIF  — second real entropy-coded path, decoder written here: LSB-
         first variable-width LZW (3..12-bit codes, CLEAR/EOI, KwKwK
         case, table freeze at 4096), global/local color tables,
         extension-block skipping, 4-pass interlace; encoder emits
         single-frame GIF89a with a palette built from the pixels.

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
    import zlib

    PNG_SIG = b"\x89PNG\r\n\x1a\n"

    # JPEG delegate (baseline+progressive Huffman-DCT, jpegcodec.py); its
    # closures are nested too, so the captured namespace still ships
    # by value to executors
    from nowdb_spark.operators.jpegcodec import make_jpeg_codec
    _jpeg = make_jpeg_codec()

    def sniff(b: bytes):
        if len(b) >= 2 and b[:2] == b"BM":
            return "bmp"
        if len(b) >= 2 and b[:2] in (b"P6", b"P3"):
            return "ppm"
        if len(b) >= 8 and b[:8] == PNG_SIG:
            return "png"
        if len(b) >= 6 and b[:6] in (b"GIF87a", b"GIF89a"):
            return "gif"
        if _jpeg.sniff(b):
            return "jpeg"
        return None

    # -- GIF (LZW entropy coding, variable-width codes) --------------
    def _gif_lzw_decode(min_code_size: int, data: bytes):
        """GIF-variant LZW: LSB-first bitstream, code widths grow
        from min+1 up to 12 bits, CLEAR resets the table."""
        clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
        base = [bytes([i]) for i in range(clear)] + [b"", b""]
        table = list(base)
        code_size = min_code_size + 1
        out = bytearray()
        acc = nbits = 0
        prev = None
        for byte in data:
            acc |= byte << nbits
            nbits += 8
            while nbits >= code_size:
                code = acc & ((1 << code_size) - 1)
                acc >>= code_size
                nbits -= code_size
                if code == clear:
                    table = list(base)
                    code_size = min_code_size + 1
                    prev = None
                    continue
                if code == eoi:
                    return bytes(out)
                if prev is None:
                    if code >= len(table):
                        return None
                    out += table[code]
                    prev = code
                    continue
                if code < len(table):
                    entry = table[code]
                    if len(table) < 4096:    # table freezes when full
                        table.append(table[prev] + entry[:1])
                elif code == len(table) and len(table) < 4096:
                    entry = table[prev] + table[prev][:1]
                    table.append(entry)
                else:
                    return None
                out += entry
                prev = code
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        return bytes(out)                    # EOI-less streams exist

    def _gif_lzw_encode(min_code_size: int, idx: bytes) -> bytes:
        clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        code_size = min_code_size + 1
        out = bytearray()
        acc = nbits = 0

        def emit(code: int):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += code_size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        cur = b""
        for k in idx:
            nxt = cur + bytes([k])
            if nxt in table:
                cur = nxt
                continue
            emit(table[cur])
            # mirror of the decoder's growth rule: the decoder widens
            # when ITS table (one entry behind ours) hits 2^code_size
            if next_code < 4096:
                table[nxt] = next_code
                next_code += 1
                if next_code - 1 == (1 << code_size) and code_size < 12:
                    code_size += 1
            cur = bytes([k])
        if cur:
            emit(table[cur])
        emit(eoi)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    def _gif_decode(b: bytes):
        if len(b) < 13:
            return None
        w, h = struct.unpack_from("<HH", b, 6)
        packed = b[10]
        off = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = [(b[off + 3 * i], b[off + 3 * i + 1],
                    b[off + 3 * i + 2]) for i in range(n)]
            off += 3 * n
        rows = None
        n_frames = 0
        while off < len(b):
            block = b[off]
            if block == 0x3B:                # trailer
                break
            if block == 0x21:                # extension: label + subs
                off += 2
                while off < len(b) and b[off] != 0:
                    off += 1 + b[off]
                off += 1
                continue
            if block != 0x2C:
                return None
            ix, iy, iw, ih = struct.unpack_from("<HHHH", b, off + 1)
            ipacked = b[off + 9]
            off += 10
            pal = gct
            if ipacked & 0x80:               # local color table
                n = 2 << (ipacked & 0x07)
                pal = [(b[off + 3 * i], b[off + 3 * i + 1],
                        b[off + 3 * i + 2]) for i in range(n)]
                off += 3 * n
            interlaced = bool(ipacked & 0x40)
            if off >= len(b):
                return None
            mcs = b[off]
            off += 1
            data = bytearray()
            while off < len(b) and b[off] != 0:
                ln = b[off]
                data += b[off + 1:off + 1 + ln]
                off += 1 + ln
            if off >= len(b):
                return None
            off += 1                         # block terminator
            n_frames += 1
            if rows is not None:             # stats use frame 1 only
                continue
            if pal is None or not (2 <= mcs <= 11):
                return None
            idx = _gif_lzw_decode(mcs, bytes(data))
            if idx is None or len(idx) < iw * ih:
                return None
            grid = [[pal[idx[r * iw + x] % len(pal)] for x in range(iw)]
                    for r in range(ih)]
            if interlaced:                   # 8/8, 8/8+4, 4/4+2, 2/2+1
                deint = [None] * ih
                src = iter(grid)
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    for r in range(start, ih, step):
                        deint[r] = next(src)
                grid = deint
            rows = grid
        if rows is None:
            return None
        return {"fmt": "gif", "width": len(rows[0]), "height": len(rows),
                "n_bytes": len(b), "rows": rows}

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

    # -- PNG chunk walk / inflate / unfilter -------------------------
    def _png_chunks(b: bytes):
        """Yield (type, data) for each CRC-valid chunk; stop at IEND
        or the first corrupt chunk."""
        i = 8
        while i + 8 <= len(b):
            (ln,) = struct.unpack_from(">I", b, i)
            typ = b[i + 4:i + 8]
            data = b[i + 8:i + 8 + ln]
            if len(data) < ln or i + 12 + ln > len(b):
                return
            (crc,) = struct.unpack_from(">I", b, i + 8 + ln)
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                return
            yield typ, data
            if typ == b"IEND":
                return
            i += 12 + ln

    def _png_header(b: bytes):
        for typ, data in _png_chunks(b):
            if typ == b"IHDR" and len(data) >= 13:
                w, h = struct.unpack_from(">II", data, 0)
                depth, ctype, comp, filt, ilace = data[8:13]
                return (w, h, depth, ctype, comp, filt, ilace)
            break
        return None

    def _paeth(a, bb, c):
        p = a + bb - c
        pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return bb if pb <= pc else c

    def _png_decode(b: bytes):
        hdr = _png_header(b)
        if hdr is None:
            return None
        w, h, depth, ctype, comp, filt, ilace = hdr
        # 8-bit, non-interlaced; gray(0) rgb(2) palette(3) +alpha(4,6)
        if depth != 8 or comp != 0 or filt != 0 or ilace != 0 \
                or ctype not in (0, 2, 3, 4, 6) or w <= 0 or h <= 0:
            return None
        nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
        plte = None
        idat = bytearray()
        for typ, data in _png_chunks(b):
            if typ == b"PLTE":
                plte = [(data[i], data[i + 1], data[i + 2])
                        for i in range(0, len(data) - 2, 3)]
            elif typ == b"IDAT":
                idat += data
        try:
            raw = zlib.decompress(bytes(idat))
        except zlib.error:
            return None
        stride = w * nch
        if len(raw) < h * (stride + 1):
            return None
        rows = []
        prev = bytearray(stride)
        pos = 0
        for _y in range(h):
            ftype = raw[pos]
            line = bytearray(raw[pos + 1:pos + 1 + stride])
            pos += 1 + stride
            if ftype == 1:                              # Sub
                for i in range(nch, stride):
                    line[i] = (line[i] + line[i - nch]) & 0xFF
            elif ftype == 2:                            # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:                            # Average
                for i in range(stride):
                    left = line[i - nch] if i >= nch else 0
                    line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:                            # Paeth
                for i in range(stride):
                    left = line[i - nch] if i >= nch else 0
                    ul = prev[i - nch] if i >= nch else 0
                    line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
            elif ftype != 0:
                return None
            prev = line
            if ctype == 2:
                row = [(line[3 * x], line[3 * x + 1], line[3 * x + 2])
                       for x in range(w)]
            elif ctype == 6:
                row = [(line[4 * x], line[4 * x + 1], line[4 * x + 2])
                       for x in range(w)]
            elif ctype == 0:
                row = [(line[x],) * 3 for x in range(w)]
            elif ctype == 4:
                row = [(line[2 * x],) * 3 for x in range(w)]
            else:                                       # palette
                if plte is None:
                    return None
                try:
                    row = [plte[line[x]] for x in range(w)]
                except IndexError:
                    return None
            rows.append(row)
        return {"fmt": "png", "width": w, "height": h,
                "n_bytes": len(b), "rows": rows}

    def encode_gif(w: int, h: int, rows) -> bytes:
        """GIF89a, single frame, global color table built from the
        distinct pixel colors (≤ 256), non-interlaced, real LZW."""
        colors = []
        index = {}
        for row in rows:
            for px in row:
                if px not in index:
                    index[px] = len(colors)
                    colors.append(px)
        if len(colors) > 256:
            raise ValueError("GIF needs <= 256 distinct colors")
        bits = max(1, (len(colors) - 1).bit_length())
        n = 1 << bits
        mcs = max(2, bits)                   # LZW min code size
        out = [b"GIF89a", struct.pack("<HH", w, h),
               bytes([0x80 | (bits - 1), 0, 0])]
        pal = bytearray()
        for c in colors:
            pal += bytes(c)
        pal += b"\0" * (3 * (n - len(colors)))
        out.append(bytes(pal))
        out.append(b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\0")
        out.append(bytes([mcs]))
        idx = bytes(index[px] for row in rows for px in row)
        lzw = _gif_lzw_encode(mcs, idx)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(bytes([len(chunk)]) + chunk)
        out.append(b"\0\x3B")
        return b"".join(out)

    def decode_meta(b: bytes):
        fmt = sniff(b)
        if fmt == "jpeg":
            m = _jpeg.decode_meta(b)
            if m is None:
                return None
            return {"fmt": "jpeg", "width": m["width"],
                    "height": m["height"], "n_bytes": len(b)}
        if fmt == "gif":
            if len(b) < 10:
                return None
            w, h = struct.unpack_from("<HH", b, 6)
            return {"fmt": "gif", "width": w, "height": h,
                    "n_bytes": len(b)}
        if fmt == "png":
            hdr = _png_header(b)
            if hdr is None:
                return None
            return {"fmt": "png", "width": hdr[0], "height": hdr[1],
                    "n_bytes": len(b)}
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
        if fmt == "jpeg":
            d = _jpeg.decode(b)
            if d is None:
                return None
            return {"fmt": "jpeg", "width": d["width"],
                    "height": d["height"], "n_bytes": len(b),
                    "rows": d["rows"]}
        if fmt == "gif":
            return _gif_decode(b)
        if fmt == "png":
            return _png_decode(b)
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

    def encode_png(w: int, h: int, rows, cycle_filters: bool = True) -> bytes:
        """8-bit truecolor PNG. `cycle_filters` applies filter type
        y % 5 per scanline (None/Sub/Up/Average/Paeth) so a decoder
        must implement ALL five reconstructions to round-trip; False
        writes filter 0 only."""
        def chunk(typ: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data)
                                  & 0xFFFFFFFF))
        stride = 3 * w
        raw = bytearray()
        prev = bytearray(stride)
        for y in range(h):
            line = bytearray()
            for rd, g, bl in rows[y]:
                line += bytes((rd, g, bl))
            f = (y % 5) if cycle_filters else 0
            filt = bytearray(stride)
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                if f == 0:
                    filt[i] = line[i]
                elif f == 1:
                    filt[i] = (line[i] - left) & 0xFF
                elif f == 2:
                    filt[i] = (line[i] - prev[i]) & 0xFF
                elif f == 3:
                    filt[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
                else:
                    filt[i] = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
            raw += bytes([f]) + filt
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
                + chunk(b"IEND", b""))

    def resize_nn(b: bytes, tw: int, th: int):
        img = decode(b)
        if img is None:
            return None
        w, h, rows = img["width"], img["height"], img["rows"]
        resized = [[rows[r * h // th][x * w // tw] for x in range(tw)]
                   for r in range(th)]
        return encode_bmp(tw, th, resized)

    def png_text(b: bytes):
        """PNG textual metadata (PNG spec §11.3.4): [(keyword, text),
        …] from tEXt (latin-1), zTXt (deflated latin-1) and the
        uncompressed-utf8 iTXt form, in chunk order; CRC-invalid
        chunks stop the walk (same contract as decode). None for
        non-PNG bytes."""
        if b[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        out = []
        for typ, data in _png_chunks(b):
            if typ == b"tEXt":
                k, _, v = data.partition(b"\x00")
                out.append((k.decode("latin1"), v.decode("latin1")))
            elif typ == b"zTXt":
                k, _, rest = data.partition(b"\x00")
                if rest[:1] == b"\x00":      # method 0 = deflate
                    try:
                        out.append((k.decode("latin1"),
                                    zlib.decompress(rest[1:])
                                    .decode("latin1")))
                    except zlib.error:
                        continue
            elif typ == b"iTXt":
                k, _, rest = data.partition(b"\x00")
                # comp flag, comp method, then lang\0translated\0text
                if rest[:2] == b"\x00\x00":
                    r2 = rest[2:].split(b"\x00", 2)
                    if len(r2) == 3:
                        out.append((k.decode("latin1"),
                                    r2[2].decode("utf-8", "replace")))
        return out

    def png_add_text(png: bytes, pairs, compressed: bool = False) -> bytes:
        """Inject tEXt/zTXt chunks (CRC-stamped) before IEND of an
        encoded PNG — the fixture builder for png_text."""
        chunks = bytearray()
        for k, v in pairs:
            if compressed:
                data = (k.encode("latin1") + b"\x00\x00"
                        + zlib.compress(v.encode("latin1")))
                typ = b"zTXt"
            else:
                data = k.encode("latin1") + b"\x00" + v.encode("latin1")
                typ = b"tEXt"
            chunks += struct.pack(">I", len(data)) + typ + data
            chunks += struct.pack(
                ">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        at = png.rfind(b"IEND") - 4
        return png[:at] + bytes(chunks) + png[at:]

    return SimpleNamespace(sniff=sniff, decode_meta=decode_meta,
                           decode=decode, encode_bmp=encode_bmp,
                           encode_ppm=encode_ppm, encode_png=encode_png,
                           encode_gif=encode_gif, resize_nn=resize_nn,
                           png_text=png_text, png_add_text=png_add_text)


# Driver-side convenience instance (kernels must call
# make_image_codec() themselves / close over a local instance so the
# closures ship by value).
CODEC = make_image_codec()
