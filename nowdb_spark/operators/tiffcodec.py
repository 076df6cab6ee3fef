"""Pure-Python TIFF metadata codec — IFD walk, both byte orders.

Built from the public TIFF 6.0 specification: 8-byte header ('II'
little- / 'MM' big-endian + magic 42 + first-IFD offset), then the
IFD chain — each directory is a 12-byte-entry table whose values live
inline when they fit in 4 bytes and behind an offset otherwise. The
baseline tags a corpus pipeline needs are extracted per page: width
(256), height (257), bits-per-sample (258, possibly per-channel
behind an offset), compression (259), photometric (262),
samples-per-pixel (277). Multi-page files follow the next-IFD chain.
The pixel layer decodes strip rasters for the three baseline
compressions — 1 (none), 32773 (PackBits, §9) and 5 (LZW, §13:
MSB-first code packing, 9→12-bit codes with the EARLY width change,
Clear/EOI handling, KwKwK case) — plus Predictor 2 (horizontal
differencing, §14); 8-bit samples, gray and RGB interleaved. Other
compressions (G3/G4 fax, JPEG-in-TIFF, Deflate) degrade to
metadata-only via tiff_meta.

Built by `make_tiff_codec()` as nested closures so cloudpickle ships
the code by value to executors.

Reference parity note: the reference engine has no media handling;
this belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family).
"""

from __future__ import annotations

from types import SimpleNamespace


def make_tiff_codec() -> SimpleNamespace:
    """Returns a namespace with:
      sniff(b)        -> 'tiff' | None
      tiff_meta(b)    -> list of per-page dicts {page, width, height,
                         bits, compression, photometric, samples}
                         | None for non-TIFF bytes
      encode_tiff(pages, big_endian) -> bytes — real baseline TIFF
                         (one IFD per page dict, next-IFD chaining,
                         out-of-line BitsPerSample when samples > 2)
    """
    import struct

    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

    def sniff(b: bytes):
        if len(b) >= 8 and b[:4] in (b"II*\x00", b"MM\x00*"):
            return "tiff"
        return None

    def tiff_meta(b: bytes):
        if sniff(b) is None:
            return None
        bo = "<" if b[:2] == b"II" else ">"

        def u16(off):
            return struct.unpack_from(bo + "H", b, off)[0]

        def u32(off):
            return struct.unpack_from(bo + "I", b, off)[0]

        def read_value(typ, count, voff):
            """First value of an entry (SHORT/LONG; inline or behind
            the offset when the payload exceeds 4 bytes)."""
            size = _TYPE_SIZE.get(typ)
            if size is None:
                return None
            if size * count > 4:
                voff = u32(voff)
                if voff + size > len(b):
                    return None
            if typ == 3:
                return u16(voff)
            if typ == 4:
                return u32(voff)
            if typ == 1:
                return b[voff]
            return None

        out, seen = [], set()
        ifd = u32(4)
        page = 0
        while ifd and ifd not in seen and ifd + 2 <= len(b):
            seen.add(ifd)
            n = u16(ifd)
            if ifd + 2 + 12 * n + 4 > len(b):
                break
            rec = {"page": page, "width": None, "height": None,
                   "bits": None, "compression": None,
                   "photometric": None, "samples": None}
            for e in range(n):
                off = ifd + 2 + 12 * e
                tag, typ = u16(off), u16(off + 2)
                count = u32(off + 4)
                val = read_value(typ, count, off + 8)
                if tag == 256:
                    rec["width"] = val
                elif tag == 257:
                    rec["height"] = val
                elif tag == 258:
                    rec["bits"] = val
                elif tag == 259:
                    rec["compression"] = val
                elif tag == 262:
                    rec["photometric"] = val
                elif tag == 277:
                    rec["samples"] = val
            out.append(rec)
            ifd = u32(ifd + 2 + 12 * n)
            page += 1
        return out or None

    def encode_tiff(pages: list, big_endian: bool = False) -> bytes:
        """``pages`` = dicts with width/height/bits/compression/
        photometric/samples. BitsPerSample is written out-of-line
        (count = samples) when samples > 2 — exercising the
        offset-indirection path."""
        bo = ">" if big_endian else "<"
        out = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
        out += struct.pack(bo + "I", 8)
        for i, p in enumerate(pages):
            samples = p.get("samples", 1)
            entries = [
                (256, 3, 1, p["width"]), (257, 3, 1, p["height"]),
                (259, 3, 1, p.get("compression", 1)),
                (262, 3, 1, p.get("photometric", 1)),
                (277, 3, 1, samples),
            ]
            bits_inline = samples * 2 <= 4
            ifd_at = len(out)
            n = len(entries) + 1             # + BitsPerSample
            after = ifd_at + 2 + 12 * n + 4  # next-IFD link included
            ext = bytearray()
            if bits_inline:
                entries.append((258, 3, samples, p.get("bits", 8)))
            else:
                entries.append((258, 3, samples, after))
                for _ in range(samples):
                    ext += struct.pack(bo + "H", p.get("bits", 8))
            entries.sort()
            out += struct.pack(bo + "H", n)
            for tag, typ, count, val in entries:
                out += struct.pack(bo + "HHI", tag, typ, count)
                if typ == 3 and count == 1:
                    out += struct.pack(bo + "HH", val, 0)
                elif typ == 3 and count == 2:
                    out += struct.pack(bo + "HH", val, val)
                else:
                    out += struct.pack(bo + "I", val)
            nxt = after + len(ext) if i + 1 < len(pages) else 0
            out += struct.pack(bo + "I", nxt)
            out += ext
        return bytes(out)

    # -------------------------------------------------------------
    # Pixel layer (TIFF 6.0 §7/§9/§14): strip storage with
    # Compression 1 (none), 32773 (PackBits) and 5 (LZW, MSB-first
    # codes, early code-width change) plus Predictor 2 (horizontal
    # differencing, defined for LZW). 8-bit samples.

    def _packbits_encode(data: bytes) -> bytes:
        out = bytearray()
        i, n = 0, len(data)
        while i < n:
            run = 1
            while (i + run < n and run < 128
                   and data[i + run] == data[i]):
                run += 1
            if run >= 2:
                out += bytes((257 - run, data[i]))
                i += run
                continue
            # literal stretch: until a 3-byte run starts (2-byte runs
            # are cheaper inside a literal than breaking it)
            j = i + 1
            while j < n and j - i < 128:
                if (j + 2 < n and data[j] == data[j + 1] == data[j + 2]):
                    break
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
        return bytes(out)

    def _packbits_decode(data: bytes) -> bytes:
        out = bytearray()
        i, n = 0, len(data)
        while i < n:
            h = data[i]
            i += 1
            if h < 128:                       # h+1 literals
                out += data[i:i + h + 1]
                i += h + 1
            elif h > 128:                     # repeat next 257-h times
                out += bytes((data[i],)) * (257 - h)
                i += 1
            # h == 128: no-op
        return bytes(out)

    _CLEAR, _EOI = 256, 257

    def _lzw_encode(data: bytes) -> bytes:
        """TIFF-flavor LZW: MSB-first code packing, 9-bit start,
        EARLY width change (grow when the next code to be assigned is
        (1<<w)-1), Clear at 4094 entries."""
        out = bytearray()
        acc = nbits = 0

        def put(code, width):
            nonlocal acc, nbits
            acc = (acc << width) | code
            nbits += width
            while nbits >= 8:
                nbits -= 8
                out.append((acc >> nbits) & 0xFF)

        table = {bytes((i,)): i for i in range(256)}
        nxt, width = 258, 9
        put(_CLEAR, width)
        w = b""
        for ch in data:
            wk = w + bytes((ch,))
            if wk in table:
                w = wk
                continue
            put(table[w], width)
            table[wk] = nxt
            nxt += 1
            if nxt == (1 << width) - 1 and width < 12:  # early change
                width += 1
            if nxt == 4094:
                put(_CLEAR, width)
                table = {bytes((i,)): i for i in range(256)}
                nxt, width = 258, 9
            w = bytes((ch,))
        if w:
            put(table[w], width)
            # the decoder's table catches up to ours while processing
            # this final code (we add no entry for it), so its
            # post-add early-change check fires at (1<<w)-2 with the
            # SAME count we hold now — mirror it for the EOI width
            if nxt == (1 << width) - 2 and width < 12:
                width += 1
        put(_EOI, width)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    def _lzw_decode(data: bytes) -> bytes:
        out = bytearray()
        acc = nbits = pos = 0
        table: list = []
        nxt = width = 0
        prev = None

        def reset():
            nonlocal table, nxt, width, prev
            table = [bytes((i,)) for i in range(256)] + [b"", b""]
            nxt, width, prev = 258, 9, None

        reset()
        n = len(data)
        while True:
            while nbits < width:
                if pos >= n:
                    return bytes(out)
                acc = (acc << 8) | data[pos]
                pos += 1
                nbits += 8
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == _EOI:
                return bytes(out)
            if code == _CLEAR:
                reset()
                continue
            if prev is None:
                if code >= 256:          # first code after Clear must
                    raise ValueError("corrupt LZW stream")  # be literal
                entry = table[code]
            elif code < nxt:
                entry = table[code]
                table.append(prev + entry[:1])
                nxt += 1
            elif code == nxt:                 # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
                nxt += 1
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            # early change, one-code lag: the decoder's table trails
            # the encoder's by one entry, so the width bump lands at
            # (1<<w)-2 here to align with the encoder's (1<<w)-1
            if nxt == (1 << width) - 2 and width < 12:
                width += 1

    def _predict2(raw: bytes, w: int, samples: int) -> bytes:
        """Forward horizontal differencing (Predictor 2), per row."""
        b = bytearray(raw)
        stride = w * samples
        for r0 in range(0, len(b), stride):
            for x in range(stride - 1, samples - 1, -1):
                b[r0 + x] = (b[r0 + x] - b[r0 + x - samples]) & 0xFF
        return bytes(b)

    def _unpredict2(raw: bytes, w: int, samples: int) -> bytes:
        b = bytearray(raw)
        stride = w * samples
        for r0 in range(0, len(b), stride):
            for x in range(samples, stride):
                b[r0 + x] = (b[r0 + x] + b[r0 + x - samples]) & 0xFF
        return bytes(b)

    _COMP_ENC = {1: lambda d: d, 5: _lzw_encode, 32773: _packbits_encode}
    _COMP_DEC = {1: lambda d: d, 5: _lzw_decode, 32773: _packbits_decode}

    def encode_tiff_pixels(pages: list, big_endian: bool = False) -> bytes:
        """Real raster TIFF. ``pages`` = dicts with width/height/
        samples/compression(1|5|32773)/predictor(1|2, LZW only)/
        pixels (bytes, w*h*samples, 8-bit interleaved) and optional
        rows_per_strip (default splits into ~3 strips)."""
        bo = ">" if big_endian else "<"
        out = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
        out += struct.pack(bo + "I", 8)
        hdr_link, prev_link = 4, None
        for p in pages:
            w, h = p["width"], p["height"]
            samples = p.get("samples", 1)
            comp = p.get("compression", 1)
            pred = p.get("predictor", 1)
            rps = p.get("rows_per_strip") or max(1, (h + 2) // 3)
            raw = p["pixels"]
            if len(raw) != w * h * samples:
                raise ValueError("pixel buffer size mismatch")
            if pred == 2:
                raw = _predict2(raw, w, samples)
            stride = w * samples
            strips = [_COMP_ENC[comp](raw[r * stride:(r + rps) * stride])
                      for r in range(0, h, rps)]
            offs, counts = [], []
            for s in strips:
                offs.append(len(out))
                counts.append(len(s))
                out += s
            k = len(strips)
            entries = [
                (256, 3, 1, w), (257, 3, 1, h),
                (259, 3, 1, comp),
                (262, 3, 1, p.get("photometric", 2 if samples >= 3 else 1)),
                (277, 3, 1, samples), (278, 4, 1, rps),
            ]
            if pred != 1:
                entries.append((317, 3, 1, pred))
            bits_inline = samples * 2 <= 4
            n = len(entries) + 3              # + bits + offs + counts
            ifd_at = len(out)
            after = ifd_at + 2 + 12 * n + 4
            ext = bytearray()
            if bits_inline:
                entries.append((258, 3, samples, p.get("bits", 8)))
            else:
                entries.append((258, 3, samples, after + len(ext)))
                for _ in range(samples):
                    ext += struct.pack(bo + "H", p.get("bits", 8))
            if k == 1:
                entries.append((273, 4, 1, offs[0]))
                entries.append((279, 4, 1, counts[0]))
            else:
                entries.append((273, 4, k, after + len(ext)))
                for o in offs:
                    ext += struct.pack(bo + "I", o)
                entries.append((279, 4, k, after + len(ext)))
                for c in counts:
                    ext += struct.pack(bo + "I", c)
            entries.sort()
            # patch the previous page's next-IFD link to here
            if prev_link is not None:
                struct.pack_into(bo + "I", out, prev_link, ifd_at)
            else:
                struct.pack_into(bo + "I", out, hdr_link, ifd_at)
            out += struct.pack(bo + "H", n)
            for tag, typ, count, val in entries:
                out += struct.pack(bo + "HHI", tag, typ, count)
                if typ == 3 and count == 1:
                    out += struct.pack(bo + "HH", val, 0)
                elif typ == 3 and count == 2:
                    out += struct.pack(bo + "HH", val, val)
                else:
                    out += struct.pack(bo + "I", val)
            prev_link = len(out)
            out += struct.pack(bo + "I", 0)
            out += ext
        return bytes(out)

    def tiff_pixels(b: bytes):
        """Full raster decode: per page, strips are located via
        StripOffsets/StripByteCounts, decompressed (none/LZW/
        PackBits), predictor-reversed, and returned as interleaved
        8-bit bytes. Pages with other compressions/bit depths are
        skipped (metadata for those still flows via tiff_meta)."""
        if sniff(b) is None:
            return None
        bo = "<" if b[:2] == b"II" else ">"

        def u16(off):
            return struct.unpack_from(bo + "H", b, off)[0]

        def u32(off):
            return struct.unpack_from(bo + "I", b, off)[0]

        def read_array(typ, count, voff):
            size = _TYPE_SIZE.get(typ)
            if size is None:
                return None
            at = voff if size * count <= 4 else u32(voff)
            if at + size * count > len(b):
                return None
            rd = u16 if typ == 3 else u32
            return [rd(at + i * size) for i in range(count)]

        out, seen = [], set()
        ifd = u32(4)
        page = 0
        while ifd and ifd not in seen and ifd + 2 <= len(b):
            seen.add(ifd)
            n = u16(ifd)
            if ifd + 2 + 12 * n + 4 > len(b):
                break
            t = {}
            for e in range(n):
                off = ifd + 2 + 12 * e
                tag, typ = u16(off), u16(off + 2)
                count = u32(off + 4)
                if tag in (256, 257, 258, 259, 273, 277, 278, 279, 317):
                    t[tag] = read_array(typ, count, off + 8)
            ifd = u32(ifd + 2 + 12 * n)
            pg = page
            page += 1
            try:
                w, h = t[256][0], t[257][0]
                samples = t.get(277, [1])[0]
                comp = t.get(259, [1])[0]
                pred = t.get(317, [1])[0]
                offs, counts = t[273], t[279]
            except (KeyError, TypeError, IndexError):
                continue
            if (comp not in _COMP_DEC or pred not in (1, 2)
                    or any(x != 8 for x in t.get(258, [8]))):
                continue
            raw = bytearray()
            ok = True
            for o, c in zip(offs, counts):
                if o + c > len(b):
                    ok = False
                    break
                try:
                    raw += _COMP_DEC[comp](b[o:o + c])
                except ValueError:
                    ok = False
                    break
            if not ok or len(raw) < w * h * samples:
                continue
            raw = bytes(raw[:w * h * samples])
            if pred == 2:
                raw = _unpredict2(raw, w, samples)
            out.append({"page": pg, "width": w, "height": h,
                        "samples": samples, "compression": comp,
                        "predictor": pred, "pixels": raw})
        return out or None

    return SimpleNamespace(sniff=sniff, tiff_meta=tiff_meta,
                           encode_tiff=encode_tiff,
                           encode_tiff_pixels=encode_tiff_pixels,
                           tiff_pixels=tiff_pixels,
                           _lzw_encode=_lzw_encode,
                           _lzw_decode=_lzw_decode,
                           _packbits_encode=_packbits_encode,
                           _packbits_decode=_packbits_decode)


# driver-side convenience instance (kernels build their own)
TIFF_CODEC = make_tiff_codec()
