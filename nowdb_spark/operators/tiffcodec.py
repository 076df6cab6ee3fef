"""Pure-Python TIFF metadata codec — IFD walk, both byte orders.

Built from the public TIFF 6.0 specification: 8-byte header ('II'
little- / 'MM' big-endian + magic 42 + first-IFD offset), then the
IFD chain — each directory is a 12-byte-entry table whose values live
inline when they fit in 4 bytes and behind an offset otherwise. The
baseline tags a corpus pipeline needs are extracted per page: width
(256), height (257), bits-per-sample (258, possibly per-channel
behind an offset), compression (259), photometric (262),
samples-per-pixel (277). Multi-page files follow the next-IFD chain.
Pixel decode (PackBits/LZW strips) stays honestly out of scope —
this is the metadata layer, like the MP4/MP3 rows.

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

    return SimpleNamespace(sniff=sniff, tiff_meta=tiff_meta,
                           encode_tiff=encode_tiff)


# driver-side convenience instance (kernels build their own)
TIFF_CODEC = make_tiff_codec()
