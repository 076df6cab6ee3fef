"""Snappy ingestion — raw block and framing formats from the
published specs (google/snappy format_description.txt and
framing_format.txt), no snappy library.

Raw format: a little-endian varint preamble carrying the
uncompressed length, then tagged elements — tag low 2 bits:
  00 literal  (len = (tag>>2)+1; tag values 60-63 switch to 1-4
               extra little-endian length bytes, value = len−1)
  01 copy     (1-byte offset: len = ((tag>>2)&7)+4,
               offset = ((tag>>5)<<8) | next byte; 4..11 lengths)
  10 copy     (2-byte LE offset, len = (tag>>2)+1)
  11 copy     (4-byte LE offset, len = (tag>>2)+1)
Copies may reach back into earlier output and overlap themselves
(byte-at-a-time semantics = RLE), exactly like LZ4.

Framing format: chunk stream — header = 1-byte type + 3-byte LE
length. Type 0xFF stream identifier (payload literally "sNaPpY"),
0x00 compressed chunk (4-byte MASKED CRC-32C of the UNCOMPRESSED
data + a raw-snappy block), 0x01 uncompressed chunk (masked CRC +
raw bytes). The mask is the same ((crc>>15)|(crc<<17)) + 0xa282ead8
TFRecord uses — both come from the snappy framing spec, so the
CRC-32C/masking implementation is SHARED with sources/tfrecord.py.

Compressor twin: greedy hash-chain matcher (real matches + RLE
overlaps); the decoder is the surface under test. Narrow mapInPandas
reader. Reference parity: training-pipeline extension surface.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

from nowdb_spark.sources.tfrecord import masked_crc

STREAM_ID = b"\xff\x06\x00\x00sNaPpY"


def _read_uvarint(b: bytes, i: int):
    x, shift = 0, 0
    while True:
        if i >= len(b):
            raise ValueError("truncated snappy varint")
        c = b[i]
        i += 1
        x |= (c & 0x7F) << shift
        if not c & 0x80:
            return x, i
        shift += 7
        if shift > 35:
            raise ValueError("snappy varint too long")


def _write_uvarint(x: int) -> bytes:
    out = bytearray()
    while True:
        c = x & 0x7F
        x >>= 7
        if x:
            out.append(c | 0x80)
        else:
            out.append(c)
            return bytes(out)


def decompress_raw(b: bytes, max_out: int = 1 << 26) -> bytes:
    """Raw-format decode with bounds and offset validation."""
    total, i = _read_uvarint(b, 0)
    if total > max_out:
        raise ValueError("declared snappy length exceeds max_out")
    out = bytearray()
    n = len(b)
    while i < n:
        tag = b[i]
        i += 1
        typ = tag & 3
        if typ == 0:                          # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if i + nb > n:
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(b[i:i + nb], "little")
                i += nb
            ln += 1
            if i + ln > n:
                raise ValueError("truncated literal")
            out += b[i:i + ln]
            i += ln
            continue
        if typ == 1:                          # copy, 1-byte offset
            if i >= n:
                raise ValueError("truncated copy-1")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | b[i]
            i += 1
        elif typ == 2:                        # copy, 2-byte offset
            if i + 2 > n:
                raise ValueError("truncated copy-2")
            ln = (tag >> 2) + 1
            (off,) = struct.unpack_from("<H", b, i)
            i += 2
        else:                                 # copy, 4-byte offset
            if i + 4 > n:
                raise ValueError("truncated copy-4")
            ln = (tag >> 2) + 1
            (off,) = struct.unpack_from("<I", b, i)
            i += 4
        if off == 0 or off > len(out):
            raise ValueError(f"bad snappy copy offset {off}")
        src = len(out) - off
        for k in range(ln):                   # overlap = RLE
            out.append(out[src + k])
    if len(out) != total:
        raise ValueError(f"snappy length mismatch: declared {total}, "
                         f"decoded {len(out)}")
    return bytes(out)


def _emit_literal(out: bytearray, lit: bytes):
    ln = len(lit) - 1
    if ln < 60:
        out.append(ln << 2)
    else:
        nb = (ln.bit_length() + 7) // 8
        out.append((59 + nb) << 2)
        out += ln.to_bytes(nb, "little")
    out += lit


def compress_raw(data: bytes) -> bytes:
    """Greedy matcher twin (2-byte-offset copies, 64-length chunks)."""
    out = bytearray(_write_uvarint(len(data)))
    n = len(data)
    table: dict = {}
    anchor = 0
    i = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j:j + 4] == key:
            ml = 4
            while i + ml < n and data[j + ml] == data[i + ml]:
                ml += 1
            if anchor < i:
                _emit_literal(out, data[anchor:i])
            off = i - j
            r = ml
            while r > 0:                       # copy-2 max len 64
                ln = min(r, 64)
                if ln < 4:                     # tail shorter than a
                    break                      # copy: leave literals
                out.append(((ln - 1) << 2) | 2)
                out += struct.pack("<H", off)
                r -= ln
            i += ml - r
            anchor = i
            if r:
                i += r
        else:
            i += 1
    if anchor < n:
        _emit_literal(out, data[anchor:])
    return bytes(out)


# ------------------------------------------------------------------
# framing format
# ------------------------------------------------------------------
def compress_framed(data: bytes, chunk_size: int = 65536) -> bytes:
    out = bytearray(STREAM_ID)
    for s in range(0, len(data), chunk_size) or [0]:
        chunk = data[s:s + chunk_size]
        comp = compress_raw(chunk)
        crc = struct.pack("<I", masked_crc(chunk))
        if len(comp) < len(chunk):
            body = crc + comp
            out += bytes([0x00]) + len(body).to_bytes(3, "little")
        else:
            body = crc + chunk
            out += bytes([0x01]) + len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def decompress_framed(b: bytes) -> bytes:
    if b[:10] != STREAM_ID:
        raise ValueError("not a framed snappy stream (bad stream id)")
    i = 10
    out = bytearray()
    n = len(b)
    while i < n:
        if i + 4 > n:
            raise ValueError("truncated snappy chunk header")
        typ = b[i]
        ln = int.from_bytes(b[i + 1:i + 4], "little")
        i += 4
        if i + ln > n:
            raise ValueError("truncated snappy chunk")
        body = b[i:i + ln]
        i += ln
        if typ == 0xFF:
            continue                           # repeated stream id
        if typ in (0x00, 0x01):
            if ln < 4:
                raise ValueError("snappy chunk too short for CRC")
            (crc,) = struct.unpack_from("<I", body, 0)
            data = (decompress_raw(body[4:]) if typ == 0x00
                    else bytes(body[4:]))
            if masked_crc(data) != crc:
                raise ValueError("snappy chunk CRC mismatch")
            out += data
        elif 0x02 <= typ <= 0x7F:
            raise ValueError(f"unskippable snappy chunk 0x{typ:02x}")
        # 0x80-0xFE: skippable per spec — ignored
    return bytes(out)


def read_snappy_frames(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """(id, framed-snappy bytes) rows → (id, n_raw, data). Narrow."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "n_raw", "data"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = decompress_framed(bytes(payload))
                out.append((int(did), len(data), bytearray(data)))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, n_raw long, data binary")
