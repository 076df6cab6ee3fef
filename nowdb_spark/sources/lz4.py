"""LZ4 ingestion — block and frame formats from the published specs.

LZ4 is the fast-compression default of training-data shards (and of
Parquet/ORC page codecs). Implemented here from the two public
documents, no lz4 library:

- **Block format**: a sequence of (token, literals, match) steps —
  token high nibble = literal length (15 ⇒ extension bytes), low
  nibble = match length − 4 (15 ⇒ extension bytes), 2-byte LE match
  offset (0 is invalid; offsets may reach back across earlier output,
  overlapping copies byte-at-a-time as the spec requires — that's how
  RLE is expressed). The last sequence is literals-only.
- **Frame format**: magic 0x184D2204, FLG (version 01, block-
  independence, content-checksum / content-size / block-checksum
  flag bits), BD (block max size code 4-7), header checksum
  (xxhash32 of FLG+BD [+size], byte 1 of the hash), then blocks:
  u32 LE size whose HIGH BIT set marks an UNCOMPRESSED block,
  terminated by a zero EndMark, optional xxhash32 content checksum.
- **xxhash32** implemented from its published algorithm for the
  header/content checksums.

The compressor twin emits literals-only sequences plus a greedy
hash-chain matcher (enough to produce real matches, overlaps and
RLE) — the decoder is the surface under test. Narrow mapInPandas
reader, one shard per row; directory loads behind the shared size
guard. Reference parity: training-pipeline extension surface.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

LZ4_MAGIC = 0x184D2204

_PRIME1, _PRIME2 = 2654435761, 2246822519
_PRIME3, _PRIME4, _PRIME5 = 3266489917, 668265263, 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash32(data: bytes, seed: int = 0) -> int:
    """xxHash32 per the published algorithm description."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _PRIME1 + _PRIME2) & _M32
        v2 = (seed + _PRIME2) & _M32
        v3 = seed & _M32
        v4 = (seed - _PRIME1) & _M32
        while i + 16 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, i + 4 * j)
                v = (v + lane * _PRIME2) & _M32
                v = (_rotl(v, 13) * _PRIME1) & _M32
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _PRIME5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (h + lane * _PRIME3) & _M32
        h = (_rotl(h, 17) * _PRIME4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _PRIME5) & _M32
        h = (_rotl(h, 11) * _PRIME1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _PRIME2) & _M32
    h ^= h >> 13
    h = (h * _PRIME3) & _M32
    h ^= h >> 16
    return h


# ------------------------------------------------------------------
# block format
# ------------------------------------------------------------------
def decompress_block(b: bytes, max_out: int = 1 << 26) -> bytes:
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        token = b[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                _chk(b, i, 1)
                ll += b[i]
                ext = b[i]
                i += 1
                if ext != 255:
                    break
        _chk(b, i, ll)
        out += b[i:i + ll]
        i += ll
        if i >= n:                     # last sequence: literals only
            break
        _chk(b, i, 2)
        (off,) = struct.unpack_from("<H", b, i)
        i += 2
        if off == 0 or off > len(out):
            raise ValueError(f"bad match offset {off} at {i - 2}")
        ml = (token & 0x0F) + 4
        if token & 0x0F == 15:
            while True:
                _chk(b, i, 1)
                ml += b[i]
                ext = b[i]
                i += 1
                if ext != 255:
                    break
        if len(out) + ml > max_out:
            raise ValueError("decompressed output exceeds max_out")
        src = len(out) - off
        for k in range(ml):            # overlap = spec-mandated RLE
            out.append(out[src + k])
    if len(out) > max_out:
        raise ValueError("decompressed output exceeds max_out")
    return bytes(out)


def _chk(b: bytes, i: int, n: int):
    if i + n > len(b):
        raise ValueError(f"truncated LZ4 block at byte {i}")


def compress_block(data: bytes) -> bytes:
    """Greedy hash-chain compressor (real matches incl. overlaps);
    correctness twin, not a ratio contender. Honors the spec's end
    rules: last 5 bytes are always literals, matches must not start
    within the last 12 bytes."""
    n = len(data)
    out = bytearray()
    table: dict = {}
    anchor = 0
    i = 0
    while i + 12 <= n:
        key = data[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j:j + 4] == key:
            ml = 4
            # incremental compare also extends self-overlapping
            # (offset < length) matches — the spec's RLE form
            while i + ml < n - 5 and data[j + ml] == data[i + ml]:
                ml += 1
            _emit(out, data[anchor:i], ml - 4, i - j)
            i += ml
            anchor = i
        else:
            i += 1
    _emit(out, data[anchor:], None, None)
    return bytes(out)


def _emit(out: bytearray, literals: bytes, mlm4, off):
    ll = len(literals)
    tok_ll = 15 if ll >= 15 else ll
    tok_ml = 0 if mlm4 is None else (15 if mlm4 >= 15 else mlm4)
    out.append((tok_ll << 4) | tok_ml)
    if ll >= 15:
        r = ll - 15
        while r >= 255:
            out.append(255)
            r -= 255
        out.append(r)
    out += literals
    if mlm4 is None:
        return
    out += struct.pack("<H", off)
    if mlm4 >= 15:
        r = mlm4 - 15
        while r >= 255:
            out.append(255)
            r -= 255
        out.append(r)


# ------------------------------------------------------------------
# frame format
# ------------------------------------------------------------------
def compress_frame(data: bytes, block_size: int = 65536,
                   store_uncompressed_if_bigger: bool = True) -> bytes:
    out = bytearray(struct.pack("<I", LZ4_MAGIC))
    flg = 0b01100100               # v01, indep blocks, content cksum
    bd = 4 << 4                    # block max size code 4 (64 KB)
    out += bytes([flg, bd])
    out.append((xxhash32(bytes([flg, bd])) >> 8) & 0xFF)
    for s in range(0, len(data), block_size) or [0]:
        chunk = data[s:s + block_size]
        comp = compress_block(chunk)
        if store_uncompressed_if_bigger and len(comp) >= len(chunk):
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
        else:
            out += struct.pack("<I", len(comp))
            out += comp
    out += struct.pack("<I", 0)    # EndMark
    out += struct.pack("<I", xxhash32(data))
    return bytes(out)


def decompress_frame(b: bytes) -> bytes:
    if len(b) < 7 or struct.unpack_from("<I", b, 0)[0] != LZ4_MAGIC:
        raise ValueError("not an LZ4 frame (bad magic)")
    flg, bd = b[4], b[5]
    if flg >> 6 != 0b01:
        raise ValueError("unsupported LZ4 frame version")
    has_csize = bool(flg & 0x08)
    has_ccheck = bool(flg & 0x04)
    has_bcheck = bool(flg & 0x10)
    i = 6
    if has_csize:
        i += 8
    hdr = b[4:i]
    if (xxhash32(hdr) >> 8) & 0xFF != b[i]:
        raise ValueError("LZ4 frame header checksum mismatch")
    i += 1
    out = bytearray()
    while True:
        if i + 4 > len(b):
            raise ValueError("truncated LZ4 frame (no EndMark)")
        (word,) = struct.unpack_from("<I", b, i)
        i += 4
        if word == 0:
            break
        raw = bool(word & 0x80000000)
        size = word & 0x7FFFFFFF
        if i + size > len(b):
            raise ValueError("truncated LZ4 block data")
        block = b[i:i + size]
        i += size
        if has_bcheck:
            (bc,) = struct.unpack_from("<I", b, i)
            i += 4
            if xxhash32(block) != bc:
                raise ValueError("LZ4 block checksum mismatch")
        out += block if raw else decompress_block(block)
    if has_ccheck:
        if i + 4 > len(b):
            raise ValueError("truncated content checksum")
        (cc,) = struct.unpack_from("<I", b, i)
        if xxhash32(bytes(out)) != cc:
            raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)


# ------------------------------------------------------------------
def read_lz4_frames(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """(id, lz4-frame bytes) rows → (id, n_raw, data). Narrow."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "n_raw", "data"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = decompress_frame(bytes(payload))
                out.append((int(did), len(data), bytearray(data)))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, n_raw long, data binary")
