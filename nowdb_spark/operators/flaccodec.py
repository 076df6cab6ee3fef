"""Pure-Python FLAC FRAME codec — real SAMPLE decode for FLAC.

Built from the public FLAC format specification (RFC 9639 /
xiph.org/flac/format.html). This is the entropy-coded layer that
multimodal.py previously kept behind the honest NotImplementedError
gate: frame-header parse (sync, block-size/rate/sample-size codes,
UTF-8-coded frame number, CRC-8), subframe decode (CONSTANT, VERBATIM,
FIXED orders 0-4, LPC up to order 32 with quantized coefficients and
arithmetic-shift prediction), partitioned Rice residuals (4- and 5-bit
parameters, escape-to-raw partitions), wasted-bits reconstruction,
inter-channel decorrelation (left/side, right/side, mid/side — exact
integer inverses), and the frame-footer CRC-16. The companion encoder
produces real FLAC files for the differential fixtures: every encoded
stream round-trips through the decoder bit-exactly, and libFLAC-style
streams of the supported feature set decode identically.

STREAMINFO-level metadata stays in audiocodec.py (flac_meta); this
module is the sample layer underneath it.

Reference parity note: the reference engine has no media handling;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family), not reference parity.

Built by `make_flac_codec()` as nested closures so cloudpickle ships
the code by value to executors (same self-containment rule as the
image codec).
"""

from __future__ import annotations

from types import SimpleNamespace


def make_flac_codec() -> SimpleNamespace:
    """Returns a namespace with:
      decode(b)       -> {fmt, sample_rate, channels, bits, n_samples,
                          samples (interleaved list[int])} | None
      encode(chans,   -> bytes — real FLAC file (STREAMINFO + frames);
        rate, bits,      chans = list of per-channel sample lists;
        block_size,      subframe: 'verbatim'|'constant'|'fixed0'..
        subframe,        'fixed4'|'lpc'; stereo_mode: 'independent'|
        stereo_mode,     'left_side'|'right_side'|'mid_side';
        rice_partition_order, wasted_bits, rice_escape)
      features(b)     -> {n_samples, sample_rate, duration_ms, peak,
                          sq_sum} | None  (over interleaved samples)
    """

    # --- CRCs (FLAC spec: CRC-8 poly 0x07, CRC-16 poly 0x8005,
    # both init 0, no reflection) ------------------------------------
    _CRC8 = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        _CRC8.append(c)
    _CRC16 = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        _CRC16.append(c)

    def crc8(data: bytes) -> int:
        c = 0
        for x in data:
            c = _CRC8[c ^ x]
        return c

    def crc16(data: bytes) -> int:
        c = 0
        for x in data:
            c = _CRC16[((c >> 8) ^ x) & 0xFF] ^ ((c << 8) & 0xFFFF)
        return c

    # --- bit IO ------------------------------------------------------

    class _Reader:
        __slots__ = ("b", "pos")

        def __init__(self, b: bytes, pos_bits: int = 0):
            self.b = b
            self.pos = pos_bits

        def read(self, n: int) -> int:
            v, p = 0, self.pos
            if p + n > len(self.b) * 8:
                raise ValueError("flac: bitstream truncated")
            for _ in range(n):
                v = (v << 1) | ((self.b[p >> 3] >> (7 - (p & 7))) & 1)
                p += 1
            self.pos = p
            return v

        def read_signed(self, n: int) -> int:
            v = self.read(n)
            return v - (1 << n) if v >> (n - 1) else v

        def read_unary(self) -> int:
            q, p, b = 0, self.pos, self.b
            nbits = len(b) * 8
            while True:
                if p >= nbits:
                    raise ValueError("flac: bitstream truncated")
                if (b[p >> 3] >> (7 - (p & 7))) & 1:
                    self.pos = p + 1
                    return q
                q += 1
                p += 1

        def align(self):
            self.pos = (self.pos + 7) & ~7

    class _Writer:
        __slots__ = ("out", "acc", "nacc")

        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.nacc = 0

        def write(self, v: int, n: int):
            self.acc = (self.acc << n) | (v & ((1 << n) - 1))
            self.nacc += n
            while self.nacc >= 8:
                self.nacc -= 8
                self.out.append((self.acc >> self.nacc) & 0xFF)
            self.acc &= (1 << self.nacc) - 1

        def write_unary(self, q: int):
            while q >= 32:
                self.write(0, 32)
                q -= 32
            self.write(1, q + 1)            # q zeros then a one

        def align(self):
            if self.nacc:
                self.write(0, 8 - self.nacc)

        def bytes(self) -> bytes:
            assert self.nacc == 0
            return bytes(self.out)

    # --- frame-header code tables -------------------------------------

    _BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
    _RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
              6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
              11: 96000}
    _BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    _BITS_INV = {v: k for k, v in _BITS.items()}

    _FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                   4: [4, -6, 4, -1]}

    def _utf8_encode(n: int) -> bytes:
        """FLAC's UTF-8-style variable-length integer (frame/sample
        number), extended past U+10FFFF."""
        if n < 0x80:
            return bytes([n])
        for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0),
                             (5, 0xF8), (6, 0xFC), (7, 0xFE)):
            if n < (1 << (5 * nbytes + 1)) or nbytes == 7:
                out = bytearray(nbytes)
                for i in range(nbytes - 1, 0, -1):
                    out[i] = 0x80 | (n & 0x3F)
                    n >>= 6
                out[0] = lead | n
                return bytes(out)
        raise AssertionError

    def _utf8_decode(r: _Reader) -> int:
        b0 = r.read(8)
        if b0 < 0x80:
            return b0
        nbytes = 0
        for mask, lead, nb in ((0xE0, 0xC0, 2), (0xF0, 0xE0, 3),
                               (0xF8, 0xF0, 4), (0xFC, 0xF8, 5),
                               (0xFE, 0xFC, 6), (0xFF, 0xFE, 7)):
            if b0 & mask == lead:
                nbytes = nb
                v = b0 & (0xFF >> (nb + 1 if nb < 7 else 8))
                break
        if not nbytes:
            raise ValueError("flac: bad UTF-8 coded number")
        for _ in range(nbytes - 1):
            c = r.read(8)
            if c & 0xC0 != 0x80:
                raise ValueError("flac: bad UTF-8 continuation")
            v = (v << 6) | (c & 0x3F)
        return v

    # --- subframe decode ----------------------------------------------

    def _decode_residuals(r: _Reader, bs: int, order: int) -> list:
        method = r.read(2)
        if method > 1:
            raise ValueError("flac: reserved residual method")
        plen = 4 + method                   # rice parameter width
        po = r.read(4)
        if bs % (1 << po):
            raise ValueError("flac: partition order mismatch")
        res = []
        for part in range(1 << po):
            n = (bs >> po) - (order if part == 0 else 0)
            param = r.read(plen)
            if param == (1 << plen) - 1:    # escape: raw residuals
                nbits = r.read(5)
                res.extend(r.read_signed(nbits) if nbits else 0
                           for _ in range(n))
            else:
                for _ in range(n):
                    q = r.read_unary()
                    v = (q << param) | (r.read(param) if param else 0)
                    res.append((v >> 1) ^ -(v & 1))   # un-zigzag
        return res

    def _decode_subframe(r: _Reader, bs: int, bps: int) -> list:
        if r.read(1):
            raise ValueError("flac: bad subframe padding bit")
        typ = r.read(6)
        wasted = 0
        if r.read(1):                       # wasted-bits flag
            wasted = r.read_unary() + 1
        eff = bps - wasted
        if typ == 0:                        # CONSTANT
            s = [r.read_signed(eff)] * bs
        elif typ == 1:                      # VERBATIM
            s = [r.read_signed(eff) for _ in range(bs)]
        elif 8 <= typ <= 12:                # FIXED order 0..4
            order = typ - 8
            s = [r.read_signed(eff) for _ in range(order)]
            res = _decode_residuals(r, bs, order)
            coef = _FIXED_COEF[order]
            for i, e in enumerate(res):
                pred = sum(c * s[order + i - 1 - j]
                           for j, c in enumerate(coef))
                s.append(pred + e)
        elif typ >= 32:                     # LPC order 1..32
            order = typ - 31
            s = [r.read_signed(eff) for _ in range(order)]
            prec = r.read(4) + 1
            if prec == 16:
                raise ValueError("flac: invalid LPC precision")
            shift = r.read_signed(5)
            if shift < 0:
                raise ValueError("flac: negative LPC shift")
            coef = [r.read_signed(prec) for _ in range(order)]
            res = _decode_residuals(r, bs, order)
            for i, e in enumerate(res):
                pred = sum(c * s[order + i - 1 - j]
                           for j, c in enumerate(coef)) >> shift
                s.append(pred + e)
        else:
            raise ValueError(f"flac: reserved subframe type {typ}")
        if wasted:
            s = [x << wasted for x in s]
        return s

    # --- frame decode ---------------------------------------------------

    def _decode_frame(b: bytes, byte_pos: int, info: dict):
        """Decode one frame at byte_pos; returns (per-channel sample
        lists, next byte_pos)."""
        start = byte_pos
        r = _Reader(b, byte_pos * 8)
        if r.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        r.read(1)                           # reserved
        r.read(1)                           # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)                           # reserved
        _utf8_decode(r)                     # frame/sample number
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        if bps_code == 0:
            bps = info["bits"]
        elif bps_code in _BITS:
            bps = _BITS[bps_code]
        else:
            raise ValueError("flac: reserved sample size code")
        hdr_end = r.pos >> 3                # header is byte-aligned here
        if crc8(b[start:hdr_end]) != r.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code <= 7:
            chans = [_decode_subframe(r, bs, bps)
                     for _ in range(ch_code + 1)]
        elif ch_code == 8:                  # left/side
            left = _decode_subframe(r, bs, bps)
            side = _decode_subframe(r, bs, bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:                  # right/side
            side = _decode_subframe(r, bs, bps + 1)
            right = _decode_subframe(r, bs, bps)
            chans = [[s + rr for s, rr in zip(side, right)], right]
        elif ch_code == 10:                 # mid/side
            mid = _decode_subframe(r, bs, bps)
            side = _decode_subframe(r, bs, bps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            chans = [left, right]
        else:
            raise ValueError("flac: reserved channel assignment")
        r.align()
        body_end = r.pos >> 3
        if crc16(b[start:body_end]) != r.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        return chans, body_end + 2

    def decode(b: bytes):
        """Full-file decode: magic + metadata walk (via STREAMINFO)
        then every frame until the STREAMINFO sample total is
        reached. Returns None for non-FLAC bytes; raises ValueError
        for corrupt FLAC (CRC/structure)."""
        from nowdb_spark.operators.audiocodec import make_audio_codec
        info = make_audio_codec().flac_meta(b)
        if info is None:
            return None
        # skip magic + metadata blocks to the first frame
        i = 4
        while True:
            last, ln = b[i] >> 7, int.from_bytes(b[i + 1:i + 4], "big")
            i += 4 + ln
            if last:
                break
        total = info["n_samples"]
        chans = [[] for _ in range(info["channels"])]
        while len(chans[0]) < total and i < len(b):
            fr, i = _decode_frame(b, i, info)
            if len(fr) != info["channels"]:
                raise ValueError("flac: channel count changed mid-stream")
            for c, s in zip(chans, fr):
                c.extend(s)
        if len(chans[0]) != total:
            raise ValueError("flac: stream ended before sample total")
        inter = [0] * (total * len(chans))
        for c, s in enumerate(chans):
            inter[c::len(chans)] = s
        return {"fmt": "flac", "sample_rate": info["sample_rate"],
                "channels": info["channels"], "bits": info["bits"],
                "n_samples": total, "samples": inter}

    # --- encode -----------------------------------------------------------

    def _encode_residuals(w: _Writer, res: list, bs: int, order: int,
                          po: int, escape: bool):
        method = 0
        w.write(method, 2)
        w.write(po, 4)
        pos = 0
        for part in range(1 << po):
            n = (bs >> po) - (order if part == 0 else 0)
            chunk = res[pos:pos + n]
            pos += n
            if escape:
                nbits = max((abs(x).bit_length() + 1 for x in chunk),
                            default=1)
                w.write(0xF, 4)             # escape code
                w.write(nbits, 5)
                for x in chunk:
                    w.write(x & ((1 << nbits) - 1), nbits)
                continue
            zz = [(x << 1) ^ (x >> 63) if x >= 0 else ((-x << 1) - 1)
                  for x in chunk]
            mean = sum(zz) // max(len(zz), 1)
            param = min(mean.bit_length(), 14)
            w.write(param, 4)
            for v in zz:
                w.write_unary(v >> param)
                if param:
                    w.write(v & ((1 << param) - 1), param)

    def _encode_subframe(w: _Writer, s: list, bps: int, kind: str,
                         po: int, wasted: int, escape: bool):
        w.write(0, 1)                       # padding
        if wasted:
            if any(x & ((1 << wasted) - 1) for x in s):
                raise ValueError("samples not divisible for wasted bits")
            s = [x >> wasted for x in s]
        eff = bps - wasted

        def wflag():
            if wasted:
                w.write(1, 1)
                w.write_unary(wasted - 1)
            else:
                w.write(0, 1)

        if kind == "constant":
            if any(x != s[0] for x in s):
                raise ValueError("constant subframe needs equal samples")
            w.write(0, 6)
            wflag()
            w.write(s[0] & ((1 << eff) - 1), eff)
        elif kind == "verbatim":
            w.write(1, 6)
            wflag()
            for x in s:
                w.write(x & ((1 << eff) - 1), eff)
        elif kind.startswith("fixed"):
            order = int(kind[5:])
            w.write(8 + order, 6)
            wflag()
            coef = _FIXED_COEF[order]
            for x in s[:order]:
                w.write(x & ((1 << eff) - 1), eff)
            res = [s[i] - sum(c * s[i - 1 - j]
                              for j, c in enumerate(coef))
                   for i in range(order, len(s))]
            _encode_residuals(w, res, len(s), order, po, escape)
        elif kind == "lpc":
            # order-2 quantized predictor: pred = (3·s1 − s2) >> 1
            order, prec, shift, coef = 2, 4, 1, [3, -1]
            w.write(32 + order - 1, 6)
            wflag()
            for x in s[:order]:
                w.write(x & ((1 << eff) - 1), eff)
            w.write(prec - 1, 4)
            w.write(shift, 5)
            for c in coef:
                w.write(c & ((1 << prec) - 1), prec)
            res = [s[i] - (sum(c * s[i - 1 - j]
                               for j, c in enumerate(coef)) >> shift)
                   for i in range(order, len(s))]
            _encode_residuals(w, res, len(s), order, po, escape)
        else:
            raise ValueError(f"unknown subframe kind {kind}")

    def encode(chans: list, rate: int, bits: int,
               block_size: int = 4096, subframe: str = "fixed2",
               stereo_mode: str = "independent",
               rice_partition_order: int = 0, wasted_bits: int = 0,
               rice_escape: bool = False) -> bytes:
        """Real FLAC file from per-channel sample lists (all equal
        length). The subframe/stereo/partition/wasted/escape knobs
        exist so fixtures exercise every decoder path."""
        from nowdb_spark.operators.audiocodec import make_audio_codec
        codec = make_audio_codec()
        n = len(chans[0])
        assert all(len(c) == n for c in chans)
        out = bytearray(codec.encode_flac(
            rate=rate, channels=len(chans), bits=bits,
            total_samples=n))
        fno = 0
        for off in range(0, n, block_size):
            bs = min(block_size, n - off)
            blk = [c[off:off + bs] for c in chans]
            w = _Writer()
            w.write(0b11111111111110, 14)
            w.write(0, 1)                   # reserved
            w.write(0, 1)                   # fixed-blocksize stream
            w.write(7, 4)                   # 16-bit blocksize-1 follows
            w.write(0, 4)                   # rate from STREAMINFO
            mode = stereo_mode if len(chans) == 2 else "independent"
            ch_code = {"independent": len(chans) - 1, "left_side": 8,
                       "right_side": 9, "mid_side": 10}[mode]
            w.write(ch_code, 4)
            w.write(_BITS_INV.get(bits, 0), 3)
            w.write(0, 1)                   # reserved
            for byte in _utf8_encode(fno):
                w.write(byte, 8)
            w.write(bs - 1, 16)
            w.align()
            hdr = w.bytes()
            w = _Writer()
            po = rice_partition_order if bs % (1 << rice_partition_order) == 0 \
                else 0
            # a predictor needs order warm-up samples AND the first
            # rice partition needs bs/2^po >= order — a short tail
            # block falls back to verbatim
            order = {"lpc": 2}.get(
                subframe,
                int(subframe[5:]) if subframe.startswith("fixed") else 0)
            kind = subframe if (bs >> po) > order and bs > order \
                else "verbatim"
            if mode == "independent":
                for s in blk:
                    _encode_subframe(w, s, bits, kind, po,
                                     wasted_bits, rice_escape)
            else:
                left, right = blk
                side = [l - r for l, r in zip(left, right)]
                if mode == "left_side":
                    parts = [(left, bits), (side, bits + 1)]
                elif mode == "right_side":
                    parts = [(side, bits + 1), (right, bits)]
                else:
                    mid = [(l + r) >> 1 for l, r in zip(left, right)]
                    parts = [(mid, bits), (side, bits + 1)]
                for s, bps in parts:
                    # side channels are rarely divisible for wasted
                    # bits — only the caller's grid uses them together
                    _encode_subframe(w, s, bps, kind, po,
                                     wasted_bits, rice_escape)
            w.align()
            body = w.bytes()
            frame = bytearray(hdr)
            frame.append(crc8(bytes(frame)))
            frame += body
            frame += crc16(bytes(frame)).to_bytes(2, "big")
            out += frame
            fno += 1
        return bytes(out)

    def features(b: bytes):
        """Deterministic integer features over the DECODED interleaved
        samples (oracle-replayable): count, rate, floor-ms duration,
        |peak|, sum of squares — the FLAC twin of audiocodec
        features()."""
        a = decode(b)
        if a is None:
            return None
        s = a["samples"]
        return {"n_samples": a["n_samples"],
                "channels": a["channels"],
                "sample_rate": a["sample_rate"],
                "duration_ms": a["n_samples"] * 1000 // a["sample_rate"],
                "peak": max((abs(x) for x in s), default=0),
                "sq_sum": sum(x * x for x in s)}

    return SimpleNamespace(decode=decode, encode=encode,
                           features=features, crc8=crc8, crc16=crc16)


# driver-side convenience instance (kernels build their own)
FLAC_CODEC = make_flac_codec()
