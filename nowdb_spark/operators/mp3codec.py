"""MPEG-1 Audio Layer III (MP3) — real sample decode.

Reference parity: the reference engine (``/root/reference/src``) has
no media handling at all; this module is part of the multimodal
ingestion extension family (SURVEY §2 extensions). Everything here is
built from the public ISO/IEC 11172-3 Layer III structure as
documented in open literature and public decoder lineage
(pdmp3/minimp3-style layouts), composing the two halves this repo
already ships: the vectorized bit reader + 32-band polyphase
synthesis of ``mp2codec.py`` (mm31) and the MDCT/TDAC lapped
transform of ``dsp.py`` (mm33). What this module adds is the Layer
III plumbing between them:

* frame header (layer bits '01', slot size 144·bitrate/samplerate);
* mono MPEG-1 side info (17 bytes): main_data_begin, scfsi, and per
  granule part2_3_length / big_values / global_gain /
  scalefac_compress / window_switching / table_select×3 /
  region0_count / region1_count / preflag / scalefac_scale /
  count1table_select;
* scalefactor decode — the published slen1/slen2 pair table indexed
  by scalefac_compress, long-block bands 0-10 (slen1) and 11-20
  (slen2), scfsi groups 0-5/6-10/11-15/16-20;
* Huffman decode of the big_values region with per-region
  (region0/1/2) code-table selection over the long-block
  scalefactor-band boundaries, sign bits after each nonzero value,
  and the count1 region of (v,w,x,y) quadruples;
* requantization xr = sign(is)·|is|^(4/3) · 2^((global_gain−210)/4)
  · 2^(−(scalefac_scale+1)/2 · (scalefac[sfb] + preflag·pretab[sfb]));
* alias reduction — the 8 cs/ca butterflies at each of the 31
  subband boundaries, c = (−0.6, −0.535, −0.33, −0.185, −0.095,
  −0.041, −0.0142, −0.0037), csᵢ = 1/√(1+cᵢ²), caᵢ = cᵢ·csᵢ;
* 36-point IMDCT with the long-block (block_type 0) sine window,
  18-sample overlap-add per subband, and frequency inversion of odd
  time samples in odd subbands;
* PCM through the shared 32-band polyphase synthesis filterbank
  (``mp2codec.synthesize`` — its one documented window deviation
  applies here identically).

Honest gates (each raises with an actionable message, never a silent
wrong decode): Huffman code tables bundled are ISO Annex B.7 tables
1, 2, 3 (the 2×2 and 3×3 tables, transcribed from the public spec
reproductions) plus count1 table B (the fixed all-4-bit table whose
code word is the one's complement of the quadruple); the remaining
big-value tables 4-31 (linbits family) and count1 table A are data,
not structure — ``set_tables`` accepts them verbatim when needed.
Scalefactor-band width tables ship for 48 AND 44.1 kHz (each
self-validated by its 576-sample total; 32 kHz is gated), and the
encoder twin exercises the scfsi scalefactor-reuse path. Window
switching (short blocks / block_type≠0), the bit reservoir
(main_data_begin≠0), stereo modes, and MPEG-2 LSF all raise
NotImplementedError.
"""

from __future__ import annotations

import math
from types import SimpleNamespace

import numpy as np

BITRATES_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
               224, 256, 320]
RATES = {0: 44100, 1: 48000, 2: 32000}

# long-block scalefactor band widths (ISO table B.8b columns; 22
# bands summing to 576, sfb21 carries no scalefactor). Each table
# self-validates by the 576 total. 32 kHz stays an honest gate.
SFB_WIDTHS_48K = [4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22,
                  28, 34, 40, 46, 54, 54, 192]
SFB_WIDTHS_44K = [4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24,
                  28, 34, 42, 50, 54, 76, 158]


def _bounds(widths):
    out = [0]
    for w in widths:
        out.append(out[-1] + w)
    assert out[-1] == 576
    return out


SFB_BOUNDS_48K = _bounds(SFB_WIDTHS_48K)
SFB_BOUNDS_44K = _bounds(SFB_WIDTHS_44K)
SFB_BOUNDS = {48000: SFB_BOUNDS_48K, 44100: SFB_BOUNDS_44K}

# slen1/slen2 bit widths per scalefac_compress (ISO 2.4.2.7)
SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2),
        (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
        (4, 2), (4, 3)]

# preflag high-band emphasis (ISO table B.6)
PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
          3, 2, 0]

# alias-reduction butterfly coefficients (ISO 2.4.3.4.10.1)
ALIAS_C = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
           -0.0037]
ALIAS_CS = [1.0 / math.sqrt(1.0 + c * c) for c in ALIAS_C]
ALIAS_CA = [c / math.sqrt(1.0 + c * c) for c in ALIAS_C]

# ISO Annex B.7 Huffman tables for the big_values region, as
# {(|x|, |y|): (hlen, hcod)}. Tables 1-3 (no linbits) transcribed
# from the public spec reproductions; Kraft-complete (asserted).
HUFF_TABLES = {
    1: {(0, 0): (1, 1), (0, 1): (3, 1), (1, 0): (2, 1),
        (1, 1): (3, 0)},
    2: {(0, 0): (1, 1), (0, 1): (3, 2), (0, 2): (6, 1),
        (1, 0): (3, 3), (1, 1): (3, 1), (1, 2): (5, 1),
        (2, 0): (5, 3), (2, 1): (5, 2), (2, 2): (6, 0)},
    3: {(0, 0): (2, 3), (0, 1): (2, 2), (0, 2): (6, 1),
        (1, 0): (3, 1), (1, 1): (2, 1), (1, 2): (5, 1),
        (2, 0): (5, 3), (2, 1): (5, 2), (2, 2): (6, 0)},
}
for _t in HUFF_TABLES.values():
    assert abs(sum(2.0 ** -ln for ln, _ in _t.values()) - 1.0) < 1e-12

# 36-point IMDCT basis × long-block sine window, row n (time 0..35),
# col k (spectral 0..17): cos(π/72·(2n+1+18)(2k+1)) · sin(π/36·(n+½))
IMDCT_WIN = np.array(
    [[math.cos(math.pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1))
      * math.sin(math.pi / 36.0 * (n + 0.5))
      for k in range(18)] for n in range(36)])


def _sfb_of(i: int, rate: int = 48000) -> int:
    bounds = SFB_BOUNDS[rate]
    for b in range(21, -1, -1):
        if i >= bounds[b]:
            return b
    return 0


def make_mp3_codec():
    """Build the codec namespace (mirrors make_mp2_codec's shape)."""
    tables = {k: dict(v) for k, v in HUFF_TABLES.items()}
    decode_maps = {}

    def _decode_map(tid: int):
        if tid not in decode_maps:
            if tid not in tables:
                raise NotImplementedError(
                    f"Layer III Huffman table {tid} not bundled — "
                    "tables 1-3 ship with the module; pass the "
                    "(hlen, hcod) entries for others via set_tables "
                    "(ISO 11172-3 Annex B.7 is the public source)")
            decode_maps[tid] = {(ln, cd): xy for xy, (ln, cd)
                                in tables[tid].items()}
        return decode_maps[tid]

    def set_tables(tid: int, entries: dict) -> None:
        """Install an ISO Annex B.7 table verbatim:
        {(|x|,|y|): (hlen, hcod)} or, for linbits tables,
        {(|x|,|y|): (hlen, hcod, linbits)} (linbits shared per
        table; only the max-15 escape rows use it)."""
        kraft = sum(2.0 ** -e[0] for e in entries.values())
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"table {tid} is not Kraft-complete "
                             f"({kraft})")
        tables[tid] = dict(entries)
        decode_maps.pop(tid, None)

    # ---------------- bit I/O (same shapes as mp2codec) ----------
    class _Writer:
        __slots__ = ("buf", "acc", "nbits")

        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.nbits = 0

        def put(self, val: int, n: int) -> None:
            self.acc = (self.acc << n) | (val & ((1 << n) - 1))
            self.nbits += n
            while self.nbits >= 8:
                self.nbits -= 8
                self.buf.append((self.acc >> self.nbits) & 0xFF)

        def bitpos(self) -> int:
            return len(self.buf) * 8 + self.nbits

        def pad_to(self, nbytes: int) -> bytes:
            if self.nbits:
                self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
                self.nbits = 0
            if len(self.buf) > nbytes:
                raise ValueError(
                    f"frame overflow: {len(self.buf)} > {nbytes}")
            self.buf.extend(b"\x00" * (nbytes - len(self.buf)))
            return bytes(self.buf)

    class _Reader:
        __slots__ = ("val", "total", "pos")

        def __init__(self, b: bytes, bitpos: int = 0):
            self.val = int.from_bytes(b, "big")
            self.total = len(b) * 8
            self.pos = bitpos

        def get(self, n: int) -> int:
            v = (self.val >> (self.total - self.pos - n)) \
                & ((1 << n) - 1)
            self.pos += n
            return v

    # ---------------- header ----------------
    def frame_header(b: bytes, i: int):
        """Layer III header at offset i → (frame_len, kbps, rate,
        channels, pad, protection) or None. Sync mask 0xF8: the ID
        bit is validated so MPEG-2 LSF never misparses as MPEG-1."""
        if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xF8) != 0xF8:
            return None
        if (b[i + 1] >> 1) & 0b11 != 0b01:     # layer III
            return None
        br_idx = (b[i + 2] >> 4) & 0xF
        sr_idx = (b[i + 2] >> 2) & 0b11
        pad = (b[i + 2] >> 1) & 1
        mode = (b[i + 3] >> 6) & 0b11
        prot = b[i + 1] & 1
        if br_idx in (0, 15) or sr_idx == 3:
            return None
        kbps = BITRATES_L3[br_idx]
        rate = RATES[sr_idx]
        flen = 144 * kbps * 1000 // rate + pad
        channels = 1 if mode == 0b11 else 2
        return flen, kbps, rate, channels, pad, prot

    def _gate(channels: int, rate: int) -> None:
        if channels != 1:
            raise NotImplementedError(
                "Layer III stereo/joint-stereo not implemented — "
                "the per-channel loops and MS/intensity recombine "
                "are the extension points")
        if rate not in SFB_BOUNDS:
            raise NotImplementedError(
                f"Layer III scalefactor bands for rate={rate} not "
                "bundled (48 and 44.1 kHz table B.8b columns are; "
                "add the 32 kHz width table to extend)")

    # ---------------- encode (fixture twin) ----------------
    def encode_frame(is2, scf2, gains, kbps: int = 192,
                     rate: int = 48000, region0_count: int = 3,
                     region1_count: int = 3,
                     scalefac_scale: int = 0,
                     table_select=(1, 2, 3),
                     count1_quads: int = 0,
                     scfsi=(0, 0, 0, 0)) -> bytes:
        """Encode ONE mono MPEG-1 Layer III frame from the integer
        code domain: ``is2`` is 2 granules × 576 signed spectral
        codes, ``scf2`` 2×21 scalefactors, ``gains`` 2 global_gains.
        big_values covers everything before the count1 region;
        ``count1_quads`` trailing quadruples (|v| ≤ 1) are coded with
        count1 table B. scalefac_compress is fixed at 13 (slen 3,3);
        no bit reservoir (main_data_begin=0). ``scfsi`` flags per
        band group (0-5, 6-10, 11-15, 16-20): a set flag means
        granule 1 reuses granule 0's scalefactors in that group and
        they are not transmitted (scf2 must agree there)."""
        groups = [(0, 6), (6, 11), (11, 16), (16, 21)]
        for grp, (lo, hi) in enumerate(groups):
            if scfsi[grp]:
                for bnd in range(lo, hi):
                    if scf2[0][bnd] != scf2[1][bnd]:
                        raise ValueError(
                            f"scfsi group {grp} set but scalefactor "
                            f"band {bnd} differs between granules")
        _gate(1, rate)
        bounds = SFB_BOUNDS[rate]
        r0_end = bounds[region0_count + 1]
        r1_end = bounds[region0_count + region1_count + 2]
        w = _Writer()
        w.put(0xFFF, 12)
        w.put(1, 1)                 # ID: MPEG-1
        w.put(0b01, 2)              # layer III
        w.put(1, 1)                 # protection_bit=1: no CRC
        w.put(BITRATES_L3.index(kbps), 4)
        w.put({44100: 0, 48000: 1, 32000: 2}[rate], 2)
        w.put(0, 1)                 # padding
        w.put(0, 1)                 # private
        w.put(0b11, 2)              # mode: single channel
        w.put(0, 2)                 # mode extension
        w.put(0, 1)                 # copyright
        w.put(0, 1)                 # original
        w.put(0, 2)                 # emphasis

        # per-granule main data, buffered to measure part2_3_length
        granule_bits = []
        bv = []
        c1q = []
        for g in range(2):
            isv = list(is2[g])
            if len(isv) != 576:
                raise ValueError("is2 granules must be 576 codes")
            nz = max((i for i, v in enumerate(isv) if v), default=-1)
            end = nz + 1
            end += end & 1                     # pair-align
            # count1 region: carve the LAST count1_quads quadruples
            # out of the content tail (values there must be |v|<=1);
            # big_values shrinks to cover only the head
            n_c1 = min(count1_quads, end // 4)
            big2 = end - 4 * n_c1
            big2 += big2 & 1                   # stays pair-aligned
            c1_lo = big2
            c1_hi = min(576, big2 + 4 * n_c1)
            bw = _Writer()
            for grp, (lo, hi) in enumerate(groups):
                if g == 1 and scfsi[grp]:
                    continue                   # reused from granule 0
                for b in range(lo, hi):        # slen (3,3)
                    bw.put(int(scf2[g][b]) & 7, 3)
            for i in range(0, big2, 2):
                x, y = isv[i], isv[i + 1]
                if i < r0_end:
                    tid = table_select[0]
                elif i < r1_end:
                    tid = table_select[1]
                else:
                    tid = table_select[2]
                tab = tables.get(tid)
                if tab is None:
                    raise NotImplementedError(
                        f"encode: Huffman table {tid} not bundled — "
                        "tables 1-3 ship; pass others via set_tables")
                key = (abs(x), abs(y))
                if key not in tab:
                    raise ValueError(
                        f"code {key} exceeds table {tid}")
                ln, cd = tab[key][:2]
                bw.put(cd, ln)
                if x:
                    bw.put(1 if x < 0 else 0, 1)
                if y:
                    bw.put(1 if y < 0 else 0, 1)
            n_quads = 0
            for i in range(c1_lo, c1_hi, 4):
                quad = isv[i:i + 4]
                if any(abs(v) > 1 for v in quad):
                    raise ValueError("count1 values must be |v|<=1")
                code = 0
                for v in quad:
                    code = (code << 1) | (1 if v else 0)
                bw.put((~code) & 0xF, 4)       # table B: complement
                for v in quad:
                    if v:
                        bw.put(1 if v < 0 else 0, 1)
                n_quads += 1
            granule_bits.append((bw, bw.bitpos()))
            bv.append(big2 // 2)
            c1q.append(n_quads)

        # side info (17 bytes, mono)
        w.put(0, 9)                 # main_data_begin: no reservoir
        w.put(0, 5)                 # private
        for grp in range(4):        # scfsi flags per band group
            w.put(1 if scfsi[grp] else 0, 1)
        for g in range(2):
            w.put(granule_bits[g][1], 12)      # part2_3_length
            w.put(bv[g], 9)
            w.put(int(gains[g]) & 0xFF, 8)
            w.put(13, 4)            # scalefac_compress: slen (3,3)
            w.put(0, 1)             # window_switching_flag
            for t in table_select:
                w.put(t, 5)
            w.put(region0_count, 4)
            w.put(region1_count, 3)
            w.put(0, 1)             # preflag
            w.put(scalefac_scale, 1)
            w.put(1, 1)             # count1table_select: table B
        for g in range(2):
            bwr, nbits = granule_bits[g]
            # replay the buffered granule bits into the frame writer
            tmp = bwr.buf[:]
            acc, left = bwr.acc, bwr.nbits
            for byte in tmp:
                w.put(byte, 8)
            if left:
                w.put(acc & ((1 << left) - 1), left)
        return w.pad_to(144 * kbps * 1000 // rate)

    # ---------------- decode ----------------
    def decode_frames(b: bytes):
        """Walk every Layer III frame: per frame {kbps, rate,
        granules: [{is, scf, xr, ts} × 2]} where ``is`` is the 576
        decoded integer codes (signed), ``scf`` the 21 scalefactors,
        ``xr`` the requantized spectrum, and ``ts`` the 18×32
        time-domain subband samples after alias reduction, IMDCT,
        overlap-add and frequency inversion — ready for the polyphase
        filterbank. Overlap state carries across frames."""
        out = []
        overlap = np.zeros((32, 18))
        i = 0
        while True:
            h = frame_header(b, i)
            if h is None or i + h[0] > len(b):
                break
            flen, kbps, rate, channels, pad, prot = h
            _gate(channels, rate)
            r = _Reader(b[i + 4:i + flen])
            if not prot:
                r.get(16)           # CRC-16 (value not verified)
            main_data_begin = r.get(9)
            if main_data_begin:
                raise NotImplementedError(
                    "Layer III bit reservoir (main_data_begin != 0) "
                    "not implemented — encode with reservoir "
                    "disabled, or buffer prior frames' main data")
            r.get(5)                # private
            scfsi = [r.get(1) for _ in range(4)]
            side = []
            for g in range(2):
                gi = {}
                gi["part2_3_length"] = r.get(12)
                gi["big_values"] = r.get(9)
                gi["global_gain"] = r.get(8)
                gi["scalefac_compress"] = r.get(4)
                if r.get(1):
                    raise NotImplementedError(
                        "Layer III window switching (short/mixed "
                        "blocks) not implemented — long blocks only")
                gi["table_select"] = [r.get(5) for _ in range(3)]
                gi["region0_count"] = r.get(4)
                gi["region1_count"] = r.get(3)
                gi["preflag"] = r.get(1)
                gi["scalefac_scale"] = r.get(1)
                gi["count1table_select"] = r.get(1)
                side.append(gi)

            granules = []
            prev_scf = [0] * 21
            for g in range(2):
                gi = side[g]
                start = r.pos
                slen1, slen2 = SLEN[gi["scalefac_compress"]]
                scf = [0] * 21
                groups = [(0, 6, slen1), (6, 11, slen1),
                          (11, 16, slen2), (16, 21, slen2)]
                for grp, (lo, hi, sl) in enumerate(groups):
                    if g == 1 and scfsi[grp]:
                        for bnd in range(lo, hi):
                            scf[bnd] = prev_scf[bnd]
                    else:
                        for bnd in range(lo, hi):
                            scf[bnd] = r.get(sl) if sl else 0
                prev_scf = scf

                bounds = SFB_BOUNDS[rate]
                r0_end = bounds[gi["region0_count"] + 1]
                r1_end = bounds[
                    min(gi["region0_count"] + gi["region1_count"] + 2,
                        22)]
                isv = [0] * 576
                big2 = gi["big_values"] * 2
                if big2 > 576:
                    raise ValueError("big_values out of range")
                idx = 0
                while idx < big2:
                    if idx < r0_end:
                        tid = gi["table_select"][0]
                    elif idx < r1_end:
                        tid = gi["table_select"][1]
                    else:
                        tid = gi["table_select"][2]
                    if tid == 0:
                        isv[idx] = isv[idx + 1] = 0
                        idx += 2
                        continue
                    dmap = _decode_map(tid)
                    ln, cd = 0, 0
                    while True:
                        cd = (cd << 1) | r.get(1)
                        ln += 1
                        if (ln, cd) in dmap:
                            break
                        if ln > 19:
                            raise ValueError(
                                "invalid Huffman code in big_values")
                    x, y = dmap[(ln, cd)]
                    if x:
                        x = -x if r.get(1) else x
                    if y:
                        y = -y if r.get(1) else y
                    isv[idx], isv[idx + 1] = x, y
                    idx += 2
                # count1 region: quadruples while part2_3 bits remain
                while (r.pos - start < gi["part2_3_length"]
                       and idx + 3 < 576):
                    if gi["count1table_select"]:
                        code = (~r.get(4)) & 0xF    # table B
                        quad = [(code >> 3) & 1, (code >> 2) & 1,
                                (code >> 1) & 1, code & 1]
                    else:
                        raise NotImplementedError(
                            "count1 table A not bundled — pass it "
                            "via set_tables or encode with table B")
                    for t in range(4):
                        if quad[t] and r.get(1):
                            quad[t] = -quad[t]
                    isv[idx:idx + 4] = quad
                    idx += 4
                if r.pos - start > gi["part2_3_length"]:
                    raise ValueError("granule overran part2_3_length")
                r.pos = start + gi["part2_3_length"]

                # requantize (long blocks)
                sf_mult = 0.5 * (gi["scalefac_scale"] + 1)
                gg = 2.0 ** ((gi["global_gain"] - 210) / 4.0)
                xr = np.zeros(576)
                for b2 in range(22):
                    lo = bounds[b2]
                    hi = bounds[b2 + 1]
                    sb_scf = scf[b2] if b2 < 21 else 0
                    gain = gg * 2.0 ** (-sf_mult * (
                        sb_scf + gi["preflag"] * PRETAB[b2]))
                    for j in range(lo, hi):
                        v = isv[j]
                        if v:
                            xr[j] = math.copysign(
                                abs(v) ** (4.0 / 3.0), v) * gain

                # alias reduction
                xa = xr.copy()
                for sb in range(1, 32):
                    for j in range(8):
                        a = xa[18 * sb - 1 - j]
                        bb = xa[18 * sb + j]
                        xa[18 * sb - 1 - j] = (a * ALIAS_CS[j]
                                               - bb * ALIAS_CA[j])
                        xa[18 * sb + j] = (bb * ALIAS_CS[j]
                                           + a * ALIAS_CA[j])

                # IMDCT (36-point, sine window) + overlap-add
                spec = xa.reshape(32, 18)
                z = spec @ IMDCT_WIN.T          # (32, 36)
                ts = z[:, :18] + overlap        # (32, 18)
                overlap = z[:, 18:].copy()
                # frequency inversion: odd subbands, odd samples
                ts[1::2, 1::2] = -ts[1::2, 1::2]
                granules.append({"is": isv, "scf": scf, "xr": xr,
                                 "ts": ts.T.copy()})  # (18, 32)
            out.append({"kbps": kbps, "rate": rate,
                        "granules": granules})
            i += flen
        return out

    def decode_pcm(b: bytes):
        """Full PCM path: decode_frames → shared polyphase synthesis
        (mp2codec.synthesize, one v-FIFO carried across granules).
        Returns (n_granules, 18, 32) PCM."""
        from nowdb_spark.operators.mp2codec import make_mp2_codec
        syn = make_mp2_codec()
        v = np.zeros(1024)
        rows = []
        for f in decode_frames(b):
            for gr in f["granules"]:
                rows.append(syn.synthesize(gr["ts"], v_state=v))
        return np.array(rows)

    def sniff(b: bytes):
        return "mp3" if frame_header(b, 0) else None

    return SimpleNamespace(
        frame_header=frame_header, encode_frame=encode_frame,
        decode_frames=decode_frames, decode_pcm=decode_pcm,
        sniff=sniff, set_tables=set_tables,
        SFB_BOUNDS=SFB_BOUNDS, SLEN=SLEN, PRETAB=PRETAB,
        ALIAS_CS=ALIAS_CS, ALIAS_CA=ALIAS_CA, IMDCT_WIN=IMDCT_WIN,
        HUFF_TABLES=tables)
