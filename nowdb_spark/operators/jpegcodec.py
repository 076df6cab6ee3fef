"""Pure-Python/numpy JPEG codec — the Huffman-DCT entropy path the
other codecs could not cover.

Scope (honest): BASELINE sequential DCT (SOF0/1) and PROGRESSIVE
(SOF2) with Huffman entropy coding, plus SEQUENTIAL ARITHMETIC
(SOF9) with the T.81 Annex D QM coder — grayscale and YCbCr color at
any integer sampling-factor combination (4:4:4, 4:2:2, 4:2:0, ...),
MCU-interleaved, with restart intervals in both entropy
architectures. Progressive-arithmetic (SOF10) and hierarchical/
lossless streams raise cleanly; chroma upsampling is pixel
replication (not bilinear). The QM layer (state table D.3,
conditional exchange, carry resolution over stacked 0xFF bytes, DAC
conditioning, DC context classification, AC bin groups per F.1.4/
F.2) is written from the published spec; with no codec library in
this container its verified contract is encoder↔decoder round-trip
across every path plus bit-level coder fuzzing — cross-validation
against libjpeg-produced fixtures is noted future work.

What is REAL here:
  * marker stream walk (SOI/APPn/COM/DQT/SOF0/2/DHT/DRI/SOS/EOI),
  * Huffman tables built from the DHT segments themselves (so any
    conforming file decodes, not just our encoder's output),
  * MSB-first bit reader with 0xFF00 byte-unstuffing, restart-marker
    sync with DC-prediction reset,
  * MCU interleave per sampling factors, box-average chroma
    downsampling on encode, replication upsampling on decode,
  * DC prediction, run-length AC coding (EOB/ZRL), zigzag order
    (computed, not hardcoded),
  * a coefficient-domain multi-scan decoder (T.81 G.2): every SOS —
    baseline's single full-band scan or progressive's DC/AC
    spectral-selection, successive-approximation and refinement
    scans (EOB-run + correction-bit logic per G.1.2) — updates
    per-component coefficient state; dequantize + batched IDCT run
    once at EOI,
  * a progressive ENCODER following cjpeg's standard scan script
    (DC Al=1 first, per-component AC bands, successive-approximation
    refinements, DC refine last), used to round-trip-test every
    decoder path against the baseline decode of the same pixels.

Exactness note for oracles: a UNIFORM 8x8 block has only a DC
coefficient, which the forward DCT produces as the integer 8*(v-128);
with a unit (all-ones) quantization table it is stored exactly and
the IDCT returns exactly v for every pixel — so uniform-gray images
round-trip bit-exactly and a SQL oracle can replay the decoded
pixels. Non-uniform blocks are subject to float rounding (|err| <= 1
with unit tables; more with real quant tables) — tested with
tolerances, never oracled.

Built by ``make_jpeg_codec()`` as nested closures (cloudpickle
by-value shipping, same rule as the other codecs).

Reference parity note: the reference engine has no media handling;
this belongs to the training-data-pipeline extension surface.
"""

from __future__ import annotations

from types import SimpleNamespace


def make_jpeg_codec() -> SimpleNamespace:
    """Returns a namespace with:
      sniff(b)                  -> 'jpeg' | None
      decode_meta(b)            -> {fmt, width, height, n_components,
                                    n_bytes} | None
      decode(b)                 -> meta + {'rows': [[(r,g,b)]]} | None
                                   (grayscale replicated to RGB)
      encode_gray(w, h, rows, unit_quant=False) -> bytes
      encode_rgb(w, h, rows, unit_quant=False)  -> bytes (4:4:4)
    """
    import struct

    import numpy as np

    # ---- constant tables -------------------------------------------
    # zigzag: computed by the diagonal walk, not transcribed — odd
    # diagonals run row-ascending, even ones row-descending
    def _zigzag():
        out = []
        for d in range(15):
            rng = list(range(max(0, d - 7), min(d, 7) + 1))
            for r in (rng if d % 2 == 1 else reversed(rng)):
                out.append(r * 8 + (d - r))
        return out

    ZZ = np.array(_zigzag(), dtype=np.int64)          # freq -> raster
    # standard Annex K quantization tables
    QL = np.array([
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
    QC = np.array([
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)
    # standard Annex K Huffman specs: (BITS[1..16], HUFFVAL)
    DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
    DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
    AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA])
    AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA])

    # IDCT/DCT basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
    _u = np.arange(8).reshape(8, 1)
    _x = np.arange(8).reshape(1, 8)
    _M = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16)
    _M[0, :] *= 1 / np.sqrt(2)

    def _fdct2(block):                 # spatial (8,8) -> freq (8,8)
        return _M @ block @ _M.T

    def _idct2(coef):                  # freq (8,8) -> spatial (8,8)
        return _M.T @ coef @ _M

    # ---- Huffman helpers -------------------------------------------
    def _codes_from_spec(bits, vals):
        """JPEG canonical code assignment → {symbol: (code, length)}."""
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return out

    def _lut_from_spec(bits, vals):
        """→ {(length, code): symbol} for the decoder."""
        out = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                out[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        return out

    def sniff(b: bytes):
        return "jpeg" if b[:3] == b"\xFF\xD8\xFF" else None

    # ---- encoder ---------------------------------------------------
    class _BitWriter:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, code, length):
            self.acc = (self.acc << length) | code
            self.n += length
            while self.n >= 8:
                byte = (self.acc >> (self.n - 8)) & 0xFF
                self.buf.append(byte)
                if byte == 0xFF:
                    self.buf.append(0x00)          # byte stuffing
                self.n -= 8
            self.acc &= (1 << self.n) - 1

        def flush(self):
            if self.n:
                pad = 8 - self.n
                self.put((1 << pad) - 1, pad)      # 1-pad per spec

    def _mag_bits(v):
        """value → (category, amplitude-bits): negatives are stored
        as the (v-1) complement per the spec."""
        if v == 0:
            return 0, 0
        a = abs(v)
        size = a.bit_length()
        return size, (v if v > 0 else v + (1 << size) - 1)

    def _encode_block(bw, coef_zz, pred, dc_codes, ac_codes):
        diff = int(coef_zz[0]) - pred
        size, amp = _mag_bits(diff)
        c, ln = dc_codes[size]
        bw.put(c, ln)
        if size:
            bw.put(amp, size)
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if coef_zz[i]:
                last_nz = i
        for i in range(1, last_nz + 1):
            v = int(coef_zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]             # ZRL
                bw.put(c, ln)
                run -= 16
            size, amp = _mag_bits(v)
            c, ln = ac_codes[(run << 4) | size]
            bw.put(c, ln)
            bw.put(amp, size)
            run = 0
        if last_nz < 63:
            c, ln = ac_codes[0x00]                 # EOB
            bw.put(c, ln)
        return int(coef_zz[0])

    def _dqt_seg(tid, q):
        return (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
                + bytes(int(q[z]) for z in ZZ))

    def _dht_seg(cls, tid, spec):
        bits, vals = spec
        data = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xFF\xC4" + struct.pack(">H", 2 + len(data)) + data

    def _encode(w, h, planes, quants, specs, samps=None, dri=0):
        """planes: per-component 2-D arrays ALREADY at component
        resolution (chroma pre-downsampled for subsampled modes);
        quants: per-component 64-int raster tables; specs: per-
        component ((dc_bits, dc_vals), (ac_bits, ac_vals), _, _);
        samps: per-component (hi, vi) sampling factors (default all
        1x1); dri > 0 emits a DRI segment and a restart marker every
        `dri` MCUs."""
        nc = len(planes)
        samps = samps or [(1, 1)] * nc
        maxh = max(s[0] for s in samps)
        maxv = max(s[1] for s in samps)
        out = [b"\xFF\xD8"]                        # SOI
        out.append(b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
                   + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
                   + bytes([0, 0]))
        seen_q = {}
        for ci in range(nc):
            qid = id(quants[ci])
            if qid not in seen_q:
                seen_q[qid] = len(seen_q)
                out.append(_dqt_seg(seen_q[qid], quants[ci]))
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
        for ci in range(nc):
            sof += bytes([ci + 1, samps[ci][0] << 4 | samps[ci][1],
                          seen_q[id(quants[ci])]])
        out.append(b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof)
        seen_h = {}
        for ci in range(nc):
            dc_spec, ac_spec, _, _ = specs[ci]
            for cls, spec in ((0, dc_spec), (1, ac_spec)):
                key = (cls, id(spec))
                if key not in seen_h:
                    seen_h[key] = len([k for k in seen_h
                                       if k[0] == cls])
                    out.append(_dht_seg(cls, seen_h[key], spec))
        if dri:
            out.append(b"\xFF\xDD" + struct.pack(">HH", 4, dri))
        sos = bytes([nc])
        for ci in range(nc):
            dc_spec, ac_spec, _, _ = specs[ci]
            sos += bytes([ci + 1,
                          seen_h[(0, id(dc_spec))] << 4
                          | seen_h[(1, id(ac_spec))]])
        sos += bytes([0, 63, 0])
        out.append(b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos)

        mcux = (w + 8 * maxh - 1) // (8 * maxh)
        mcuy = (h + 8 * maxv - 1) // (8 * maxv)
        dc_codes = [_codes_from_spec(*s[0]) for s in specs]
        ac_codes = [_codes_from_spec(*s[1]) for s in specs]
        padded = []
        for ci, p in enumerate(planes):
            hi, vi = samps[ci]
            ph, pw = mcuy * 8 * vi, mcux * 8 * hi
            ch, cw = p.shape
            pp = np.empty((ph, pw), dtype=np.float64)
            pp[:ch, :cw] = p
            pp[ch:, :cw] = p[-1:, :]               # edge replicate
            pp[:, cw:] = pp[:, cw - 1:cw]
            padded.append(pp - 128.0)

        bw = _BitWriter()
        preds = [0] * nc
        rst = 0
        n_mcu = mcux * mcuy
        for mi in range(n_mcu):
            if dri and mi and mi % dri == 0:
                bw.flush()                         # byte-align + RSTn
                bw.buf.append(0xFF)
                bw.buf.append(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * nc
            my, mx = divmod(mi, mcux)
            for ci in range(nc):
                hi, vi = samps[ci]
                for v in range(vi):
                    for hh in range(hi):
                        by, bx = my * vi + v, mx * hi + hh
                        blk = padded[ci][by * 8:by * 8 + 8,
                                         bx * 8:bx * 8 + 8]
                        coef = np.round(_fdct2(blk)
                                        / quants[ci].reshape(8, 8)
                                        ).astype(np.int64)
                        zz = coef.reshape(64)[ZZ]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_codes[ci],
                            ac_codes[ci])
        bw.flush()
        out.append(bytes(bw.buf))
        out.append(b"\xFF\xD9")                    # EOI
        return b"".join(out)

    def encode_gray(w, h, rows, unit_quant=False, dri=0):
        plane = np.asarray(rows, dtype=np.float64)
        q = (np.ones(64, dtype=np.int64) if unit_quant else QL)
        return _encode(w, h, [plane], [q], [(DC_L, AC_L, 0, 0)],
                       dri=dri)

    def _downsample(p, fx, fy):
        """Box-average downsample by (fx, fy) with edge padding."""
        h, w = p.shape
        ph, pw = (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
        pp = np.empty((ph, pw), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1:w]
        return pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))

    def encode_rgb(w, h, rows, unit_quant=False, sampling="444",
                   dri=0):
        """JFIF YCbCr color. sampling: '444' (no subsampling), '422'
        (chroma halved horizontally), '420' (halved both ways) —
        chroma planes are box-average downsampled before coding."""
        a = np.asarray(rows, dtype=np.float64)     # (h, w, 3)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        fx, fy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[sampling]
        if fx > 1 or fy > 1:
            cb, cr = _downsample(cb, fx, fy), _downsample(cr, fx, fy)
        samps = [(fx, fy), (1, 1), (1, 1)]
        ql = np.ones(64, dtype=np.int64) if unit_quant else QL
        qc = np.ones(64, dtype=np.int64) if unit_quant else QC
        return _encode(w, h, [y, cb, cr], [ql, qc, qc],
                       [(DC_L, AC_L, 0, 0), (DC_C, AC_C, 1, 1),
                        (DC_C, AC_C, 1, 1)], samps=samps, dri=dri)

    # ---- progressive encoder ---------------------------------------
    def _coef_blocks(w, h, planes, quants, samps):
        """Per-component zigzag-ordered quantized DCT coefficients on
        the MCU-padded grid: list of (nby, nbx, 64) int arrays."""
        maxh = max(s[0] for s in samps)
        maxv = max(s[1] for s in samps)
        mcux = (w + 8 * maxh - 1) // (8 * maxh)
        mcuy = (h + 8 * maxv - 1) // (8 * maxv)
        out = []
        for ci, p in enumerate(planes):
            hi, vi = samps[ci]
            nby, nbx = mcuy * vi, mcux * hi
            ch, cw = p.shape
            pp = np.empty((nby * 8, nbx * 8), dtype=np.float64)
            pp[:ch, :cw] = p
            pp[ch:, :cw] = p[-1:, :]
            pp[:, cw:] = pp[:, cw - 1:cw]
            pp -= 128.0
            blocks = (pp.reshape(nby, 8, nbx, 8)
                      .transpose(0, 2, 1, 3))
            freq = np.einsum("ab,yxbc,cd->yxad", _M, blocks, _M.T)
            q = quants[ci].reshape(8, 8)
            zz = np.round(freq / q[None, None]).astype(
                np.int64).reshape(nby, nbx, 64)[..., ZZ]
            out.append(zz)
        return out, mcux, mcuy

    # ---- arithmetic entropy layer (T.81 Annex D + F.1.4 / F.2) -----
    # QM-coder probability estimation state machine, T.81 Table D.3:
    # (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS). Index 113 is
    # the non-adapting 0.5 state used for AC signs (F.1.4.3.1).
    # Written from the published spec tables; cross-codec fixtures
    # (libjpeg-turbo) are unavailable in this container, so the
    # verified contract is encoder↔decoder round-trip over every
    # path: carries, stacked 0xFF resolution, restart intervals,
    # conditioning-table variants.
    _QM = (
        (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
        (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
        (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
        (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
        (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
        (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
        (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
        (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
        (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
        (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
        (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
        (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
        (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
        (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
        (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
        (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
        (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
        (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
        (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
        (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
        (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
        (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
        (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
        (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
        (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
        (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
        (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
        (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
        (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
        (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
        (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
        (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
        (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0),
        (0x41CF, 103, 99, 0), (0x3C3D, 104, 100, 0),
        (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
        (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0),
        (0x415E, 103, 99, 0), (0x5627, 105, 106, 1),
        (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
        (0x5597, 110, 109, 0), (0x504F, 111, 107, 0),
        (0x5A10, 110, 111, 1), (0x5522, 112, 109, 0),
        (0x59EB, 112, 111, 1),
        (0x5A1D, 113, 113, 0),            # fixed .5 (AC signs)
    )
    assert len(_QM) == 114

    def _stats(n):
        """A statistics area: per bin [state index, MPS sense]."""
        return [bytearray(n), bytearray(n)]

    _FIXED = _stats(1)
    _FIXED[0][0] = 113

    class _ArithEnc:
        """T.81 Annex D QM encoder: conditional exchange, renorm-
        driven estimation, byte output with carry resolution over
        stacked 0xFF bytes and JPEG 0x00 stuffing."""

        def __init__(self):
            self.a = 0x10000
            self.c = 0
            self.ct = 11
            self.stack = 0
            self.buf = bytearray()

        def _emit(self, byte):
            self.buf.append(byte)
            if byte == 0xFF:                 # D.1.6 byte stuffing
                self.buf.append(0x00)

        def _carry(self):
            if not self.buf:
                # carry into the conceptual byte before the stream:
                # materialize it so the binary value is preserved
                self.buf.append(0x01)
                return
            # the last data byte is never a 0xFF (those are stacked),
            # but +1 may turn it INTO one — stuff behind it then
            j = len(self.buf) - 1
            self.buf[j] += 1
            if self.buf[j] == 0xFF:
                self.buf.append(0x00)

        def _byteout(self):
            t = self.c >> 19
            if t > 0xFF:
                self._carry()
                # the carry washes stacked 0xFFs to 0x00
                for _ in range(self.stack):
                    self._emit(0x00)
                self.stack = 0
                self._emit(t & 0xFF)
            elif t == 0xFF:
                self.stack += 1              # defer: may still carry
            else:
                for _ in range(self.stack):
                    self._emit(0xFF)
                self.stack = 0
                self._emit(t)
            self.c &= 0x7FFFF

        def _renorm(self):
            while self.a < 0x8000:
                self.a <<= 1
                self.c <<= 1
                self.ct -= 1
                if self.ct == 0:
                    self._byteout()
                    self.ct = 8

        def encode(self, stats, i, bit):
            idx = stats[0][i]
            mps = stats[1][i]
            qe, nlps, nmps, sw = _QM[idx]
            a = self.a - qe
            if bit == mps:
                if a & 0x8000:
                    self.a = a
                    self.c += qe
                    return
                if a < qe:                   # exchange: MPS @ bottom
                    self.a = qe
                else:
                    self.a = a
                    self.c += qe
                stats[0][i] = nmps
            else:
                if a < qe:                   # exchange: LPS @ top
                    self.a = a
                    self.c += qe
                else:
                    self.a = qe
                if sw:
                    stats[1][i] = 1 - mps
                stats[0][i] = nlps
            self._renorm()

        def finish(self):
            """D.1.8/D.1.9: point C at a value inside the final
            interval with maximal trailing zeros, push out the
            remaining bits, resolve the 0xFF stack carry-free."""
            t = (self.c + self.a - 1) & ~0xFFFF
            self.c = t + 0x8000 if t < self.c else t
            self.c <<= self.ct
            self._byteout()
            self.c <<= 8
            self._byteout()
            for _ in range(self.stack):
                self._emit(0xFF)
            self.stack = 0
            out = bytes(self.buf)
            self.buf = bytearray()
            return out

    class _ArithDec:
        """T.81 F.2.2.5 QM decoder over the entropy segment: FF00
        unstuffing, zero-fed past any marker (never consumed, so the
        scan loop can resync)."""

        def __init__(self, b, off):
            self.b = b
            self.i = off
            self.ended = False
            self.cur = 0
            self.nbit = 0
            self.cx = (self._byte() << 8) | self._byte()
            self.a = 0x10000

        def _byte(self):
            if self.ended or self.i >= len(self.b):
                self.ended = True
                return 0
            c = self.b[self.i]
            if c == 0xFF:
                nxt = (self.b[self.i + 1]
                       if self.i + 1 < len(self.b) else 0xD9)
                if nxt != 0x00:              # marker: stop, feed 0s
                    self.ended = True
                    return 0
                self.i += 2
            else:
                self.i += 1
            return c

        def _bit(self):
            if self.nbit == 0:
                self.cur = self._byte()
                self.nbit = 8
            self.nbit -= 1
            return (self.cur >> self.nbit) & 1

        def decode(self, stats, i):
            idx = stats[0][i]
            mps = stats[1][i]
            qe, nlps, nmps, sw = _QM[idx]
            a = self.a - qe
            if self.cx < qe:                 # bottom subinterval
                if a < qe:                   # exchange: MPS
                    d = mps
                    stats[0][i] = nmps
                else:
                    d = mps ^ 1
                    if sw:
                        stats[1][i] = mps ^ 1
                    stats[0][i] = nlps
                self.a = qe
            else:
                self.cx -= qe
                if a & 0x8000:
                    self.a = a
                    return mps
                if a < qe:                   # exchange: LPS
                    d = mps ^ 1
                    if sw:
                        stats[1][i] = mps ^ 1
                    stats[0][i] = nlps
                else:
                    d = mps
                    stats[0][i] = nmps
                self.a = a
            while self.a < 0x8000:
                self.a <<= 1
                self.cx = (self.cx << 1) | self._bit()
            return d

    def _arith_enc_dc(enc, dcst, ctx, ci, diff, lo, up):
        """F.1.4.1: DC difference. Context (0/4/8/12/16 by previous
        diff class) selects the 4-bin decision group; magnitude
        category bins start at 20 (Table F.4), mantissa at +14."""
        c0 = ctx[ci]
        if diff == 0:
            enc.encode(dcst, c0, 0)
            ctx[ci] = 0
            return
        enc.encode(dcst, c0, 1)
        sign = 1 if diff < 0 else 0
        enc.encode(dcst, c0 + 1, sign)
        st = c0 + 2 + sign
        e = (diff if diff > 0 else -diff) - 1
        m = 0
        if e:
            enc.encode(dcst, st, 1)
            m = 1
            st = 20
            v2 = e
            while True:
                v2 >>= 1
                if not v2:
                    break
                enc.encode(dcst, st, 1)
                m <<= 1
                st += 1
        enc.encode(dcst, st, 0)
        if m < (1 << lo) >> 1:
            ctx[ci] = 0
        elif m > (1 << up) >> 1:
            ctx[ci] = 12 + 4 * sign
        else:
            ctx[ci] = 4 + 4 * sign
        st += 14
        mask = m
        while mask > 1:
            mask >>= 1
            enc.encode(dcst, st, 1 if e & mask else 0)

    def _arith_enc_ac(enc, acst, zz, kx):
        """F.1.4.2: AC band. Per-position 3-bin groups (EOB decision,
        zero/nonzero, magnitude head); sign via the fixed 0.5 state;
        low/high magnitude category bins at 189/217 split by Kx."""
        ke = 63
        while ke and not zz[ke]:
            ke -= 1
        k = 1
        while k <= 63:
            st = 3 * (k - 1)
            if k > ke:
                enc.encode(acst, st, 1)      # EOB
                return
            enc.encode(acst, st, 0)
            while not zz[k]:
                enc.encode(acst, st + 1, 0)
                st += 3
                k += 1
            enc.encode(acst, st + 1, 1)
            v = int(zz[k])
            sign = 1 if v < 0 else 0
            enc.encode(_FIXED, 0, sign)
            e = (v if v > 0 else -v) - 1
            st += 2
            m = 0
            if e:
                enc.encode(acst, st, 1)
                m = 1
                v2 = e >> 1
                if v2:
                    enc.encode(acst, st, 1)
                    m = 2
                    st = 189 if k <= kx else 217
                    while True:
                        v2 >>= 1
                        if not v2:
                            break
                        enc.encode(acst, st, 1)
                        m <<= 1
                        st += 1
            enc.encode(acst, st, 0)
            st += 14
            mask = m
            while mask > 1:
                mask >>= 1
                enc.encode(acst, st, 1 if e & mask else 0)
            k += 1

    def _dac_seg(dc_ids, ac_ids, dc_cond, ac_cond):
        data = bytearray()
        for tid in sorted(dc_ids):
            lo, up = dc_cond.get(tid, (0, 1))
            data += bytes([tid, up << 4 | lo])
        for tid in sorted(ac_ids):
            data += bytes([0x10 | tid, ac_cond.get(tid, 5)])
        return (b"\xFF\xCC" + struct.pack(">H", 2 + len(data))
                + bytes(data))

    def _encode_arith(w, h, planes, quants, samps=None, dri=0,
                      dc_cond=None, ac_cond=None):
        """Sequential arithmetic DCT (SOF9). planes/quants/samps as
        in _encode; every component shares conditioning tables 0
        (DAC segment written explicitly). dri > 0 flushes the coder,
        emits RSTn, and resets coder+statistics+contexts every dri
        MCUs (F.1.4.4.3)."""
        nc = len(planes)
        samps = samps or [(1, 1)] * nc
        dc_cond = {0: (0, 1), **(dc_cond or {})}
        ac_cond = {0: 5, **(ac_cond or {})}
        lo, up = dc_cond[0]
        kx = ac_cond[0]
        out = [b"\xFF\xD8"]
        out.append(b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
                   + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
                   + bytes([0, 0]))
        seen_q = {}
        for ci in range(nc):
            qid = id(quants[ci])
            if qid not in seen_q:
                seen_q[qid] = len(seen_q)
                out.append(_dqt_seg(seen_q[qid], quants[ci]))
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
        for ci in range(nc):
            sof += bytes([ci + 1, samps[ci][0] << 4 | samps[ci][1],
                          seen_q[id(quants[ci])]])
        out.append(b"\xFF\xC9" + struct.pack(">H", 2 + len(sof)) + sof)
        out.append(_dac_seg({0}, {0}, dc_cond, ac_cond))
        if dri:
            out.append(b"\xFF\xDD" + struct.pack(">HH", 4, dri))
        sos = bytes([nc])
        for ci in range(nc):
            sos += bytes([ci + 1, 0x00])     # cond tables 0/0
        sos += bytes([0, 63, 0])
        out.append(b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos)

        coefs, mcux, mcuy = _coef_blocks(w, h, planes, quants, samps)
        entropy = bytearray()

        def fresh():
            return (_ArithEnc(), _stats(64), _stats(256),
                    [0] * nc, [0] * nc)

        enc, dcst, acst, preds, ctx = fresh()
        rst = 0
        for mi in range(mcux * mcuy):
            if dri and mi and mi % dri == 0:
                entropy += enc.finish()
                entropy += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                enc, dcst, acst, preds, ctx = fresh()
            my, mx = divmod(mi, mcux)
            for ci in range(nc):
                hi, vi = samps[ci]
                for v in range(vi):
                    for hh in range(hi):
                        zz = coefs[ci][my * vi + v, mx * hi + hh]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        _arith_enc_dc(enc, dcst, ctx, ci, diff,
                                      lo, up)
                        _arith_enc_ac(enc, acst, zz, kx)
        entropy += enc.finish()
        out.append(bytes(entropy))
        out.append(b"\xFF\xD9")
        return b"".join(out)

    def encode_gray_arith(w, h, rows, unit_quant=False, dri=0):
        plane = np.asarray(rows, dtype=np.float64)
        q = (np.ones(64, dtype=np.int64) if unit_quant else QL)
        return _encode_arith(w, h, [plane], [q], dri=dri)

    def encode_rgb_arith(w, h, rows, unit_quant=False,
                         sampling="444", dri=0):
        a = np.asarray(rows, dtype=np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        fx, fy = {"444": (1, 1), "422": (2, 1),
                  "420": (2, 2)}[sampling]
        if fx > 1 or fy > 1:
            cb, cr = _downsample(cb, fx, fy), _downsample(cr, fx, fy)
        samps = [(fx, fy), (1, 1), (1, 1)]
        ql = np.ones(64, dtype=np.int64) if unit_quant else QL
        qc = np.ones(64, dtype=np.int64) if unit_quant else QC
        return _encode_arith(w, h, [y, cb, cr], [ql, qc, qc],
                             samps=samps, dri=dri)

    def _arith_scan(b, off, scomps, ss, se, ah, al, dri, mcux, mcuy,
                    dc_cond, ac_cond):
        """Sequential arithmetic SOS (F.2.2): full-band MCU walk
        mirroring _entropy_scan, QM-decoded. Progressive arithmetic
        (SOF10 scan scripts) stays out of scope."""
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("arithmetic scans must be full-band "
                             "sequential (Ss=0 Se=63 Ah=Al=0)")
        nc = len(scomps)

        def fresh():
            dec = _ArithDec(b, off)
            return (dec, {}, {}, [0] * nc, [0] * nc)

        def dc_area(tid):
            return dcst.setdefault(tid, _stats(64))

        def ac_area(tid):
            return acst.setdefault(tid, _stats(256))

        dec, dcst, acst, preds, ctx = fresh()
        fixed = _stats(1)
        fixed[0][0] = 113
        rst = 0
        interleaved = nc > 1
        n_units = (mcux * mcuy if interleaved
                   else scomps[0]["nbx"] * scomps[0]["nby"])
        for ui in range(n_units):
            if dri and ui and ui % dri == 0:
                off = dec.i
                if not (off + 1 < len(b) and b[off] == 0xFF
                        and b[off + 1] == 0xD0 + rst):
                    raise ValueError("expected restart marker")
                off += 2
                rst = (rst + 1) % 8
                dec, dcst, acst, preds, ctx = fresh()
            if interleaved:
                my, mx = divmod(ui, mcux)
                units = [(ci, comp, my * comp["v"] + v,
                          mx * comp["h"] + hh)
                         for ci, comp in enumerate(scomps)
                         for v in range(comp["v"])
                         for hh in range(comp["h"])]
            else:
                comp = scomps[0]
                by, bx = divmod(ui, comp["nbx"])
                units = [(0, comp, by, bx)]
            for ci, comp, by, bx in units:
                lo, up = dc_cond.get(comp["dc_tid"], (0, 1))
                kx = ac_cond.get(comp["ac_tid"], 5)
                dca = dc_area(comp["dc_tid"])
                aca = ac_area(comp["ac_tid"])
                blk = comp["coef"][by, bx]
                # DC (F.2.2.1)
                st = ctx[ci]
                if dec.decode(dca, st):
                    sign = dec.decode(dca, st + 1)
                    st += 2 + sign
                    m = 0
                    if dec.decode(dca, st):
                        m = 1
                        st = 20
                        while dec.decode(dca, st):
                            m <<= 1
                            st += 1
                            if m == 0x8000:
                                raise ValueError("corrupt DC magnitude")
                    if m < (1 << lo) >> 1:
                        ctx[ci] = 0
                    elif m > (1 << up) >> 1:
                        ctx[ci] = 12 + 4 * sign
                    else:
                        ctx[ci] = 4 + 4 * sign
                    val = m
                    st += 14
                    while m > 1:
                        m >>= 1
                        if dec.decode(dca, st):
                            val |= m
                    val += 1
                    preds[ci] += -val if sign else val
                else:
                    ctx[ci] = 0
                blk[0] = preds[ci]
                # AC (F.2.2.2)
                k = 1
                while k <= 63:
                    st = 3 * (k - 1)
                    if dec.decode(aca, st):
                        break                # EOB
                    while not dec.decode(aca, st + 1):
                        st += 3
                        k += 1
                        if k > 63:
                            raise ValueError("AC overflow")
                    sign = dec.decode(fixed, 0)
                    st += 2
                    m = 0
                    if dec.decode(aca, st):
                        m = 1
                        if dec.decode(aca, st):
                            m = 2
                            st = 189 if k <= kx else 217
                            while dec.decode(aca, st):
                                m <<= 1
                                st += 1
                                if m == 0x8000:
                                    raise ValueError(
                                        "corrupt AC magnitude")
                    val = m
                    st += 14
                    while m > 1:
                        m >>= 1
                        if dec.decode(aca, st):
                            val |= m
                    val += 1
                    blk[k] = -val if sign else val
                    k += 1
        return dec.i

    def _emit_eobrun(bw, ac_codes, eobrun):
        if eobrun:
            r = eobrun.bit_length() - 1
            c, ln = ac_codes[r << 4]
            bw.put(c, ln)
            if r:
                bw.put(eobrun - (1 << r), r)

    # Progressive AC scans need EOBn symbols (r<<4 for r = 1..14)
    # that the Annex K baseline tables do not define — real encoders
    # ship custom DHTs. This one is deliberately flat: all 176
    # symbols the scan types can emit (EOB0..EOB14, ZRL, every
    # (run 0-15, size 1-10)) at code length 8 — Kraft sum 176/256,
    # trivially canonical, decoded from the DHT like any other table.
    PROG_AC = ([0] * 7 + [176] + [0] * 8,
               [r << 4 for r in range(15)] + [0xF0]
               + [(run << 4) | s for run in range(16)
                  for s in range(1, 11)])

    def _encode_progressive(w, h, planes, quants, specs, samps=None):
        """SOF2 progressive writer following cjpeg's standard scan
        script: DC-first at Al=1 (interleaved), spectral-selection AC
        first scans at Al≥1 per component, then AC successive-
        approximation refinements down to Al=0, DC refinement last.
        First scans accumulate cross-block EOB runs; refinement scans
        use the per-block EOB form (both legal, and together they
        exercise every decoder path)."""
        nc = len(planes)
        samps = samps or [(1, 1)] * nc
        # every component's AC coding uses the shared progressive
        # table; DC keeps the caller's (standard) tables
        specs = [(s[0], PROG_AC, s[2], s[3]) for s in specs]
        coefs, mcux, mcuy = _coef_blocks(w, h, planes, quants, samps)
        maxh = max(s[0] for s in samps)
        maxv = max(s[1] for s in samps)

        out = [b"\xFF\xD8"]
        out.append(b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
                   + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
                   + bytes([0, 0]))
        seen_q = {}
        for ci in range(nc):
            qid = id(quants[ci])
            if qid not in seen_q:
                seen_q[qid] = len(seen_q)
                out.append(_dqt_seg(seen_q[qid], quants[ci]))
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
        for ci in range(nc):
            sof += bytes([ci + 1, samps[ci][0] << 4 | samps[ci][1],
                          seen_q[id(quants[ci])]])
        out.append(b"\xFF\xC2" + struct.pack(">H", 2 + len(sof)) + sof)
        seen_h = {}
        for ci in range(nc):
            dc_spec, ac_spec, _, _ = specs[ci]
            for cls, spec in ((0, dc_spec), (1, ac_spec)):
                key = (cls, id(spec))
                if key not in seen_h:
                    seen_h[key] = len([k for k in seen_h
                                       if k[0] == cls])
                    out.append(_dht_seg(cls, seen_h[key], spec))
        dc_codes = [_codes_from_spec(*s[0]) for s in specs]
        ac_codes = [_codes_from_spec(*s[1]) for s in specs]

        def sos_seg(cis, ss, se, ah, al):
            seg = bytes([len(cis)])
            for ci in cis:
                dc_spec, ac_spec, _, _ = specs[ci]
                seg += bytes([ci + 1,
                              seen_h[(0, id(dc_spec))] << 4
                              | seen_h[(1, id(ac_spec))]])
            seg += bytes([ss, se, ah << 4 | al])
            return (b"\xFF\xDA"
                    + struct.pack(">H", 2 + len(seg)) + seg)

        def dc_scan(al, refine):
            bw = _BitWriter()
            preds = [0] * nc
            for mi in range(mcux * mcuy):
                my, mx = divmod(mi, mcux)
                for ci in range(nc):
                    hi, vi = samps[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            dc = int(coefs[ci][my * vi + v,
                                               mx * hi + hh, 0])
                            if refine:
                                bw.put((dc >> al) & 1, 1)
                                continue
                            val = dc >> al        # arith shift (G.1.2.1)
                            size, amp = _mag_bits(val - preds[ci])
                            c, ln = dc_codes[ci][size]
                            bw.put(c, ln)
                            if size:
                                bw.put(amp, size)
                            preds[ci] = val
            bw.flush()
            return bytes(bw.buf)

        def _noninterleaved_grid(ci):
            hi, vi = samps[ci]
            nbx = (-(-w * hi // maxh) + 7) // 8
            nby = (-(-h * vi // maxv) + 7) // 8
            return nby, nbx

        def ac_first(ci, ss, se, al):
            bw = _BitWriter()
            nby, nbx = _noninterleaved_grid(ci)
            eobrun = 0
            for bi in range(nby * nbx):
                by, bx = divmod(bi, nbx)
                band = coefs[ci][by, bx, ss:se + 1]
                # AC point transform truncates toward zero (G.1.2.2)
                vals = [(1 if v > 0 else -1) * (abs(int(v)) >> al)
                        for v in band]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        _emit_eobrun(bw, ac_codes[ci], eobrun)
                        eobrun = 0
                    continue
                _emit_eobrun(bw, ac_codes[ci], eobrun)
                eobrun = 0
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i, v in enumerate(vals[:last_nz + 1]):
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = ac_codes[ci][0xF0]
                        bw.put(c, ln)
                        run -= 16
                    size, amp = _mag_bits(v)
                    c, ln = ac_codes[ci][(run << 4) | size]
                    bw.put(c, ln)
                    bw.put(amp, size)
                    run = 0
                if last_nz < len(vals) - 1:
                    eobrun = 1
            _emit_eobrun(bw, ac_codes[ci], eobrun)
            bw.flush()
            return bytes(bw.buf)

        def ac_refine(ci, ss, se, al):
            bw = _BitWriter()
            nby, nbx = _noninterleaved_grid(ci)

            def flush_br(br_bits):
                for bit in br_bits:
                    bw.put(bit, 1)
                br_bits.clear()

            for bi in range(nby * nbx):
                by, bx = divmod(bi, nbx)
                band = [int(v) for v in coefs[ci][by, bx, ss:se + 1]]
                absv = [abs(v) >> al for v in band]
                # last newly-significant position: zero-runs beyond
                # it fold into the EOB instead of ZRLs
                eobpos = max((i for i, t in enumerate(absv)
                              if t == 1), default=-1)
                r = 0
                br_bits = []
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    # ZRL check at EVERY nonzero position (libjpeg
                    # encode_mcu_AC_refine): correction bits must
                    # flush in the order the decoder's skip-16 pass
                    # consumes them — emitting ZRL only at newly-
                    # significant positions reorders bits whenever an
                    # already-significant coefficient sits past the
                    # 16th zero of a long run
                    while r > 15 and i <= eobpos:
                        c, ln = ac_codes[ci][0xF0]
                        bw.put(c, ln)
                        flush_br(br_bits)
                        r -= 16
                    if t > 1:                      # already significant
                        br_bits.append(t & 1)
                        continue
                    c, ln = ac_codes[ci][(r << 4) | 1]
                    bw.put(c, ln)
                    bw.put(1 if band[i] > 0 else 0, 1)
                    flush_br(br_bits)
                    r = 0
                if r or br_bits:                   # per-block EOB
                    c, ln = ac_codes[ci][0x00]
                    bw.put(c, ln)
                    flush_br(br_bits)
            bw.flush()
            return bytes(bw.buf)

        all_cis = list(range(nc))
        out.append(sos_seg(all_cis, 0, 0, 0, 1))
        out.append(dc_scan(1, refine=False))
        if nc == 1:
            script = [(0, 1, 5, 0, 2), (0, 6, 63, 0, 2),
                      (0, 1, 63, 2, 1), (0, 1, 63, 1, 0)]
        else:
            script = [(0, 1, 5, 0, 2), (2, 1, 63, 0, 1),
                      (1, 1, 63, 0, 1), (0, 6, 63, 0, 2),
                      (0, 1, 63, 2, 1), (2, 1, 63, 1, 0),
                      (0, 1, 63, 1, 0), (1, 1, 63, 1, 0)]
        for ci, ss, se, ah, al in script:
            out.append(sos_seg([ci], ss, se, ah, al))
            if ah == 0:
                out.append(ac_first(ci, ss, se, al))
            else:
                out.append(ac_refine(ci, ss, se, al))
        out.append(sos_seg(all_cis, 0, 0, 1, 0))
        out.append(dc_scan(0, refine=True))
        out.append(b"\xFF\xD9")
        return b"".join(out)

    def encode_progressive_gray(w, h, rows, unit_quant=False):
        plane = np.asarray(rows, dtype=np.float64)
        q = (np.ones(64, dtype=np.int64) if unit_quant else QL)
        return _encode_progressive(w, h, [plane], [q],
                                   [(DC_L, AC_L, 0, 0)])

    def encode_progressive_rgb(w, h, rows, unit_quant=False,
                               sampling="444"):
        a = np.asarray(rows, dtype=np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        fx, fy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[sampling]
        if fx > 1 or fy > 1:
            cb, cr = _downsample(cb, fx, fy), _downsample(cr, fx, fy)
        samps = [(fx, fy), (1, 1), (1, 1)]
        ql = np.ones(64, dtype=np.int64) if unit_quant else QL
        qc = np.ones(64, dtype=np.int64) if unit_quant else QC
        return _encode_progressive(
            w, h, [y, cb, cr], [ql, qc, qc],
            [(DC_L, AC_L, 0, 0), (DC_C, AC_C, 1, 1),
             (DC_C, AC_C, 1, 1)], samps=samps)

    # ---- decoder ---------------------------------------------------
    class _BitReader:
        """MSB-first over the entropy segment with FF00 unstuffing;
        stops at any non-RST marker."""
        def __init__(self, b, off):
            self.b = b
            self.i = off
            self.acc = 0
            self.n = 0

        def _fill(self):
            if self.i >= len(self.b):
                raise EOFError
            c = self.b[self.i]
            if c == 0xFF:
                nxt = self.b[self.i + 1] if self.i + 1 < len(self.b) \
                    else 0xD9
                if nxt == 0x00:
                    self.i += 2
                else:
                    raise EOFError                 # marker (incl RST)
            else:
                self.i += 1
            self.acc = (self.acc << 8) | c
            self.n += 8

        def bit(self):
            if self.n == 0:
                self._fill()
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, k):
            v = 0
            for _ in range(k):
                v = (v << 1) | self.bit()
            return v

        def sync_restart(self):
            """Discard pad bits, consume the expected RSTn marker."""
            self.acc = 0
            self.n = 0
            if (self.i + 1 < len(self.b) and self.b[self.i] == 0xFF
                    and 0xD0 <= self.b[self.i + 1] <= 0xD7):
                self.i += 2
            else:
                raise ValueError("expected restart marker")

    def _extend(v, size):
        if size == 0:
            return 0
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    def _read_sym(br, lut):
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if (ln, code) in lut:
                return lut[(ln, code)]
        raise ValueError("bad huffman code")

    def decode(b: bytes):
        if sniff(b) is None:
            return None
        try:
            return _decode_inner(b)
        except (EOFError, ValueError, IndexError, KeyError,
                TypeError, struct.error):
            # TypeError covers a scan referencing an undeclared
            # Huffman table (comp["dc"/"ac"] is None)
            return None

    # The decoder is coefficient-domain and multi-scan: every SOS
    # (baseline's single full-band scan, or progressive's DC/AC
    # spectral-selection and successive-approximation scans) updates
    # per-component zigzag coefficient arrays; dequantize + IDCT +
    # color happen ONCE at EOI. This is the T.81 G.2 model — baseline
    # is just the degenerate script [Ss=0, Se=63, Ah=Al=0].
    def _decode_inner(b):
        i = 2
        quant = {}
        huff = {}
        comps = None
        w = h = 0
        dri = 0
        seen_scan = False
        arith = False
        dc_cond = {}
        ac_cond = {}
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                return None
            m = b[i + 1]
            if m == 0xD9:                          # EOI → reconstruct
                break
            if m == 0xFF:                          # fill byte
                i += 1
                continue
            ln = struct.unpack_from(">H", b, i + 2)[0]
            seg = b[i + 4:i + 2 + ln]
            if m == 0xDB:                          # DQT (multi-table)
                j = 0
                while j < len(seg):
                    prec, tid = seg[j] >> 4, seg[j] & 0x0F
                    n = 64 * (2 if prec else 1)
                    raw = seg[j + 1:j + 1 + n]
                    tbl = np.empty(64, dtype=np.int64)
                    if prec:
                        vals = struct.unpack(f">{64}H", raw)
                    else:
                        vals = list(raw)
                    tbl[ZZ] = vals                 # de-zigzag
                    quant[tid] = tbl
                    j += 1 + n
            elif m == 0xC4:                        # DHT (multi-table)
                j = 0
                while j < len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 0x0F
                    bits = list(seg[j + 1:j + 17])
                    n = sum(bits)
                    vals = list(seg[j + 17:j + 17 + n])
                    huff[(cls, tid)] = _lut_from_spec(bits, vals)
                    j += 17 + n
            elif m in (0xC0, 0xC1, 0xC2, 0xC9):    # SOF0/1/2/9
                arith = m == 0xC9
                h, w = struct.unpack_from(">HH", seg, 1)
                nc = seg[5]
                comps = []
                for c in range(nc):
                    cid, samp, qid = seg[6 + 3 * c:9 + 3 * c]
                    hi, vi = samp >> 4, samp & 0x0F
                    if not (1 <= hi <= 4 and 1 <= vi <= 4):
                        raise ValueError("bad sampling factors")
                    comps.append({"id": cid, "qid": qid,
                                  "h": hi, "v": vi})
                maxh = max(c["h"] for c in comps)
                maxv = max(c["v"] for c in comps)
                mcux = (w + 8 * maxh - 1) // (8 * maxh)
                mcuy = (h + 8 * maxv - 1) // (8 * maxv)
                for c in comps:
                    if maxh % c["h"] or maxv % c["v"]:
                        raise ValueError(
                            "non-integer upsampling ratios")
                    # full (MCU-padded) grid for interleaved scans;
                    # non-interleaved scans cover only the blocks of
                    # the component's own ceil(size/8) grid
                    c["nbx"] = (-(-w * c["h"] // maxh) + 7) // 8
                    c["nby"] = (-(-h * c["v"] // maxv) + 7) // 8
                    c["coef"] = np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64),
                        dtype=np.int64)
            elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xCA, 0xCB,
                       0xCD, 0xCE, 0xCF):
                raise ValueError(
                    "only baseline (SOF0/1), progressive (SOF2) and "
                    "sequential arithmetic (SOF9)")
            elif m == 0xCC:                        # DAC conditioning
                j = 0
                while j + 1 < len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 0x0F
                    val = seg[j + 1]
                    if cls == 0:
                        dc_cond[tid] = (val & 0x0F, val >> 4)
                    else:
                        ac_cond[tid] = val
                    j += 2
            elif m == 0xDD:                        # DRI
                dri = struct.unpack_from(">H", seg, 0)[0]
            elif m == 0xDA:                        # SOS (one of many)
                if comps is None:
                    raise ValueError("SOS before SOF")
                nc = seg[0]
                if nc < 1:
                    raise ValueError("empty scan")
                order = []
                for c in range(nc):
                    cid, tids = seg[1 + 2 * c], seg[2 + 2 * c]
                    match = [x for x in comps if x["id"] == cid]
                    if not match:
                        raise ValueError("scan references unknown "
                                         "component")
                    comp = match[0]
                    if arith:
                        comp["dc_tid"] = tids >> 4
                        comp["ac_tid"] = tids & 0x0F
                    else:
                        comp["dc"] = huff.get((0, tids >> 4))
                        comp["ac"] = huff.get((1, tids & 0x0F))
                    order.append(comp)
                ss, se, ahal = seg[1 + 2 * nc:4 + 2 * nc]
                if arith:
                    i = _arith_scan(b, i + 2 + ln, order, ss, se,
                                    ahal >> 4, ahal & 0x0F, dri,
                                    mcux, mcuy, dc_cond, ac_cond)
                else:
                    i = _entropy_scan(b, i + 2 + ln, order, ss, se,
                                      ahal >> 4, ahal & 0x0F, dri,
                                      mcux, mcuy)
                seen_scan = True
                # resync to the next marker
                while i < len(b) and b[i] != 0xFF:
                    i += 1
                continue
            i += 2 + ln
        if comps is None or not seen_scan:
            return None
        return _reconstruct(b, w, h, comps, quant, maxh, maxv,
                            mcux, mcuy)

    def _first_pass(br, comp, blk, ss, se, al, preds, ci, eob):
        """Ah == 0: initial contribution of each coefficient in the
        band, scaled by 2^Al. Baseline (ss=0, se=63, al=0) and the
        progressive DC/AC first scans share this path — a baseline
        EOB is just an EOB-run of length 1 (r = 0)."""
        k = ss
        if ss == 0:                                # DC (+ prediction)
            size = _read_sym(br, comp["dc"])
            preds[ci] += _extend(br.bits(size), size)
            blk[0] = preds[ci] << al
            k = 1
        if k > se:
            return eob
        if eob > 0:
            return eob - 1                         # band stays zero
        while k <= se:
            rs = _read_sym(br, comp["ac"])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:                        # ZRL
                    k += 16
                    continue
                return (1 << r) + br.bits(r) - 1   # EOB run starts
            k += r
            if k > se:
                raise ValueError("AC overflow")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1
        return 0

    def _refine_ac(br, comp, blk, ss, se, al, eob):
        """Ah == Al + 1 AC refinement (T.81 G.1.2.3): newly
        significant coefficients arrive as ±1·2^Al; every
        already-nonzero coefficient visited contributes one
        correction bit (1 → add 2^Al toward its sign)."""
        p1, m1 = 1 << al, -1 << al

        def correct(k):
            if br.bit() and not (blk[k] & p1):
                blk[k] += p1 if blk[k] > 0 else m1

        k = ss
        if eob == 0:
            while k <= se:
                rs = _read_sym(br, comp["ac"])
                r, s = rs >> 4, rs & 0x0F
                if s == 0 and r != 15:
                    eob = (1 << r) + br.bits(r)    # incl. this block
                    break
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError("refine size != 1")
                    newval = p1 if br.bit() else m1
                # advance past r zero-history slots, correcting
                # nonzero coefficients along the way
                while k <= se:
                    if blk[k]:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if eob > 0:
            # EOB-covered: the rest of the band still carries one
            # correction bit per nonzero coefficient
            while k <= se:
                if blk[k]:
                    correct(k)
                k += 1
            eob -= 1
        return eob

    def _entropy_scan(b, off, scomps, ss, se, ah, al, dri,
                      mcux, mcuy):
        br = _BitReader(b, off)
        interleaved = len(scomps) > 1
        preds = [0] * len(scomps)
        eob = 0
        if interleaved:
            n_units = mcux * mcuy
        else:
            n_units = scomps[0]["nbx"] * scomps[0]["nby"]
        for ui in range(n_units):
            if dri and ui and ui % dri == 0:
                br.sync_restart()
                preds = [0] * len(scomps)
                eob = 0
            if interleaved:
                my, mx = divmod(ui, mcux)
                for ci, comp in enumerate(scomps):
                    for v in range(comp["v"]):
                        for hh in range(comp["h"]):
                            blk = comp["coef"][my * comp["v"] + v,
                                               mx * comp["h"] + hh]
                            if ah == 0:
                                eob = _first_pass(
                                    br, comp, blk, ss, se, al,
                                    preds, ci, eob)
                            elif ss == 0:          # DC refinement
                                blk[0] |= br.bit() << al
                            else:
                                eob = _refine_ac(
                                    br, comp, blk, ss, se, al, eob)
            else:
                comp = scomps[0]
                by, bx = divmod(ui, comp["nbx"])
                blk = comp["coef"][by, bx]
                if ah == 0:
                    eob = _first_pass(br, comp, blk, ss, se, al,
                                      preds, 0, eob)
                elif ss == 0:
                    blk[0] |= br.bit() << al
                else:
                    eob = _refine_ac(br, comp, blk, ss, se, al, eob)
        return br.i

    def _reconstruct(b, w, h, comps, quant, maxh, maxv, mcux, mcuy):
        full = []
        for comp in comps:
            zz = comp["coef"]                      # (by, bx, 64) zigzag
            q = quant[comp["qid"]]
            nby, nbx = zz.shape[:2]
            rast = np.zeros((nby, nbx, 64), dtype=np.float64)
            rast[..., ZZ] = zz * q[ZZ][None, None, :]
            blocks = rast.reshape(nby, nbx, 8, 8)
            # batched separable IDCT: M.T @ C @ M over every block
            spat = np.einsum("ab,yxbc,cd->yxad", _M.T, blocks, _M)
            p = spat.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
            fx, fy = maxh // comp["h"], maxv // comp["v"]
            if fx > 1:
                p = np.repeat(p, fx, axis=1)
            if fy > 1:
                p = np.repeat(p, fy, axis=0)
            full.append(p)
        planes = [np.clip(np.round(p + 128.0), 0, 255)[:h, :w]
                  for p in full]
        if len(planes) == 1:
            g = planes[0].astype(np.int64)
            rows = [[(int(v),) * 3 for v in row] for row in g]
        elif len(planes) == 3:
            y, cb, cr = planes
            r = y + 1.402 * (cr - 128.0)
            g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            bl = y + 1.772 * (cb - 128.0)
            rgb = [np.clip(np.round(x), 0, 255).astype(np.int64)
                   for x in (r, g_, bl)]
            rows = [[(int(rgb[0][yy, xx]), int(rgb[1][yy, xx]),
                      int(rgb[2][yy, xx])) for xx in range(w)]
                    for yy in range(h)]
        else:
            raise ValueError("1 or 3 components only")
        return {"fmt": "jpeg", "width": w, "height": h,
                "n_components": len(planes), "n_bytes": len(b),
                "rows": rows}

    def decode_meta(b: bytes):
        if sniff(b) is None:
            return None
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            m = b[i + 1]
            if m in (0xC0, 0xC1, 0xC2, 0xC9):
                h, w = struct.unpack_from(">HH", b, i + 5)
                return {"fmt": "jpeg", "width": w, "height": h,
                        "n_components": b[i + 9], "n_bytes": len(b)}
            if m == 0xD9 or m == 0xDA:
                return None
            i += 2 + struct.unpack_from(">H", b, i + 2)[0]
        return None

    return SimpleNamespace(
        sniff=sniff, decode=decode, decode_meta=decode_meta,
        encode_gray=encode_gray, encode_rgb=encode_rgb,
        encode_progressive_gray=encode_progressive_gray,
        encode_progressive_rgb=encode_progressive_rgb,
        encode_gray_arith=encode_gray_arith,
        encode_rgb_arith=encode_rgb_arith,
        # test-only hooks: bit-level QM coder + block models
        _ArithEnc=_ArithEnc, _ArithDec=_ArithDec, _stats=_stats,
        _arith_enc_dc=_arith_enc_dc, _arith_enc_ac=_arith_enc_ac)


CODEC = make_jpeg_codec()
