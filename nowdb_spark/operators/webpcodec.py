"""Pure-Python WebP-LOSSLESS (VP8L) codec — real SAMPLE decode.

Built from the public WebP Lossless Bitstream Specification
(developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification,
RFC-style normative text shipped with libwebp). This is the
Huffman+LZ77 image member of the previously-gated sample-decode set:

* RIFF container walk → VP8L chunk, LSB-first bit reader
* prefix codes: SIMPLE (1-2 symbols) and NORMAL (code-length code in
  kCodeLengthCodeOrder, 16/17/18 repeat ops, optional max_symbol)
* spatially-coded image: green/red/blue/alpha/distance code groups,
  LZ77 back-references (length/distance prefix coding with extra
  bits, the 120-entry 2D distance neighborhood map), color cache
  (0x1e35a7bd multiplicative hashing), and META PREFIX CODES (the
  subresolution entropy image assigning a code group per tile)
* all four transforms, inverted in reverse bitstream order:
  PREDICTOR (14 modes incl. Select and the ClampAddSubtract pair,
  subresolution predictor image), COLOR (per-block ColorTransform
  elements, signed ``(t*c) >> 5`` deltas), SUBTRACT-GREEN,
  COLOR-INDEXING (delta-coded palette, sub-byte pixel bundling)

The companion encoder produces real VP8L files for the differential
fixtures — every encoded stream round-trips bit-exactly, cycling
every subframe feature (both prefix-code kinds, repeat ops, runs →
back-references, cache hits, each transform, bundled and unbundled
palettes, all 14 predictor modes across a corpus).

Out of honest scope (documented, sniffed, rejected with a clear
error): lossy VP8 members and the optional ALPH/EXIF/XMP
extended-format (VP8X) chunks.

Reference parity note: the reference engine has no media handling;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family), not reference parity.

Built by ``make_webp_codec()`` as nested closures so cloudpickle
ships the code by value to executors (same self-containment rule as
the image/FLAC codecs).
"""

from __future__ import annotations

from types import SimpleNamespace


def make_webp_codec() -> SimpleNamespace:
    import heapq

    import numpy as np

    # --- constants from the spec ------------------------------------
    _CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                 11, 12, 13, 14, 15)
    # 2D offset neighborhood for distance codes 1..120 (spec §4.2.2)
    _DIST_MAP = (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
        (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
        (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
        (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5),
        (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
        (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2), (4, 4),
        (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
        (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2),
        (-6, 2), (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6),
        (6, 3), (-6, 3), (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5),
        (-5, 5), (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
        (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7), (7, 3),
        (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5), (8, 0), (4, 7),
        (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6), (-6, 6),
        (2, 8), (-2, 8), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5),
        (8, 4), (3, 8), (-3, 8), (8, 5), (4, 8), (-4, 8), (6, 7),
        (-6, 7), (8, 6), (7, 6), (-7, 6), (8, 7))
    _GREEN_BASE = 256 + 24                 # literals + length codes

    # --- LSB-first bit IO --------------------------------------------

    class _BR:
        __slots__ = ("b", "pos", "nbits")

        def __init__(self, b: bytes, pos_bits: int = 0):
            self.b = b
            self.pos = pos_bits
            self.nbits = len(b) * 8

        def read(self, n: int) -> int:
            p = self.pos
            end = p + n
            if end > self.nbits:
                raise ValueError("vp8l: bitstream truncated")
            chunk = int.from_bytes(
                self.b[p >> 3:(end + 7) >> 3], "little")
            self.pos = end
            return (chunk >> (p & 7)) & ((1 << n) - 1)

    class _BW:
        __slots__ = ("out", "acc", "nacc")

        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.nacc = 0

        def write(self, v: int, n: int):
            self.acc |= (v & ((1 << n) - 1)) << self.nacc
            self.nacc += n
            while self.nacc >= 8:
                self.out.append(self.acc & 0xFF)
                self.acc >>= 8
                self.nacc -= 8

        def bytes(self) -> bytes:
            if self.nacc:
                self.out.append(self.acc & 0xFF)
                self.acc = 0
                self.nacc = 0
            return bytes(self.out)

    # --- canonical prefix codes (DEFLATE bit conventions) -------------

    def _canonical_codes(lengths):
        """lengths → {sym: (code, len)} (canonical, code bits read
        MSB-first from the LSB-first stream, as in DEFLATE)."""
        max_len = max(lengths, default=0)
        bl = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                bl[ln] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl[ln - 1]) << 1
            next_code[ln] = code
        out = {}
        for sym, ln in enumerate(lengths):
            if ln:
                out[sym] = (next_code[ln], ln)
                next_code[ln] += 1
        return out

    _ROOT_BITS = 8

    def _decode_table(lengths):
        """lengths → prefix decoder ('tab', root256, slow_dict) or
        ('const', sym). root256 is an 8-bit ROOT TABLE indexed by the
        next 8 RAW stream bits (LSB-first, as _BR.read returns them):
        entry = (symbol, code_len) for codes ≤ 8 bits, None for
        longer codes (which fall back to the per-bit dict walk).
        Over-subscribed codes (Kraft > 1) are rejected."""
        used = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not used:
            raise ValueError("vp8l: empty prefix code")
        kraft = sum(1 << (15 - ln) for _, ln in used)
        if kraft > (1 << 15):
            raise ValueError("vp8l: over-subscribed prefix code")
        codes = _canonical_codes(lengths)
        slow = {(ln, c): s for s, (c, ln) in codes.items()}
        root = [None] * (1 << _ROOT_BITS)
        for s, (c, ln) in codes.items():
            if ln > _ROOT_BITS:
                continue
            # stream order: bit k of the raw 8-bit peek is the k-th
            # bit read; the code consumes its bits MSB-first
            base = 0
            for k in range(ln):
                if (c >> (ln - 1 - k)) & 1:
                    base |= 1 << k
            ent = (s, ln)
            for fill in range(1 << (_ROOT_BITS - ln)):
                root[base | (fill << ln)] = ent
        return ("tab", (root, slow))

    def _read_sym(br: _BR, code) -> int:
        kind, payload = code
        if kind == "const":
            return payload
        root, slow = payload
        pos = br.pos
        if pos + _ROOT_BITS <= br.nbits:
            chunk = int.from_bytes(
                br.b[pos >> 3:(pos + _ROOT_BITS + 7) >> 3], "little")
            ent = root[(chunk >> (pos & 7)) & 0xFF]
            if ent is not None:
                br.pos = pos + ent[1]
                return ent[0]
        length = 0
        c = 0
        while True:
            length += 1
            if length > 15:
                raise ValueError("vp8l: bad prefix code stream")
            c = (c << 1) | br.read(1)
            s = slow.get((length, c))
            if s is not None:
                return s

    def _read_prefix_code(br: _BR, alphabet_size: int):
        if br.read(1):                      # SIMPLE code
            num_symbols = br.read(1) + 1
            sym0 = br.read(8) if br.read(1) else br.read(1)
            if num_symbols == 1:
                return ("const", sym0)
            sym1 = br.read(8)
            if sym0 == sym1 or max(sym0, sym1) >= alphabet_size:
                raise ValueError("vp8l: bad simple code")
            # code 0 → first TRANSMITTED symbol (spec order, not
            # canonical-by-symbol); root entries keyed by raw bit 0
            root = [(sym0, 1) if (v & 1) == 0 else (sym1, 1)
                    for v in range(1 << _ROOT_BITS)]
            return ("tab", (root, {(1, 0): sym0, (1, 1): sym1}))
        num_cl = 4 + br.read(4)
        cl_lengths = [0] * 19
        for i in range(num_cl):
            cl_lengths[_CL_ORDER[i]] = br.read(3)
        cl_code = _decode_table(cl_lengths)
        if br.read(1):                      # explicit max_symbol
            length_nbits = 2 + 2 * br.read(3)
            max_symbol = 2 + br.read(length_nbits)
        else:
            max_symbol = alphabet_size
        lengths = [0] * alphabet_size
        prev = 8
        symbol = 0
        while symbol < alphabet_size:
            if max_symbol <= 0:
                break
            max_symbol -= 1
            cl = _read_sym(br, cl_code)
            if cl < 16:
                lengths[symbol] = cl
                symbol += 1
                if cl:
                    prev = cl
            else:
                if cl == 16:
                    rep, val = 3 + br.read(2), prev
                elif cl == 17:
                    rep, val = 3 + br.read(3), 0
                else:
                    rep, val = 11 + br.read(7), 0
                if symbol + rep > alphabet_size:
                    raise ValueError("vp8l: code-length repeat overflow")
                for _ in range(rep):
                    lengths[symbol] = val
                    symbol += 1
        return _decode_table(lengths)

    # --- LZ77 helpers -------------------------------------------------

    def _prefix_val(br: _BR, code: int) -> int:
        if code < 4:
            return code + 1
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        return offset + br.read(extra) + 1

    def _prefix_encode(v: int):
        """value ≥ 1 → (code, extra_bits, extra_val) — inverse of
        _prefix_val."""
        x = v - 1
        if x < 4:
            return x, 0, 0
        b = x.bit_length() - 1
        extra = b - 1
        if x < (3 << extra):
            return 2 * extra + 2, extra, x - (2 << extra)
        return 2 * extra + 3, extra, x - (3 << extra)

    def _plane_to_dist(w: int, code: int) -> int:
        if code > 120:
            return code - 120
        dx, dy = _DIST_MAP[code - 1]
        return max(dy * w + dx, 1)

    def _cache_key(px: int, bits: int) -> int:
        return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - bits)

    # --- entropy-coded image (recursive for transform data) -----------

    def _decode_entropy_image(br: _BR, w: int, h: int):
        """One spatially-coded TRANSFORM plane at (w, h) → uint32
        ARGB array: cache flag + one code group + pixels. (The meta
        prefix flag exists only in the main plane — see
        _decode_entropy_image_main.)"""
        cache_bits = 0
        if br.read(1):
            cache_bits = br.read(4)
            if not 1 <= cache_bits <= 11:
                raise ValueError("vp8l: bad color cache size")
        return _decode_pixels(br, w, h, cache_bits)

    def _decode_entropy_image_main(br: _BR, w: int, h: int):
        """Main-plane variant (libwebp DecodeImageStream order):
        cache flag, then the META PREFIX flag — when set, a
        subresolution entropy image assigns one of several prefix-code
        GROUPS to each (1<<bits)-pixel tile ((red<<8)|green of the
        meta pixel is the group index) — then the group(s) +
        pixels."""
        cache_bits = 0
        if br.read(1):
            cache_bits = br.read(4)
            if not 1 <= cache_bits <= 11:
                raise ValueError("vp8l: bad color cache size")
        meta = None
        if br.read(1):                      # meta prefix codes
            bits = br.read(3) + 2
            ew = _subsample(w, bits)
            mimg = _decode_entropy_image(br, ew, _subsample(h, bits))
            midx = ((mimg >> 8) & 0xFFFF).astype(np.int64)
            n_groups = int(midx.max()) + 1
            meta = (midx, bits, ew, n_groups)
        return _decode_pixels(br, w, h, cache_bits, meta)

    # --- transforms -----------------------------------------------------

    def _subsample(size: int, bits: int) -> int:
        return (size + (1 << bits) - 1) >> bits

    def _s8(x):
        """uint8 → int8 view (numpy arrays or Python ints)."""
        return ((x ^ 0x80) - 0x80)

    def _inv_subtract_green(pix):
        g = (pix >> 8) & 0xFF
        r = ((pix >> 16) + g) & 0xFF
        b = (pix + g) & 0xFF
        return (pix & np.uint32(0xFF00FF00)) | (r << 16) | b

    def _inv_color_transform(pix, w, h, bits, elems):
        ew = _subsample(w, bits)
        y_idx = (np.arange(h) >> bits).astype(np.int64)
        x_idx = (np.arange(w) >> bits).astype(np.int64)
        e = elems.reshape(-1)[(y_idx[:, None] * ew + x_idx[None, :])
                              .reshape(-1)]
        g2r = _s8((e >> 0) & 0xFF).astype(np.int64)
        g2b = _s8((e >> 8) & 0xFF).astype(np.int64)
        r2b = _s8((e >> 16) & 0xFF).astype(np.int64)
        p = pix.astype(np.int64)
        green = _s8((p >> 8) & 0xFF)
        red = ((p >> 16) + ((g2r * green) >> 5)) & 0xFF
        blue = ((p & 0xFF) + ((g2b * green) >> 5)
                + ((r2b * _s8(red)) >> 5)) & 0xFF
        return ((pix & np.uint32(0xFF00FF00))
                | (red.astype(np.uint32) << 16)
                | blue.astype(np.uint32))

    def _avg2(a, b):
        return (((a >> 24) + (b >> 24)) >> 1 << 24 |
                (((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1 << 16 |
                (((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1 << 8 |
                ((a & 0xFF) + (b & 0xFF)) >> 1)

    def _clamp(x):
        return 0 if x < 0 else 255 if x > 255 else x

    def _predict(mode, L, T, TL, TR):
        if mode == 0:
            return 0xFF000000
        if mode == 1:
            return L
        if mode == 2:
            return T
        if mode == 3:
            return TR
        if mode == 4:
            return TL
        if mode == 5:
            return _avg2(_avg2(L, TR), T)
        if mode == 6:
            return _avg2(L, TL)
        if mode == 7:
            return _avg2(L, T)
        if mode == 8:
            return _avg2(TL, T)
        if mode == 9:
            return _avg2(T, TR)
        if mode == 10:
            return _avg2(_avg2(L, TL), _avg2(T, TR))
        if mode == 11:                      # Select
            pL = pT = 0
            for sh in (24, 16, 8, 0):
                lc = (L >> sh) & 0xFF
                tc = (T >> sh) & 0xFF
                pc = lc + tc - ((TL >> sh) & 0xFF)
                pL += abs(pc - lc)
                pT += abs(pc - tc)
            return L if pL < pT else T
        if mode == 12:                      # ClampAddSubtractFull
            out = 0
            for sh in (24, 16, 8, 0):
                c = _clamp(((L >> sh) & 0xFF) + ((T >> sh) & 0xFF)
                           - ((TL >> sh) & 0xFF))
                out |= c << sh
            return out
        if mode == 13:                      # ClampAddSubtractHalf
            out = 0
            for sh in (24, 16, 8, 0):
                a = (((L >> sh) & 0xFF) + ((T >> sh) & 0xFF)) >> 1
                d = a - ((TL >> sh) & 0xFF)
                # C truncating division by 2
                half = d // 2 if d >= 0 else -((-d) // 2)
                out |= _clamp(a + half) << sh
            return out
        raise ValueError(f"vp8l: reserved predictor mode {mode}")

    def _add_px(p, pred):
        return (((p & 0xFF00FF00) + (pred & 0xFF00FF00)) & 0xFF00FF00 |
                ((p & 0x00FF00FF) + (pred & 0x00FF00FF)) & 0x00FF00FF)

    def _inv_predictor(pix, w, h, bits, modes):
        ew = _subsample(w, bits)
        p = pix.tolist()
        m = modes.tolist()
        pos = 0
        for y in range(h):
            row_m = (y >> bits) * ew
            for x in range(w):
                if pos == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = p[pos - 1]
                elif x == 0:
                    pred = p[pos - w]
                else:
                    mode = (m[row_m + (x >> bits)] >> 8) & 0xFF
                    pred = _predict(mode, p[pos - 1], p[pos - w],
                                    p[pos - w - 1], p[pos - w + 1])
                p[pos] = _add_px(p[pos], pred)
                pos += 1
        return np.asarray(p, np.uint32)

    def _inv_color_indexing(pix, w, h, palette, xbits):
        if xbits == 0:
            idx = (pix >> 8) & 0xFF
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("vp8l: palette index out of range")
            return palette[idx], w
        bpp = 8 >> xbits                    # bits per packed pixel
        per = 1 << xbits                    # pixels per coded pixel
        packed_w = _subsample(w, xbits)
        g = ((pix >> 8) & 0xFF).reshape(h, packed_w).astype(np.uint32)
        shifts = (np.arange(per) * bpp).astype(np.uint32)
        idx = ((g[:, :, None] >> shifts[None, None, :])
               & ((1 << bpp) - 1)).reshape(h, packed_w * per)[:, :w]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("vp8l: palette index out of range")
        return palette[idx.reshape(-1)], w

    # --- full decode ---------------------------------------------------

    def sniff(b: bytes):
        if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
            return None
        return b[12:16]

    def decode(b: bytes):
        """RIFF → VP8L → {fmt, width, height, rows (r,g,b tuples,
        top-down), alpha_rows}. None for non-WebP bytes; ValueError
        for corrupt streams and for honest scope cuts (lossy VP8,
        extended VP8X)."""
        kind = sniff(b)
        if kind is None:
            return None
        if kind != b"VP8L":
            raise ValueError(
                f"vp8l: {kind.decode('latin1').strip()} member "
                "(lossy/extended WebP) is out of the lossless "
                "decoder's scope — lossy VP8 intra key frames "
                "decode via operators/vp8codec.py, extended VP8X/"
                "ANIM via parse_extended")
        size = int.from_bytes(b[16:20], "little")
        data = b[20:20 + size]
        if len(data) < size:
            raise ValueError("vp8l: truncated chunk")
        if data[0] != 0x2F:
            raise ValueError("vp8l: bad signature byte")
        br = _BR(data, 8)
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)                          # alpha-used hint
        if br.read(3) != 0:
            raise ValueError("vp8l: unsupported version")

        transforms = []                     # (type, payload) read order
        seen = set()
        xsize = w
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(t)
            if t == 0:                      # PREDICTOR
                bits = br.read(3) + 2
                sub = _decode_entropy_image(
                    br, _subsample(xsize, bits), _subsample(h, bits))
                transforms.append((t, (bits, sub)))
            elif t == 1:                    # COLOR
                bits = br.read(3) + 2
                sub = _decode_entropy_image(
                    br, _subsample(xsize, bits), _subsample(h, bits))
                transforms.append((t, (bits, sub)))
            elif t == 2:                    # SUBTRACT GREEN
                transforms.append((t, None))
            else:                           # COLOR INDEXING
                n_colors = br.read(8) + 1
                deltas = _decode_entropy_image(br, n_colors, 1)
                # palette entries are delta-coded per channel
                pal = np.zeros(n_colors, np.uint32)
                prev = 0
                for i, d in enumerate(deltas.tolist()):
                    prev = _add_px(d, prev)
                    pal[i] = prev
                xbits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                         else 1 if n_colors <= 16 else 0)
                transforms.append((t, (pal, xbits, xsize)))
                xsize = _subsample(xsize, xbits)

        pix = _decode_entropy_image_main(br, xsize, h)

        for t, payload in reversed(transforms):
            if t == 0:
                bits, sub = payload
                pix = _inv_predictor(pix, xsize, h, bits, sub)
            elif t == 1:
                bits, sub = payload
                pix = _inv_color_transform(pix, xsize, h, bits, sub)
            elif t == 2:
                pix = _inv_subtract_green(pix)
            else:
                pal, xbits, orig_w = payload
                pix, xsize = _inv_color_indexing(
                    pix.reshape(-1), orig_w, h, pal, xbits)
        if xsize != w:
            raise ValueError("vp8l: transform width mismatch")

        grid = pix.reshape(h, w)
        rr = ((grid >> 16) & 0xFF).astype(np.int64)
        gg = ((grid >> 8) & 0xFF).astype(np.int64)
        bb = (grid & 0xFF).astype(np.int64)
        aa = ((grid >> 24) & 0xFF).astype(np.int64)
        rows = [list(zip(rr[y].tolist(), gg[y].tolist(),
                         bb[y].tolist())) for y in range(h)]
        return {"fmt": "webp-lossless", "width": w, "height": h,
                "rows": rows, "alpha_rows": aa.tolist()}

    def _decode_pixels(br: _BR, w: int, h: int, cache_bits: int,
                       meta=None):
        green_alpha = _GREEN_BASE + (1 << cache_bits if cache_bits
                                     else 0)
        n_groups = meta[3] if meta else 1
        groups = []
        for _ in range(n_groups):
            groups.append((_read_prefix_code(br, green_alpha),
                           _read_prefix_code(br, 256),
                           _read_prefix_code(br, 256),
                           _read_prefix_code(br, 256),
                           _read_prefix_code(br, 40)))
        green, red, blue, alpha, dist = groups[0]
        if meta:
            midx, mbits, mew, _ = meta
            midx_l = midx.tolist()
        n = w * h
        pix = np.zeros(n, np.uint32)
        cache = [0] * (1 << cache_bits) if cache_bits else None
        pos = 0
        while pos < n:
            if meta:
                g = midx_l[((pos // w) >> mbits) * mew
                           + ((pos % w) >> mbits)]
                green, red, blue, alpha, dist = groups[g]
            s = _read_sym(br, green)
            if s < 256:
                r_ = _read_sym(br, red)
                b_ = _read_sym(br, blue)
                a_ = _read_sym(br, alpha)
                px = (a_ << 24) | (r_ << 16) | (s << 8) | b_
                pix[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
            elif s < _GREEN_BASE:
                length = _prefix_val(br, s - 256)
                dcode = _prefix_val(br, _read_sym(br, dist))
                d = _plane_to_dist(w, dcode)
                if d > pos or pos + length > n:
                    raise ValueError("vp8l: bad back-reference")
                if cache is None and length <= d:
                    pix[pos:pos + length] = pix[pos - d:pos - d + length]
                    pos += length
                else:
                    for _ in range(length):
                        px = int(pix[pos - d])
                        pix[pos] = px
                        pos += 1
                        if cache is not None:
                            cache[_cache_key(px, cache_bits)] = px
            else:
                if cache is None:
                    raise ValueError("vp8l: cache hit without cache")
                pix[pos] = cache[s - _GREEN_BASE]
                pos += 1
        return pix

    # --- encode ----------------------------------------------------------

    def _huffman_lengths(freqs, alphabet_size, max_len=15):
        """Frequency-driven code lengths (heapq Huffman); falls back
        to a two-level flat complete code if depth exceeds max_len."""
        used = [s for s in range(alphabet_size) if freqs.get(s)]
        lengths = [0] * alphabet_size
        if not used:
            return lengths, []
        if len(used) == 1:
            lengths[used[0]] = 1
            return lengths, used
        heap = [(freqs[s], s, (s,)) for s in used]
        heapq.heapify(heap)
        cnt = alphabet_size
        depth = {s: 0 for s in used}
        while len(heap) > 1:
            f1, _, g1 = heapq.heappop(heap)
            f2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                depth[s] += 1
            cnt += 1
            heapq.heappush(heap, (f1 + f2, cnt, g1 + g2))
        if max(depth.values()) > max_len:
            n = len(used)
            lo = max((n - 1).bit_length() - 1, 1) \
                if n > 2 else (n - 1)
            lo = max(lo, 1)
            n_lo = (1 << (lo + 1)) - n      # Kraft-complete split
            for i, s in enumerate(used):
                depth[s] = lo if i < n_lo else lo + 1
        for s, d in depth.items():
            lengths[s] = d
        return lengths, used

    def _write_code_lengths(bw: _BW, lengths):
        """NORMAL-code header: code-length code (flat complete code
        over the used cl symbols, 3-bit lengths) + the RLE'd lengths
        (literal, 16 = repeat-prev, 17/18 = zero runs)."""
        ops = []
        i = 0
        n = len(lengths)
        while i < n:
            ln = lengths[i]
            if ln == 0:
                j = i
                while j < n and lengths[j] == 0:
                    j += 1
                z = j - i
                i = j
                while z:
                    if z >= 11:
                        t = min(z, 138)
                        ops.append((18, t - 11, 7))
                        z -= t
                    elif z >= 3:
                        ops.append((17, z - 3, 3))
                        z = 0
                    else:
                        ops.append((0, None, 0))
                        z -= 1
            else:
                ops.append((ln, None, 0))
                j = i + 1
                while j < n and lengths[j] == ln:
                    j += 1
                r = j - i - 1
                if r >= 3:
                    i = j
                    while r >= 3:
                        t = min(r, 6)
                        ops.append((16, t - 3, 2))
                        r -= t
                    for _ in range(r):
                        ops.append((ln, None, 0))
                else:
                    i += 1
        cl_used = sorted({op[0] for op in ops})
        assert len(cl_used) >= 2, "fixture encoder: degenerate CL code"
        cl_lengths = [0] * 19
        m = len(cl_used)
        lo = max((m - 1).bit_length() - 1, 1) if m > 2 else 1
        n_lo = (1 << (lo + 1)) - m
        for k, s in enumerate(cl_used):
            cl_lengths[s] = lo if k < n_lo else lo + 1
        assert max(cl_lengths) <= 7
        # num_code_lengths covers the last used position in kOrder
        last = max(k for k, s in enumerate(_CL_ORDER) if cl_lengths[s])
        num_cl = max(4, last + 1)
        bw.write(num_cl - 4, 4)
        for k in range(num_cl):
            bw.write(cl_lengths[_CL_ORDER[k]], 3)
        bw.write(0, 1)                      # no explicit max_symbol
        cl_codes = _canonical_codes(cl_lengths)
        for sym, extra, ebits in ops:
            code, ln = cl_codes[sym]
            for k in range(ln - 1, -1, -1):
                bw.write((code >> k) & 1, 1)
            if ebits:
                bw.write(extra, ebits)

    def _write_prefix_code(bw: _BW, freqs, alphabet_size):
        """Writes the code header, returns {sym: (code, len)} (empty
        code for a lone symbol transmitted as SIMPLE)."""
        used = sorted(s for s in range(alphabet_size) if freqs.get(s))
        if not used:
            used = [0]
        if len(used) <= 2 and max(used) <= 255:
            bw.write(1, 1)                  # simple
            bw.write(len(used) - 1, 1)
            if used[0] > 1:
                bw.write(1, 1)
                bw.write(used[0], 8)
            else:
                bw.write(0, 1)
                bw.write(used[0], 1)
            if len(used) == 1:
                return {used[0]: (0, 0)}
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        bw.write(0, 1)                      # normal
        lengths, _ = _huffman_lengths(freqs, alphabet_size)
        _write_code_lengths(bw, lengths)
        return _canonical_codes(lengths)

    def _emit(bw: _BW, codes, sym: int):
        code, ln = codes[sym]
        for k in range(ln - 1, -1, -1):
            bw.write((code >> k) & 1, 1)

    def _tokenize(pix, w, cache_bits, use_backrefs):
        """Greedy horizontal-run LZ77 + color cache over ARGB ints →
        token list [('lit', px, pos) | ('ref', length, dist_code,
        pos) | ('cache', idx, pos)] — pos is the pixel position the
        symbol is read at (the meta-group lookup point)."""
        n = len(pix)
        cache = [None] * (1 << cache_bits) if cache_bits else None
        toks = []
        pos = 0
        while pos < n:
            if (use_backrefs and pos and pix[pos] == pix[pos - 1]
                    and (pos % w) != 0):
                run = 1
                while (pos + run < n and run < 4096
                       and pix[pos + run] == pix[pos]):
                    run += 1
                if run >= 3:
                    toks.append(("ref", run, 2, pos))  # (1,0) → code 2
                    if cache is not None:
                        for k in range(run):
                            px = pix[pos + k]
                            cache[_cache_key(px, cache_bits)] = px
                    pos += run
                    continue
            px = pix[pos]
            if cache is not None:
                key = _cache_key(px, cache_bits)
                if cache[key] == px:
                    toks.append(("cache", key, pos))
                    pos += 1
                    continue
                cache[key] = px
            toks.append(("lit", px, pos))
            pos += 1
        return toks

    def _write_entropy_image(bw: _BW, pix, w, cache_bits=0,
                             use_backrefs=False, main=False,
                             meta_bits=None, n_groups=1):
        """meta_bits/n_groups > 1 (main plane only) split the image
        into (1<<meta_bits)-pixel tiles assigned round-robin by tile
        index to n_groups prefix-code groups, transmitted via the
        meta entropy image."""
        h = len(pix) // w
        toks = _tokenize(pix, w, cache_bits, use_backrefs)
        if meta_bits is None:
            n_groups = 1
        else:
            # the decoder sizes the group list from the meta image's
            # MAX index — with fewer tiles than requested groups the
            # tail groups would be unreferenced and desync the stream
            n_tiles = (_subsample(w, meta_bits)
                       * _subsample(h, meta_bits))
            n_groups = max(1, min(n_groups, n_tiles))

        def group_of(pos):
            if meta_bits is None:
                return 0
            ew = _subsample(w, meta_bits)
            return (((pos // w) >> meta_bits) * ew
                    + ((pos % w) >> meta_bits)) % n_groups

        freqs = [(dict(), dict(), dict(), dict(), dict())
                 for _ in range(n_groups)]
        for t in toks:
            gf, rf, bf, af, df = freqs[group_of(t[-1])]
            if t[0] == "lit":
                px = t[1]
                gf[(px >> 8) & 0xFF] = gf.get((px >> 8) & 0xFF, 0) + 1
                rf[(px >> 16) & 0xFF] = rf.get((px >> 16) & 0xFF, 0) + 1
                bf[px & 0xFF] = bf.get(px & 0xFF, 0) + 1
                af[px >> 24] = af.get(px >> 24, 0) + 1
            elif t[0] == "ref":
                lc = 256 + _prefix_encode(t[1])[0]
                gf[lc] = gf.get(lc, 0) + 1
                dc = _prefix_encode(t[2])[0]
                df[dc] = df.get(dc, 0) + 1
            else:
                cc = _GREEN_BASE + t[1]
                gf[cc] = gf.get(cc, 0) + 1
        if cache_bits:
            bw.write(1, 1)
            bw.write(cache_bits, 4)
        else:
            bw.write(0, 1)
        if main:
            if meta_bits is None:
                bw.write(0, 1)              # no meta prefix codes
            else:
                bw.write(1, 1)
                bw.write(meta_bits - 2, 3)
                ew = _subsample(w, meta_bits)
                eh = _subsample(h, meta_bits)
                mimg = [0xFF000000
                        | (((t_ % n_groups) >> 8) << 16)
                        | (((t_ % n_groups) & 0xFF) << 8)
                        for t_ in range(ew * eh)]
                _write_entropy_image(bw, mimg, ew)
        green_alpha = _GREEN_BASE + (1 << cache_bits if cache_bits
                                     else 0)
        codes = []
        for g in range(n_groups):
            gf, rf, bf, af, df = freqs[g]
            codes.append((_write_prefix_code(bw, gf, green_alpha),
                          _write_prefix_code(bw, rf, 256),
                          _write_prefix_code(bw, bf, 256),
                          _write_prefix_code(bw, af, 256),
                          _write_prefix_code(bw, df, 40)))
        for t in toks:
            gc, rc, bc, ac, dc_ = codes[group_of(t[-1])]
            if t[0] == "lit":
                px = t[1]
                _emit(bw, gc, (px >> 8) & 0xFF)
                _emit(bw, rc, (px >> 16) & 0xFF)
                _emit(bw, bc, px & 0xFF)
                _emit(bw, ac, px >> 24)
            elif t[0] == "ref":
                code, eb, ev = _prefix_encode(t[1])
                _emit(bw, gc, 256 + code)
                if eb:
                    bw.write(ev, eb)
                code, eb, ev = _prefix_encode(t[2])
                _emit(bw, dc_, code)
                if eb:
                    bw.write(ev, eb)
            else:
                _emit(bw, gc, _GREEN_BASE + t[1])

    def _sub_px(a, b):
        """Per-channel (a - b) mod 256 of two ARGB ints."""
        out = 0
        for sh in (24, 16, 8, 0):
            out |= ((((a >> sh) & 0xFF) - ((b >> sh) & 0xFF)) & 0xFF) << sh
        return out

    def encode(pixels, w: int, h: int, transform: str = "none",
               predictor_mode: int = 2, predictor_bits: int = 4,
               color_elem=(0, 0, 0), cache_bits: int = 0,
               use_backrefs: bool = True, meta_bits=None,
               n_groups: int = 1) -> bytes:
        """Real VP8L file from a row-major ARGB int list. transform ∈
        none | subtract_green | predictor | green_predictor (both,
        spec inverse order) | color | palette (auto-bundled by
        palette size). meta_bits + n_groups > 1 emit META PREFIX
        CODES (tile-assigned code groups via the entropy image).
        Every stream round-trips through decode()."""
        pixels = [int(p) & 0xFFFFFFFF for p in pixels]
        assert len(pixels) == w * h
        bw = _BW()
        bw.write(0x2F, 8)
        bw.write(w - 1, 14)
        bw.write(h - 1, 14)
        bw.write(int(any(p >> 24 != 0xFF for p in pixels)), 1)
        bw.write(0, 3)                      # version
        cur = pixels
        xsize = w

        def fwd_subtract_green(px_list):
            out = []
            for p in px_list:
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) - g) & 0xFF
                b = ((p & 0xFF) - g) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            return out

        def fwd_predictor(px_list, bits, mode):
            out = []
            for y in range(h):
                for x in range(xsize):
                    pos = y * xsize + x
                    if pos == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = px_list[pos - 1]
                    elif x == 0:
                        pred = px_list[pos - xsize]
                    else:
                        pred = _predict(mode, px_list[pos - 1],
                                        px_list[pos - xsize],
                                        px_list[pos - xsize - 1],
                                        px_list[pos - xsize + 1])
                    out.append(_sub_px(px_list[pos], pred))
            return out

        def write_predictor(bits, mode):
            bw.write(1, 1)
            bw.write(0, 2)                  # PREDICTOR
            bw.write(bits - 2, 3)
            sub_n = _subsample(xsize, bits) * _subsample(h, bits)
            _write_entropy_image(
                bw, [0xFF000000 | (mode << 8)] * sub_n,
                _subsample(xsize, bits))

        if transform == "subtract_green":
            bw.write(1, 1)
            bw.write(2, 2)
            cur = fwd_subtract_green(cur)
        elif transform == "predictor":
            write_predictor(predictor_bits, predictor_mode)
            cur = fwd_predictor(cur, predictor_bits, predictor_mode)
        elif transform == "green_predictor":
            # decoder inverts in reverse read order: predictor⁻¹
            # first, then add-green — so forward = subtract green,
            # THEN predict; stream reads subtract-green first
            bw.write(1, 1)
            bw.write(2, 2)
            write_predictor(predictor_bits, predictor_mode)
            cur = fwd_predictor(fwd_subtract_green(cur),
                                predictor_bits, predictor_mode)
        elif transform == "color":
            g2r, g2b, r2b = color_elem
            bw.write(1, 1)
            bw.write(1, 2)                  # COLOR
            bits = 4
            bw.write(bits - 2, 3)
            elem = (0xFF000000 | ((r2b & 0xFF) << 16)
                    | ((g2b & 0xFF) << 8) | (g2r & 0xFF))
            sub_n = _subsample(xsize, bits) * _subsample(h, bits)
            _write_entropy_image(bw, [elem] * sub_n,
                                 _subsample(xsize, bits))
            out = []
            for p in cur:
                green = _s8((p >> 8) & 0xFF)
                red0 = (p >> 16) & 0xFF
                r = (red0 - ((_s8(g2r & 0xFF) * green) >> 5)) & 0xFF
                b = ((p & 0xFF) - ((_s8(g2b & 0xFF) * green) >> 5)
                     - ((_s8(r2b & 0xFF) * _s8(red0)) >> 5)) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            cur = out
        elif transform == "palette":
            pal = []
            pal_idx = {}
            for p in cur:
                if p not in pal_idx:
                    pal_idx[p] = len(pal)
                    pal.append(p)
            n_colors = len(pal)
            assert n_colors <= 256
            bw.write(1, 1)
            bw.write(3, 2)                  # COLOR INDEXING
            bw.write(n_colors - 1, 8)
            deltas = [pal[0]] + [_sub_px(pal[i], pal[i - 1])
                                 for i in range(1, n_colors)]
            _write_entropy_image(bw, deltas, n_colors)
            xbits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                     else 1 if n_colors <= 16 else 0)
            if xbits == 0:
                cur = [0xFF000000 | (pal_idx[p] << 8) for p in cur]
            else:
                bpp = 8 >> xbits
                per = 1 << xbits
                packed_w = _subsample(w, xbits)
                out = []
                for y in range(h):
                    for px_ in range(packed_w):
                        v = 0
                        for k in range(per):
                            x = px_ * per + k
                            if x < w:
                                v |= pal_idx[cur[y * w + x]] << (k * bpp)
                        out.append(0xFF000000 | (v << 8))
                cur = out
                xsize = packed_w
        elif transform != "none":
            raise ValueError(f"unknown transform {transform}")

        bw.write(0, 1)                      # no more transforms
        _write_entropy_image(bw, cur, xsize, cache_bits=cache_bits,
                             use_backrefs=use_backrefs, main=True,
                             meta_bits=meta_bits, n_groups=n_groups)
        payload = bw.bytes()
        size = len(payload)                 # RIFF sizes exclude pads
        if size & 1:
            payload += b"\x00"
        riff = (b"RIFF"
                + (4 + 8 + len(payload)).to_bytes(4, "little")
                + b"WEBP" + b"VP8L"
                + size.to_bytes(4, "little") + payload)
        return riff

    def parse_extended(b: bytes):
        """Extended-format (VP8X) WebP: RIFF chunk walk → feature
        flags + 24-bit canvas dims (VP8X), the chunk inventory, the
        embedded VP8L image decoded via decode() (re-framed as a
        standalone member), the EXIF chunk parsed as the TIFF stream
        it is (tiffcodec IFD walk — optional 'Exif\\0\\0' prefix
        stripped), the XMP chunk as text, the ICCP header fields
        (profile size / device class / color space / PCS per the
        public ICC.1 layout), and animation: ANIM (background BGRA +
        loop count) and every ANMF frame (offsets, dims, duration,
        blend/dispose flags) with its embedded VP8L image
        sample-decoded. Lossy VP8 frames are inventoried but not
        decoded (honest scope). None for non-WebP bytes."""
        if sniff(b) is None:
            return None
        out = {"canvas_w": None, "canvas_h": None, "flags": {},
               "chunks": [], "image": None, "exif": None, "xmp": None,
               "icc": None, "anim": None, "frames": []}
        pos = 12
        while pos + 8 <= len(b):
            fourcc = b[pos:pos + 8][:4]
            size = int.from_bytes(b[pos + 4:pos + 8], "little")
            payload = b[pos + 8:pos + 8 + size]
            if len(payload) < size:
                raise ValueError("vp8x: truncated chunk")
            out["chunks"].append(fourcc.decode("latin1").strip())
            if fourcc == b"VP8X":
                if size < 10:
                    raise ValueError("vp8x: short VP8X chunk")
                fl = payload[0]
                out["flags"] = {"icc": bool(fl & 0x20),
                                "alpha": bool(fl & 0x10),
                                "exif": bool(fl & 0x08),
                                "xmp": bool(fl & 0x04),
                                "anim": bool(fl & 0x02)}
                out["canvas_w"] = int.from_bytes(payload[4:7],
                                                 "little") + 1
                out["canvas_h"] = int.from_bytes(payload[7:10],
                                                 "little") + 1
            elif fourcc == b"VP8L":
                pad = b"\x00" if size & 1 else b""
                sub = (b"RIFF"
                       + (4 + 8 + size + len(pad)).to_bytes(4, "little")
                       + b"WEBP" + b"VP8L"
                       + size.to_bytes(4, "little") + payload + pad)
                out["image"] = decode(sub)
            elif fourcc == b"EXIF":
                from nowdb_spark.operators.tiffcodec import \
                    make_tiff_codec
                t = payload[6:] if payload[:6] == b"Exif\x00\x00" \
                    else payload
                out["exif"] = make_tiff_codec().tiff_meta(bytes(t))
            elif fourcc == b"XMP ":
                out["xmp"] = payload.decode("utf-8", "replace")
            elif fourcc == b"ICCP":
                if len(payload) >= 20:
                    out["icc"] = {
                        "profile_size": int.from_bytes(payload[0:4],
                                                       "big"),
                        "device_class": payload[12:16]
                        .decode("latin1"),
                        "color_space": payload[16:20]
                        .decode("latin1").strip(),
                        "n_bytes": len(payload)}
            elif fourcc == b"ANIM":
                if size < 6:
                    raise ValueError("vp8x: short ANIM chunk")
                out["anim"] = {
                    "bg_bgra": tuple(payload[0:4]),
                    "loop_count": int.from_bytes(payload[4:6],
                                                 "little")}
            elif fourcc == b"ANMF":
                if size < 16:
                    raise ValueError("vp8x: short ANMF chunk")
                fr = {"x": int.from_bytes(payload[0:3],
                                          "little") * 2,
                      "y": int.from_bytes(payload[3:6],
                                          "little") * 2,
                      "w": int.from_bytes(payload[6:9],
                                          "little") + 1,
                      "h": int.from_bytes(payload[9:12],
                                          "little") + 1,
                      "duration_ms": int.from_bytes(payload[12:15],
                                                    "little"),
                      "blend": not bool(payload[15] & 0x02),
                      "dispose_bg": bool(payload[15] & 0x01),
                      "image": None}
                fpos = 16
                while fpos + 8 <= len(payload):
                    fcc = payload[fpos:fpos + 4]
                    fsz = int.from_bytes(payload[fpos + 4:fpos + 8],
                                         "little")
                    fpl = payload[fpos + 8:fpos + 8 + fsz]
                    if fcc == b"VP8L":
                        pad = b"\x00" if fsz & 1 else b""
                        sub = (b"RIFF" + (4 + 8 + fsz + len(pad))
                               .to_bytes(4, "little")
                               + b"WEBP" + b"VP8L"
                               + fsz.to_bytes(4, "little") + fpl
                               + pad)
                        fr["image"] = decode(sub)
                    fpos += 8 + fsz + (fsz & 1)
                out["frames"].append(fr)
            pos += 8 + size + (size & 1)
        return out

    def synth_icc(device_class: str = "mntr",
                  color_space: str = "RGB ", n_tail: int = 16) -> bytes:
        """Minimal ICC.1 profile bytes for fixtures: 128-byte header
        (big-endian size, device class at 12, color space at 16,
        PCS 'XYZ ' at 20, 'acsp' magic at 36) + zero tag table +
        n_tail filler — enough structure for the parse_extended ICCP
        header walk."""
        size = 128 + 4 + n_tail
        hdr = bytearray(128)
        hdr[0:4] = size.to_bytes(4, "big")
        hdr[4:8] = b"ndbs"                      # CMM signature
        hdr[8:12] = bytes([4, 0x30, 0, 0])      # version 4.3
        hdr[12:16] = device_class.encode("latin1")[:4].ljust(4)
        hdr[16:20] = color_space.encode("latin1")[:4].ljust(4)
        hdr[20:24] = b"XYZ "
        hdr[36:40] = b"acsp"
        return bytes(hdr) + (0).to_bytes(4, "big") + b"\x00" * n_tail

    def encode_extended(pixels, w: int, h: int, exif_pages=None,
                        xmp=None, icc=None, anim_frames=None,
                        anim_bg=(0, 0, 0, 0), anim_loops=0,
                        **encode_kw) -> bytes:
        """Real extended-format WebP: VP8X header (flags + canvas) +
        either the still VP8L image chunk or an animation (ANIM
        background/loop chunk + one ANMF per frame, each embedding
        its own VP8L) + optional ICCP profile bytes, EXIF (a real
        TIFF stream via tiffcodec, 'Exif\\0\\0'-prefixed) and 'XMP '
        chunks, in the container spec's chunk order (ICCP, ANIM,
        frames/image, EXIF, XMP). anim_frames: [{x, y, w, h, pixels,
        duration_ms, blend, dispose_bg}] with even x/y (stored /2
        per the spec)."""

        def chunk(cc: bytes, payload: bytes) -> bytes:
            return (cc + len(payload).to_bytes(4, "little") + payload
                    + (b"\x00" if len(payload) & 1 else b""))

        def vp8l_of(px, fw, fh):
            return encode(px, fw, fh, **encode_kw)[12:]

        flags = 0
        has_alpha = any((int(p) >> 24) != 0xFF for p in pixels) \
            if pixels else any(
                (int(p) >> 24) != 0xFF
                for fr in (anim_frames or []) for p in fr["pixels"])
        if has_alpha:
            flags |= 0x10
        if icc is not None:
            flags |= 0x20
        if exif_pages:
            flags |= 0x08
        if xmp is not None:
            flags |= 0x04
        if anim_frames:
            flags |= 0x02
        vp8x = (bytes([flags, 0, 0, 0])
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        body = chunk(b"VP8X", vp8x)
        if icc is not None:
            body += chunk(b"ICCP", icc)
        if anim_frames:
            body += chunk(b"ANIM", bytes(anim_bg)
                          + int(anim_loops).to_bytes(2, "little"))
            for fr in anim_frames:
                if fr.get("x", 0) % 2 or fr.get("y", 0) % 2:
                    raise ValueError("ANMF offsets must be even")
                hdr = ((fr.get("x", 0) // 2).to_bytes(3, "little")
                       + (fr.get("y", 0) // 2).to_bytes(3, "little")
                       + (fr["w"] - 1).to_bytes(3, "little")
                       + (fr["h"] - 1).to_bytes(3, "little")
                       + int(fr.get("duration_ms", 100))
                       .to_bytes(3, "little")
                       + bytes([(0 if fr.get("blend", True)
                                 else 0x02)
                                | (0x01 if fr.get("dispose_bg",
                                                  False) else 0)]))
                body += chunk(b"ANMF", hdr + vp8l_of(
                    fr["pixels"], fr["w"], fr["h"]))
        else:
            body += vp8l_of(pixels, w, h)
        if exif_pages:
            from nowdb_spark.operators.tiffcodec import make_tiff_codec
            body += chunk(b"EXIF", b"Exif\x00\x00"
                          + make_tiff_codec().encode_tiff(exif_pages))
        if xmp is not None:
            body += chunk(b"XMP ", xmp.encode("utf-8"))
        return (b"RIFF" + (4 + len(body)).to_bytes(4, "little")
                + b"WEBP" + body)

    def features(b: bytes):
        """Deterministic integer features over the DECODED pixels
        (oracle-replayable): dims, the position/channel-weighted
        px_check of the image rows (same formula as the BMP/PNG/GIF
        rows) and the alpha-plane sum."""
        img = decode(b)
        if img is None:
            return None
        w, h = img["width"], img["height"]
        chk = 0
        for y, row in enumerate(img["rows"]):
            base = y * w + 1
            for x, (r, g, bl) in enumerate(row):
                chk += (base + x) * (r + 2 * g + 3 * bl)
        a_sum = sum(sum(r) for r in img["alpha_rows"])
        return {"fmt": img["fmt"], "width": w, "height": h,
                "n_px": w * h, "px_check": chk, "a_sum": a_sum}

    return SimpleNamespace(decode=decode, encode=encode,
                           parse_extended=parse_extended,
                           encode_extended=encode_extended,
                           synth_icc=synth_icc,
                           features=features, sniff=sniff)


# driver-side convenience instance (kernels build their own)
WEBP_CODEC = make_webp_codec()
