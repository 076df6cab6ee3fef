"""Lossy VP8 (RFC 6386) — intra-only key-frame decode.

Reference parity: the reference engine (``/root/reference/src``) has
no media handling at all; this module is part of the multimodal
ingestion extension family (SURVEY §2 extensions), completing the
still-WebP family next to VP8L (webpcodec), VP8X/ANIM (mm34) and the
T.81 QM arithmetic coder (jpegcodec) whose renormalizing
interval-subdivision design the VP8 boolean coder shares.

What is STRUCTURAL here — implemented exactly per the public RFC
6386 layout and verifiable by construction:

* the boolean arithmetic decoder (§7: split = 1 + ((range−1)·p >> 8),
  8-bit probabilities, [128, 255] range renormalization) and its
  encoder twin (carry-free big-int low accumulator);
* tree-structured entropy coding (§8) for intra modes and DCT
  tokens, with the key-frame luma tree (B/DC/V/H/TM) and chroma tree;
* the key-frame uncompressed header (3-byte frame tag with the
  19-bit first-partition size, 0x9D012A start code, 14-bit
  dimensions), the first-partition feature flags, quant indices and
  per-band coefficient-probability update flags, and the separate
  DCT token partition;
* the DCT coefficient token set (EOB/0/1/2/3/4/cat1..cat6 with
  extra-bit suffixes), the coefficient-band mapping, the
  zero-context rule (a ZERO token forbids EOB for the next
  coefficient) and the left+above first-coefficient context;
* the VP8 zigzag, the exact integer 4×4 inverse DCT (constants
  20091/35468, (x+4)>>3 rounding), the 4×4 inverse Walsh-Hadamard
  for the Y2 DC plane ((x+3)>>3), Y2-to-luma DC distribution,
  whole-MB intra prediction (DC/V/H/TM with the 127/129 edge
  constants) and clamped reconstruction.

What is DATA — spec tables this module does not bundle and instead
exposes verbatim-install hooks for (the mm31 ``set_window``
precedent): the default coefficient probabilities (4×8×3×11), their
update probabilities, the dc/ac dequantization lookup tables, and
the token-category extra-bit probabilities. The bundled values are
deterministic documented placeholders, so encoder and decoder stay
in exact sync with each other (the fixture-oracle contract) but a
third-party stream needs ``set_coeff_probs`` / ``set_quant_tables``
/ ``set_cat_probs`` with the RFC's Section 13/14 tables first.
Provenance is inherently OUT OF BAND: a conformant stream that
writes zero probability updates means "use the RFC defaults", while
this module's twin means "use the placeholders" — no header bit can
distinguish them (the version field cannot serve as a fixture
marker; every version value is a legal RFC profile). So
``decode_frame`` refuses every payload unless the caller either
declares module-minted provenance (``fixture=True``) or has
installed ALL real table families and passes ``allow_foreign=True``
— it raises, never silently misdecodes.

Honest gates: inter frames, B_PRED 4×4 sub-block modes, segmentation
maps, loop-filter application (reconstruction here is pre-filter)
and multiple token partitions raise NotImplementedError.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np

# intra prediction modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

# key-frame luma mode tree (RFC 6386 §8.2 / 11.2): leaves negative
KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED,
                 -TM_PRED]
KF_YMODE_PROB = [145, 156, 163, 128]
UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROB = [142, 114, 183]

# DCT token set
(ZERO_T, ONE_T, TWO_T, THREE_T, FOUR_T, CAT1, CAT2, CAT3, CAT4,
 CAT5, CAT6, EOB_T) = range(12)
COEFF_TREE = [-EOB_T, 2,
              -ZERO_T, 4,
              -ONE_T, 6,
              8, 12,
              -TWO_T, 10,
              -THREE_T, -FOUR_T,
              14, 16,
              -CAT1, -CAT2,
              18, 20,
              -CAT3, -CAT4,
              -CAT5, -CAT6]
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35,
            CAT6: 67}
CAT_BITS = {CAT1: 1, CAT2: 2, CAT3: 3, CAT4: 4, CAT5: 5, CAT6: 11}
# extra-bit probabilities per category — DATA (placeholder: flat 128,
# i.e. raw bits; install the RFC table via set_cat_probs for foreign
# streams)
_DEFAULT_CAT_PROBS = {t: [128] * CAT_BITS[t] for t in CAT_BASE}

COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# plane types for probability indexing (RFC 6386 §13.3)
PLANE_Y_AFTER_Y2, PLANE_Y2, PLANE_UV, PLANE_Y_NO_Y2 = 0, 1, 2, 3

_VERSION_FIXTURE = 3  # version tag this module's encoder stamps —
# informational only; decode() never gates on it (any version value
# is a legal RFC 6386 profile, so it cannot mark fixtures)


def _default_coeff_probs():
    """Deterministic placeholder coefficient probabilities — NOT the
    RFC Section 13 defaults (those are data; install them verbatim
    via set_coeff_probs). Values cycle 64..191 so every tree branch
    stays exercised and cheap to code."""
    return [[[[64 + (p * 31 + b * 17 + c * 7 + t * 3) % 128
               for t in range(11)]
              for c in range(3)]
             for b in range(8)]
            for p in range(4)]


def _default_update_probs():
    """Placeholder per-flag update probabilities (RFC table is data):
    255 everywhere = each no-update flag costs ~0.006 bits."""
    return [[[[255] * 11 for _ in range(3)] for _ in range(8)]
            for _ in range(4)]


def make_vp8_codec() -> SimpleNamespace:
    coeff_probs = _default_coeff_probs()
    update_probs = _default_update_probs()
    cat_probs = {t: list(v) for t, v in _DEFAULT_CAT_PROBS.items()}
    # dequant lookup — DATA (RFC §14.1 dc_qlookup/ac_qlookup are
    # 128-entry tables); placeholder: monotone qi+4, the right shape
    # and range class, documented non-RFC
    quant = {"dc": [i + 4 for i in range(128)],
             "ac": [i + 4 for i in range(128)],
             "real": False}
    # which table families hold REAL spec data (vs placeholders) —
    # all three are required before a non-fixture decode
    real = {"coeff": False, "quant": False, "cat": False}

    # flat (p, band, ctx, token) traversal of update_probs, built on
    # demand — the update-flag sections walk all 1056 entries in this
    # exact order on both the encode and decode side
    _upd_flat: list = []

    def _flat_update_probs():
        if not _upd_flat:
            _upd_flat.append([update_probs[p][band][c][t]
                              for p in range(4) for band in range(8)
                              for c in range(3) for t in range(11)])
        return _upd_flat[0]

    def set_coeff_probs(probs, updates=None) -> None:
        coeff_probs[:] = [[[list(t) for t in c] for c in b]
                          for b in probs]
        if updates is not None:
            update_probs[:] = [[[list(t) for t in c] for c in b]
                               for b in updates]
            _upd_flat.clear()
        real["coeff"] = True

    _cats_installed: set = set()

    def set_cat_probs(probs: dict) -> None:
        for t, v in probs.items():
            if len(v) != CAT_BITS[t]:
                raise ValueError(f"cat{t} needs {CAT_BITS[t]} probs")
            cat_probs[t] = list(v)
        _cats_installed.update(probs)
        real["cat"] = _cats_installed >= set(CAT_BASE)

    def set_quant_tables(dc, ac) -> None:
        if len(dc) != 128 or len(ac) != 128:
            raise ValueError("dequant tables are 128 entries each")
        quant["dc"], quant["ac"] = list(dc), list(ac)
        quant["real"] = True
        real["quant"] = True

    # ---------------- boolean coder (RFC 6386 §7) ----------------
    class BoolEnc:
        """Carry-free encoder: ``low`` is an arbitrary-precision
        lower interval bound that doubles on each renormalization,
        so carries propagate inside the big int instead of through
        finished bytes."""
        __slots__ = ("low", "range", "shifts")

        def __init__(self):
            self.low = 0
            self.range = 255
            self.shifts = 0

        def put(self, bit: int, prob: int) -> None:
            split = 1 + (((self.range - 1) * prob) >> 8)
            if bit:
                self.low += split
                self.range -= split
            else:
                self.range = split
            rng = self.range
            if rng < 128:
                # batched renorm (r14): shift count = the old
                # while-loop's iteration count, same emitted bits
                sh = 8 - rng.bit_length()
                self.range = rng << sh
                self.low <<= sh
                self.shifts += sh

        def put_zeros(self, probs) -> None:
            """put(0, prob) for each prob, state in locals — the
            1056 per-frame coefficient-update flags were ~25% of
            encode time as individual put() calls (r14)."""
            low, rng, shifts = self.low, self.range, self.shifts
            for prob in probs:
                rng = 1 + (((rng - 1) * prob) >> 8)
                if rng < 128:
                    sh = 8 - rng.bit_length()
                    rng <<= sh
                    low <<= sh
                    shifts += sh
            self.low, self.range, self.shifts = low, rng, shifts

        def put_literal(self, val: int, n: int) -> None:
            for k in range(n - 1, -1, -1):
                self.put((val >> k) & 1, 128)

        def put_tree(self, tree, probs, leaf: int,
                     start: int = 0) -> None:
            # emit branch bits from `start` toward `leaf` (start=2
            # skips the EOB branch after a ZERO token, mirroring the
            # decoder's tree-start rule)
            path = _tree_path(tree, leaf, start)
            node = start
            for bit in path:
                self.put(bit, probs[node >> 1])
                node = tree[node + bit]
                if node <= 0:
                    break

        def bytes(self) -> bytes:
            # the decoder initializes with 16 bits and pulls one per
            # renorm: emit `low` in (shifts + 8) bits, then 16 zero
            # bits so every read is defined; low < 256·2^shifts
            total = self.shifts + 8 + 16
            v = self.low << 16
            nbytes = (total + 7) // 8
            return int(v << (nbytes * 8 - total)).to_bytes(
                nbytes, "big")

    class BoolDec:
        __slots__ = ("buf", "padlen", "value", "range", "bitpos")

        def __init__(self, buf: bytes):
            # Batched renormalization (r14, guide §4.2): the per-BIT
            # _bit() feed was ~40% of decode time; each get() now
            # refills its 1-7 renorm bits with ONE two-byte window
            # extraction. The shift count equals the old while-loop's
            # iteration count, so bit consumption — and the decoded
            # stream — are identical; reads past the end still feed
            # zeros (the pad, re-extended if a starved stream keeps
            # reading).
            self.buf = buf + b"\x00" * 64
            self.padlen = len(self.buf)
            self.value = int.from_bytes(
                (buf + b"\x00\x00")[:2], "big")
            self.range = 255
            self.bitpos = 16        # feed position past the preload

        def get(self, prob: int) -> int:
            split = 1 + (((self.range - 1) * prob) >> 8)
            big = split << 8
            if self.value >= big:
                bit = 1
                self.range -= split
                self.value -= big
            else:
                bit = 0
                self.range = split
            rng = self.range
            if rng < 128:
                sh = 8 - rng.bit_length()
                self.range = rng << sh
                p = self.bitpos
                byte_i = p >> 3
                if byte_i + 2 > self.padlen:
                    self.buf += b"\x00" * 64
                    self.padlen += 64
                window = (self.buf[byte_i] << 8) | self.buf[byte_i + 1]
                fed = (window >> (16 - (p & 7) - sh)) & ((1 << sh) - 1)
                self.value = ((self.value << sh) | fed) & 0xFFFF
                self.bitpos = p + sh
            return bit

        def get_literal(self, n: int) -> int:
            # inlined bool reads (locals instead of attribute access
            # per bit) — same arithmetic as get(128) n times
            value, rng, p = self.value, self.range, self.bitpos
            buf, padlen = self.buf, self.padlen
            v = 0
            for _ in range(n):
                split = 1 + ((rng - 1) >> 1)   # prob = 128
                big = split << 8
                if value >= big:
                    bit = 1
                    rng -= split
                    value -= big
                else:
                    bit = 0
                    rng = split
                if rng < 128:
                    sh = 8 - rng.bit_length()
                    rng <<= sh
                    byte_i = p >> 3
                    if byte_i + 2 > padlen:
                        buf = self.buf = buf + b"\x00" * 64
                        padlen = self.padlen = padlen + 64
                    window = (buf[byte_i] << 8) | buf[byte_i + 1]
                    value = ((value << sh)
                             | ((window >> (16 - (p & 7) - sh))
                                & ((1 << sh) - 1))) & 0xFFFF
                    p += sh
                v = (v << 1) | bit
            self.value, self.range, self.bitpos = value, rng, p
            return v

        def first_set(self, probs) -> bool:
            """get(prob) per entry until the first 1 bit (True) or
            all read as 0 (False), state in locals — the 1056
            per-frame coefficient-update flags were ~40% of decode
            time as individual get() calls (r14). Bit consumption
            matches the one-by-one gets exactly."""
            value, rng, p = self.value, self.range, self.bitpos
            buf, padlen = self.buf, self.padlen
            hit = False
            for prob in probs:
                split = 1 + (((rng - 1) * prob) >> 8)
                big = split << 8
                if value >= big:
                    hit = True
                    rng -= split
                    value -= big
                else:
                    rng = split
                if rng < 128:
                    sh = 8 - rng.bit_length()
                    rng <<= sh
                    byte_i = p >> 3
                    if byte_i + 2 > padlen:
                        buf = self.buf = buf + b"\x00" * 64
                        padlen = self.padlen = padlen + 64
                    window = (buf[byte_i] << 8) | buf[byte_i + 1]
                    value = ((value << sh)
                             | ((window >> (16 - (p & 7) - sh))
                                & ((1 << sh) - 1))) & 0xFFFF
                    p += sh
                if hit:
                    break
            self.value, self.range, self.bitpos = value, rng, p
            return hit

        def get_tree(self, tree, probs, start: int = 0) -> int:
            # inlined per-branch bool reads (r14): the tree walk is
            # where most get() calls happen; hoisting decoder state
            # into locals removes the per-bit attribute traffic while
            # keeping the arithmetic identical
            value, rng, p = self.value, self.range, self.bitpos
            buf, padlen = self.buf, self.padlen
            node = start
            while True:
                prob = probs[node >> 1]
                split = 1 + (((rng - 1) * prob) >> 8)
                big = split << 8
                if value >= big:
                    bit = 1
                    rng -= split
                    value -= big
                else:
                    bit = 0
                    rng = split
                if rng < 128:
                    sh = 8 - rng.bit_length()
                    rng <<= sh
                    byte_i = p >> 3
                    if byte_i + 2 > padlen:
                        buf = self.buf = buf + b"\x00" * 64
                        padlen = self.padlen = padlen + 64
                    window = (buf[byte_i] << 8) | buf[byte_i + 1]
                    value = ((value << sh)
                             | ((window >> (16 - (p & 7) - sh))
                                & ((1 << sh) - 1))) & 0xFFFF
                    p += sh
                node = tree[node + bit]
                if node <= 0:
                    self.value, self.range, self.bitpos = value, rng, p
                    return -node

    _tree_path_memo: dict = {}

    def _tree_path(tree, leaf: int, start: int = 0):
        """DFS for the branch-bit path from `start` to leaf -leaf.
        Memoized per (tree identity, leaf, start) — the encoder calls
        this once per SYMBOL and the trees are fixed tuples, so the
        DFS was ~25% of encode time for a constant answer (r14)."""
        key = (id(tree), leaf, start)
        got = _tree_path_memo.get(key)
        if got is not None:
            return got
        out = []

        def walk(node, path):
            for bit in (0, 1):
                nxt = tree[node + bit]
                if nxt <= 0 and nxt == -leaf:
                    out.append(path + [bit])
                elif nxt > 0:
                    walk(nxt, path + [bit])

        walk(start, [])
        if not out:
            raise ValueError(f"leaf {leaf} not in tree from {start}")
        # hold the tree so id() stays unique for the memo's lifetime
        _tree_path_memo[key] = out[0]
        _tree_path_memo.setdefault(("tree_ref", id(tree)), tree)
        return out[0]

    # ---------------- transforms ----------------
    def idct4x4(coeffs):
        """Exact VP8 integer inverse DCT (RFC 6386 §14.3): constants
        cospi8sqrt2minus1 = 20091, sinpi8sqrt2 = 35468, arithmetic
        (x·c) >> 16 (floor), final (x+4) >> 3."""
        ip = [int(v) for v in coeffs]
        tmp = [0] * 16
        for i in range(4):                    # columns
            a1 = ip[i] + ip[i + 8]
            b1 = ip[i] - ip[i + 8]
            t1 = (ip[i + 4] * 35468) >> 16
            t2 = ip[i + 12] + ((ip[i + 12] * 20091) >> 16)
            c1 = t1 - t2
            t1 = ip[i + 4] + ((ip[i + 4] * 20091) >> 16)
            t2 = (ip[i + 12] * 35468) >> 16
            d1 = t1 + t2
            tmp[i] = a1 + d1
            tmp[i + 12] = a1 - d1
            tmp[i + 4] = b1 + c1
            tmp[i + 8] = b1 - c1
        out = [0] * 16
        for i in range(4):                    # rows
            r = 4 * i
            a1 = tmp[r] + tmp[r + 2]
            b1 = tmp[r] - tmp[r + 2]
            t1 = (tmp[r + 1] * 35468) >> 16
            t2 = tmp[r + 3] + ((tmp[r + 3] * 20091) >> 16)
            c1 = t1 - t2
            t1 = tmp[r + 1] + ((tmp[r + 1] * 20091) >> 16)
            t2 = (tmp[r + 3] * 35468) >> 16
            d1 = t1 + t2
            out[r] = (a1 + d1 + 4) >> 3
            out[r + 3] = (a1 - d1 + 4) >> 3
            out[r + 1] = (b1 + c1 + 4) >> 3
            out[r + 2] = (b1 - c1 + 4) >> 3
        return out

    def iwalsh4x4(coeffs):
        """Inverse 4×4 Walsh-Hadamard for the Y2 DC plane
        (RFC 6386 §14.3), final (x+3) >> 3."""
        ip = [int(v) for v in coeffs]
        tmp = [0] * 16
        for i in range(4):
            a1 = ip[i] + ip[i + 12]
            b1 = ip[i + 4] + ip[i + 8]
            c1 = ip[i + 4] - ip[i + 8]
            d1 = ip[i] - ip[i + 12]
            tmp[i] = a1 + b1
            tmp[i + 4] = c1 + d1
            tmp[i + 8] = a1 - b1
            tmp[i + 12] = d1 - c1
        out = [0] * 16
        for i in range(4):
            r = 4 * i
            a1 = tmp[r] + tmp[r + 3]
            b1 = tmp[r + 1] + tmp[r + 2]
            c1 = tmp[r + 1] - tmp[r + 2]
            d1 = tmp[r] - tmp[r + 3]
            out[r] = (a1 + b1 + 3) >> 3
            out[r + 1] = (c1 + d1 + 3) >> 3
            out[r + 2] = (a1 - b1 + 3) >> 3
            out[r + 3] = (d1 - c1 + 3) >> 3
        return out

    # ---------------- token (de)coding ----------------
    def _write_coeffs(enc: BoolEnc, coeffs, plane: int,
                      first: int, ctx: int) -> int:
        """Encode one 4×4 block's quantized coefficients (natural
        order; zigzag applied here). Returns 1 if any nonzero."""
        zz = [int(coeffs[ZIGZAG[j]]) for j in range(16)]
        last = max((j for j in range(first, 16) if zz[j]),
                   default=first - 1)
        nonzero = last >= first
        j = first
        prev_zero = False
        while j <= last:
            v = zz[j]
            band = COEFF_BANDS[j]
            probs = coeff_probs[plane][band][ctx]
            av = abs(v)
            if av == 0:
                tok = ZERO_T
            elif av <= 4:
                tok = (ONE_T, TWO_T, THREE_T, FOUR_T)[av - 1]
            else:
                tok = None
                for t in (CAT1, CAT2, CAT3, CAT4, CAT5, CAT6):
                    if av < CAT_BASE[t] + (1 << CAT_BITS[t]):
                        tok = t
                        break
                if tok is None:
                    raise ValueError(f"coefficient {av} exceeds cat6")
            enc.put_tree(COEFF_TREE, probs, tok,
                         start=2 if prev_zero else 0)
            if tok in CAT_BASE:
                extra = av - CAT_BASE[tok]
                for k in range(CAT_BITS[tok] - 1, -1, -1):
                    enc.put((extra >> k) & 1,
                            cat_probs[tok][CAT_BITS[tok] - 1 - k])
            if tok != ZERO_T:
                enc.put(1 if v < 0 else 0, 128)   # sign
                ctx = 2 if abs(v) > 1 else 1
                prev_zero = False
            else:
                ctx = 0
                prev_zero = True
            j += 1
        if j < 16:
            # EOB (never after a ZERO token by construction: trailing
            # zeros are simply not coded)
            band = COEFF_BANDS[j]
            probs = coeff_probs[plane][band][ctx]
            enc.put_tree(COEFF_TREE, probs, EOB_T)
        return 1 if nonzero else 0

    def _read_coeffs(dec: BoolDec, plane: int, first: int,
                     ctx: int):
        """Decode one block → (natural-order coeff list, nonzero)."""
        zz = [0] * 16
        j = first
        prev_zero = False
        nonzero = 0
        while j < 16:
            band = COEFF_BANDS[j]
            probs = coeff_probs[plane][band][ctx]
            start = 2 if prev_zero else 0
            tok = dec.get_tree(COEFF_TREE, probs, start)
            if tok == EOB_T:
                break
            if tok == ZERO_T:
                ctx = 0
                prev_zero = True
                j += 1
                continue
            if tok in CAT_BASE:
                extra = 0
                for k in range(CAT_BITS[tok]):
                    extra = (extra << 1) | dec.get(
                        cat_probs[tok][k])
                av = CAT_BASE[tok] + extra
            else:
                av = {ONE_T: 1, TWO_T: 2, THREE_T: 3,
                      FOUR_T: 4}[tok]
            if dec.get(128):
                av = -av
            zz[j] = av
            nonzero = 1
            ctx = 2 if abs(av) > 1 else 1
            prev_zero = False
            j += 1
        out = [0] * 16
        for j in range(16):
            out[ZIGZAG[j]] = zz[j]
        return out, nonzero

    # ---------------- prediction (single-MB edge semantics) ------
    def _predict16(mode: int):
        """Whole-MB luma prediction with no reconstructed neighbors:
        above = 127, left = 129, top-left = 127 (RFC 6386 §12.2 edge
        conventions); DC with neither neighbor = 128."""
        if mode == DC_PRED:
            return np.full((16, 16), 128, dtype=np.int64)
        if mode == V_PRED:
            return np.full((16, 16), 127, dtype=np.int64)
        if mode == H_PRED:
            return np.full((16, 16), 129, dtype=np.int64)
        if mode == TM_PRED:
            # clamp(L + A - AL) = clamp(129 + 127 - 127) = 129
            return np.full((16, 16), 129, dtype=np.int64)
        raise NotImplementedError(
            "B_PRED 4x4 sub-block modes not implemented — whole-MB "
            "modes only (DC/V/H/TM)")

    def _predict8(mode: int):
        if mode != DC_PRED:
            raise NotImplementedError(
                "chroma prediction modes other than DC not "
                "implemented in the fixture path")
        return np.full((8, 8), 128, dtype=np.int64)

    # ---------------- frame encode ----------------
    def encode_frame(ymode: int, y2_coeffs, y_coeffs, uv_coeffs,
                     q_index: int = 10) -> bytes:
        """Encode ONE 16×16 key frame (a single macroblock) from the
        QUANTIZED coefficient domain: ``y2_coeffs`` is the 16-entry
        Y2 (DC) block, ``y_coeffs`` 16 luma blocks × 16 coefficients
        (position 0 of each is ignored — it comes from Y2),
        ``uv_coeffs`` 8 chroma blocks × 16. The bitstream layout is
        the real RFC 6386 key-frame layout; see the module docstring
        for the structure/data split."""
        if ymode == B_PRED:
            raise NotImplementedError("B_PRED encode not supported")
        # --- first partition (header + modes) ---
        e1 = BoolEnc()
        e1.put_literal(0, 1)        # color space: YCbCr
        e1.put_literal(0, 1)        # clamping: required
        e1.put(0, 128)              # segmentation_enabled
        e1.put_literal(0, 1)        # filter_type
        e1.put_literal(0, 6)        # filter_level
        e1.put_literal(0, 3)        # sharpness
        e1.put(0, 128)              # loop-filter adjustments
        e1.put_literal(0, 2)        # log2(token partitions) = 1 part
        e1.put_literal(q_index, 7)  # y_ac_qi
        for _ in range(5):          # y/y2/uv dc+ac deltas absent
            e1.put(0, 128)
        e1.put(0, 128)              # refresh_entropy_probs
        e1.put_zeros(_flat_update_probs())   # coeff prob updates: none
        e1.put(1, 128)              # mb_no_coeff_skip enabled
        e1.put_literal(1, 8)        # prob_skip_false (fixture: 1)
        # one macroblock: skip flag, luma mode, chroma mode
        e1.put(0, 1)                # mb_skip_coeff (prob 1 ≈ never)
        e1.put_tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
        e1.put_tree(UV_MODE_TREE, KF_UV_MODE_PROB, DC_PRED)
        part1 = e1.bytes()

        # --- token partition ---
        e2 = BoolEnc()
        nz = {}
        # Y2
        y2ctx = 0                   # no neighbor MBs
        nz["y2"] = _write_coeffs(e2, y2_coeffs, PLANE_Y2, 0, y2ctx)
        # 16 Y blocks (first coeff from Y2 → start at 1)
        ynz = [[0] * 5 for _ in range(5)]     # 1-based [row][col]
        for i in range(16):
            r, c = divmod(i, 4)
            # ctx = left nz + above nz (out-of-MB neighbors = 0)
            ctx = ynz[r + 1][c] + ynz[r][c + 1]
            nzi = _write_coeffs(e2, y_coeffs[i], PLANE_Y_AFTER_Y2,
                                1, ctx)
            ynz[r + 1][c + 1] = nzi
        # 4 U + 4 V
        for half in range(2):
            cnz = [[0] * 3 for _ in range(3)]
            for i in range(4):
                r, c = divmod(i, 2)
                ctx = cnz[r + 1][c] + cnz[r][c + 1]
                nzi = _write_coeffs(
                    e2, uv_coeffs[half * 4 + i], PLANE_UV, 0, ctx)
                cnz[r + 1][c + 1] = nzi
        part2 = e2.bytes()

        # --- uncompressed header ---
        tag = (0                     # key frame
               | (_VERSION_FIXTURE << 1)
               | (1 << 4)            # show_frame
               | (len(part1) << 5))
        head = bytes([tag & 0xFF, (tag >> 8) & 0xFF,
                      (tag >> 16) & 0xFF])
        head += bytes([0x9D, 0x01, 0x2A])
        head += (16).to_bytes(2, "little")    # width 16, scale 0
        head += (16).to_bytes(2, "little")    # height 16
        return head + part1 + part2

    # ---------------- frame decode ----------------
    def decode_frame(b: bytes, allow_foreign: bool = False,
                     fixture: bool = False):
        """Decode ONE intra key frame → dict with the parsed header,
        per-plane quantized+dequantized coefficients, and the
        reconstructed Y (16×16) / U / V (8×8) planes (pre-loop-
        filter).

        Provenance gate: with the placeholder tables a decode is only
        meaningful for payloads minted by this module's own encoder
        twin, and no header bit can prove that (a conformant stream
        with zero probability updates means "RFC defaults", the twin
        means "placeholders"; the version field is a legal profile
        number, not a fixture marker). The caller must therefore
        either declare module-minted provenance with ``fixture=True``
        or install ALL real table families (set_coeff_probs,
        set_quant_tables, set_cat_probs) and pass
        ``allow_foreign=True`` — anything else raises, because a
        placeholder-table decode of a real stream would be a silent
        wrong answer."""
        if not fixture:
            missing = sorted(k for k, v in real.items() if not v)
            if missing or not allow_foreign:
                raise NotImplementedError(
                    "VP8 stream of undeclared provenance: pass "
                    "fixture=True for payloads produced by this "
                    "module's encoder twin, or install the real RFC "
                    "6386 tables (set_coeff_probs §13, "
                    "set_quant_tables §14.1, set_cat_probs §13.2 "
                    "Pcat) and pass allow_foreign=True"
                    + (f" — not yet installed: {', '.join(missing)}"
                       if missing else ""))
        if len(b) < 10:
            raise ValueError("short VP8 payload")
        tag = b[0] | (b[1] << 8) | (b[2] << 16)
        if tag & 1:
            raise NotImplementedError(
                "VP8 inter frames not implemented — key frames only")
        part1_size = tag >> 5
        if b[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 start code")
        w = int.from_bytes(b[6:8], "little") & 0x3FFF
        h = int.from_bytes(b[8:10], "little") & 0x3FFF
        if (w, h) != (16, 16):
            raise NotImplementedError(
                "multi-macroblock frames not implemented — the "
                "sequential cross-MB prediction loop is the "
                "extension point (single 16x16 MB here)")
        d1 = BoolDec(b[10:10 + part1_size])
        d1.get_literal(1)           # color space
        d1.get_literal(1)           # clamping
        if d1.get(128):
            raise NotImplementedError("segmentation not implemented")
        d1.get_literal(1)           # filter type
        d1.get_literal(6)           # filter level
        d1.get_literal(3)           # sharpness
        if d1.get(128):
            raise NotImplementedError(
                "loop-filter adjustments not implemented")
        if d1.get_literal(2):
            raise NotImplementedError(
                "multiple token partitions not implemented")
        q_index = d1.get_literal(7)
        for _ in range(5):
            if d1.get(128):
                raise NotImplementedError(
                    "quantizer deltas not implemented")
        d1.get(128)                 # refresh_entropy_probs
        if d1.first_set(_flat_update_probs()):
            raise NotImplementedError(
                "coefficient probability updates not implemented")
        if not d1.get(128):
            raise NotImplementedError(
                "mb_no_coeff_skip=0 not implemented")
        prob_skip = d1.get_literal(8)
        skip = d1.get(prob_skip)
        ymode = d1.get_tree(KF_YMODE_TREE, KF_YMODE_PROB)
        if ymode == B_PRED:
            raise NotImplementedError(
                "B_PRED sub-block modes not implemented")
        uvmode = d1.get_tree(UV_MODE_TREE, KF_UV_MODE_PROB)

        d2 = BoolDec(b[10 + part1_size:])
        y2q, _ = _read_coeffs(d2, PLANE_Y2, 0, 0)
        yq = []
        ynz = [[0] * 5 for _ in range(5)]
        for i in range(16):
            r, c = divmod(i, 4)
            ctx = ynz[r + 1][c] + ynz[r][c + 1]
            blk, nzi = _read_coeffs(d2, PLANE_Y_AFTER_Y2, 1, ctx)
            ynz[r + 1][c + 1] = nzi
            yq.append(blk)
        uvq = []
        for half in range(2):
            cnz = [[0] * 3 for _ in range(3)]
            for i in range(4):
                r, c = divmod(i, 2)
                ctx = cnz[r + 1][c] + cnz[r][c + 1]
                blk, nzi = _read_coeffs(d2, PLANE_UV, 0, ctx)
                cnz[r + 1][c + 1] = nzi
                uvq.append(blk)

        # dequantize (RFC 6386 §14.1 multiplier structure; the
        # lookup itself is the documented data hook)
        ydc = quant["dc"][q_index]
        yac = quant["ac"][q_index]
        y2dc = ydc * 2
        y2ac = max(8, (yac * 155) // 100)
        uvdc = min(132, ydc)
        uvac = yac

        def dq(blk, dc, ac):
            return [blk[0] * dc] + [v * ac for v in blk[1:]]

        y2d = iwalsh4x4(dq(y2q, y2dc, y2ac))
        yplane = np.zeros((16, 16), dtype=np.int64)
        pred = _predict16(ymode)
        for i in range(16):
            r, c = divmod(i, 4)
            blk = dq(yq[i], ydc, yac)
            blk[0] = y2d[i]                    # DC from Y2
            res = np.array(idct4x4(blk)).reshape(4, 4)
            yplane[4 * r:4 * r + 4, 4 * c:4 * c + 4] = res
        yrec = np.clip(pred + yplane, 0, 255)
        uvrec = []
        for half in range(2):
            plane = np.zeros((8, 8), dtype=np.int64)
            for i in range(4):
                r, c = divmod(i, 2)
                res = np.array(idct4x4(
                    dq(uvq[half * 4 + i], uvdc, uvac))).reshape(4, 4)
                plane[4 * r:4 * r + 4, 4 * c:4 * c + 4] = res
            uvrec.append(np.clip(_predict8(uvmode) + plane, 0, 255))

        return {"width": w, "height": h, "q_index": q_index,
                "ymode": ymode, "uvmode": uvmode, "skip": skip,
                "y2_coeffs": y2q, "y_coeffs": yq, "uv_coeffs": uvq,
                "y": yrec, "u": uvrec[0], "v": uvrec[1],
                "dequant": {"ydc": ydc, "yac": yac, "y2dc": y2dc,
                            "y2ac": y2ac, "uvdc": uvdc,
                            "uvac": uvac}}

    def sniff(b: bytes):
        return ("vp8" if len(b) >= 6 and not (b[0] & 1)
                and b[3:6] == b"\x9d\x01\x2a" else None)

    return SimpleNamespace(
        BoolEnc=BoolEnc, BoolDec=BoolDec,
        encode_frame=encode_frame, decode_frame=decode_frame,
        idct4x4=idct4x4, iwalsh4x4=iwalsh4x4, sniff=sniff,
        set_coeff_probs=set_coeff_probs, set_cat_probs=set_cat_probs,
        set_quant_tables=set_quant_tables,
        ZIGZAG=ZIGZAG, COEFF_BANDS=COEFF_BANDS,
        COEFF_TREE=COEFF_TREE, KF_YMODE_TREE=KF_YMODE_TREE)
