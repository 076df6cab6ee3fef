"""Pure-Python Y4M (YUV4MPEG2) video codec — the real decode path for
the video third of the multimodal operators.

Scope mirrors imagecodec.py / audiocodec.py: what needs no entropy
decoder is decoded for real — the YUV4MPEG2 stream header, per-FRAME
markers (with optional frame parameters), and planar YUV payloads in
C420 (all jpeg/mpeg2/paldv siting variants), C422, C444 and Cmono
colorspaces. Entropy-coded video (H.264/VP9/AV1) stays honestly
stubbed in multimodal.py.

Built by ``make_video_codec()`` as nested closures so cloudpickle
ships the code by value to executors (same self-containment rule as
the other codecs).

Reference parity note: the reference engine has no media handling;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family), not reference parity.
"""

from __future__ import annotations

from types import SimpleNamespace

MAGIC = b"YUV4MPEG2"


def make_video_codec() -> SimpleNamespace:
    """Returns a namespace with:
      sniff(b)                -> 'y4m' | None
      decode_meta(b)          -> {fmt, width, height, fps_num, fps_den,
                                  colorspace, n_frames} | None
      decode(b)               -> meta + {'frames': [(y, u, v) bytes
                                  triples; u/v b'' for mono]} | None
      encode_y4m(frames, w, h, fps=(25,1), colorspace='C420jpeg')
                              -> bytes
      frame_sample(b, every_n, offset=0) -> re-encoded y4m holding
                                  frames offset, offset+every_n, ...
      features(b, every_n=1)  -> exact-integer features over the
                                  sampled frames | None
    """

    # plane-size divisors per colorspace: (x_div, y_div) for chroma
    _CHROMA = {
        "C420": (2, 2), "C420jpeg": (2, 2), "C420mpeg2": (2, 2),
        "C420paldv": (2, 2), "C422": (2, 1), "C444": (1, 1),
        "Cmono": None,
    }

    def sniff(b: bytes):
        return "y4m" if b[:len(MAGIC)] == MAGIC else None

    def _parse_header(b: bytes):
        """Stream header → (params dict, offset past '\\n')."""
        end = b.find(b"\n")
        if end < 0:
            return None
        parts = b[:end].split(b" ")
        if parts[0] != MAGIC:
            return None
        w = h = None
        fps_num, fps_den = 25, 1
        cs = "C420jpeg"                     # spec default
        for p in parts[1:]:
            if not p:
                continue
            tag, val = chr(p[0]), p[1:]
            if tag == "W":
                w = int(val)
            elif tag == "H":
                h = int(val)
            elif tag == "F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif tag == "C":
                cs = "C" + val.decode("ascii")
        if not w or not h or cs not in _CHROMA:
            return None
        return ({"width": w, "height": h, "fps_num": fps_num,
                 "fps_den": fps_den, "colorspace": cs}, end + 1)

    def _plane_sizes(meta):
        w, h = meta["width"], meta["height"]
        div = _CHROMA[meta["colorspace"]]
        if div is None:
            return w * h, 0
        return w * h, (w // div[0]) * (h // div[1])

    def decode(b: bytes):
        hd = _parse_header(b)
        if hd is None:
            return None
        meta, off = hd
        ysz, csz = _plane_sizes(meta)
        frames = []
        n = len(b)
        while off < n:
            end = b.find(b"\n", off)
            if end < 0 or b[off:off + 5] != b"FRAME":
                return None                 # truncated / corrupt
            off = end + 1                   # frame params ignored
            if off + ysz + 2 * csz > n:
                return None
            y = b[off:off + ysz]
            u = b[off + ysz:off + ysz + csz]
            v = b[off + ysz + csz:off + ysz + 2 * csz]
            frames.append((y, u, v))
            off += ysz + 2 * csz
        meta = dict(meta, fmt="y4m", n_frames=len(frames))
        return dict(meta, frames=frames)

    def decode_meta(b: bytes):
        d = decode(b)
        if d is None:
            return None
        d.pop("frames")
        return d

    def encode_y4m(frames, w: int, h: int, fps=(25, 1),
                   colorspace: str = "C420jpeg") -> bytes:
        div = _CHROMA[colorspace]
        ysz = w * h
        csz = 0 if div is None else (w // div[0]) * (h // div[1])
        out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n"
               % (w, h, fps[0], fps[1], colorspace.encode("ascii"))]
        for fr in frames:
            y, u, v = (fr if isinstance(fr, tuple) else (fr, b"", b""))
            y, u, v = bytes(y), bytes(u), bytes(v)
            if len(y) != ysz or len(u) != csz or len(v) != csz:
                raise ValueError("plane size mismatch")
            out.append(b"FRAME\n")
            out.extend((y, u, v))
        return b"".join(out)

    def frame_sample(b: bytes, every_n: int, offset: int = 0):
        """Temporal subsample: keep frames offset, offset+every_n, ...
        Re-encodes a valid y4m stream (fps scaled down by every_n so
        wall-clock duration is preserved)."""
        d = decode(b)
        if d is None:
            return None
        kept = d["frames"][offset::every_n]
        return encode_y4m(kept, d["width"], d["height"],
                          (d["fps_num"], d["fps_den"] * every_n),
                          d["colorspace"])

    def features(b: bytes, every_n: int = 1):
        """Exact integer features over frames 0, every_n, 2·every_n…:
        luma_sum/luma_max over Y planes, chroma_sum over U+V, plus
        container facts. duration_ms is floor over the FULL stream."""
        d = decode(b)
        if d is None:
            return None
        sampled = d["frames"][::every_n]
        luma_sum = sum(sum(y) for y, _, _ in sampled)
        luma_max = max((max(y) if y else 0 for y, _, _ in sampled),
                       default=0)
        chroma_sum = sum(sum(u) + sum(v) for _, u, v in sampled)
        return {
            "width": d["width"], "height": d["height"],
            "n_frames": d["n_frames"], "n_sampled": len(sampled),
            "fps_num": d["fps_num"], "fps_den": d["fps_den"],
            "duration_ms": (d["n_frames"] * 1000 * d["fps_den"])
                           // d["fps_num"],
            "luma_sum": luma_sum, "luma_max": luma_max,
            "chroma_sum": chroma_sum,
        }

    return SimpleNamespace(sniff=sniff, decode=decode,
                           decode_meta=decode_meta, encode_y4m=encode_y4m,
                           frame_sample=frame_sample, features=features)


CODEC = make_video_codec()
