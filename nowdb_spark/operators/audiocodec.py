"""Pure-Python WAV (RIFF PCM) audio codec — the real decode path for
the audio half of the multimodal operators.

Scope mirrors imagecodec.py: what the stdlib can express is decoded
for real — RIFF container walk, 'fmt ' parse, PCM 8-bit (unsigned)
and 16-bit (signed LE) samples, mono or interleaved stereo. Entropy-
coded audio (MP3/AAC/FLAC) stays honestly stubbed in multimodal.py.

Built by `make_audio_codec()` as nested closures so cloudpickle ships
the code by value to executors (same self-containment rule as the
image codec).

Reference parity note: the reference engine has no media handling;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family), not reference parity.
"""

from __future__ import annotations

from types import SimpleNamespace


def make_audio_codec() -> SimpleNamespace:
    """Returns a namespace with:
      sniff(b)                  -> 'wav' | None
      decode_meta(b)            -> {fmt, channels, sample_rate,
                                    bits, n_samples, n_bytes} | None
      decode(b)                 -> meta + {'samples': list[int] per
                                    channel-interleaved frame} | None
      encode_wav(samples, rate, -> bytes (PCM, mono=list[int],
                 bits, channels)   stereo=interleaved)
      features(b)               -> {n_samples, sample_rate,
                                    duration_ms, peak, sq_sum} | None
    """
    import struct

    def sniff(b: bytes):
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return "wav"
        return None

    def _chunks(b: bytes):
        """Yield (fourcc, data) for each RIFF sub-chunk (word-aligned,
        truncated final chunk dropped)."""
        i = 12
        while i + 8 <= len(b):
            cc = b[i:i + 4]
            (ln,) = struct.unpack_from("<I", b, i + 4)
            data = b[i + 8:i + 8 + ln]
            if len(data) < ln:
                return
            yield cc, data
            i += 8 + ln + (ln & 1)          # chunks are 2-byte aligned

    def _fmt(b: bytes):
        for cc, data in _chunks(b):
            if cc == b"fmt " and len(data) >= 16:
                (audio_fmt, channels, rate, _brate, _align,
                 bits) = struct.unpack_from("<HHIIHH", data, 0)
                if audio_fmt != 1:          # PCM only
                    return None
                if bits not in (8, 16) or channels not in (1, 2):
                    return None
                return channels, rate, bits
        return None

    def _data(b: bytes):
        for cc, data in _chunks(b):
            if cc == b"data":
                return data
        return None

    def decode_meta(b: bytes):
        if sniff(b) != "wav":
            return None
        f = _fmt(b)
        d = _data(b)
        if f is None or d is None:
            return None
        channels, rate, bits = f
        frame = channels * bits // 8
        return {"fmt": "wav", "channels": channels, "sample_rate": rate,
                "bits": bits, "n_samples": len(d) // frame,
                "n_bytes": len(b)}

    def decode(b: bytes):
        meta = decode_meta(b)
        if meta is None:
            return None
        d = _data(b)
        if meta["bits"] == 16:
            n = len(d) // 2
            samples = list(struct.unpack("<%dh" % n, d[:2 * n]))
        else:
            samples = [x - 128 for x in d]   # 8-bit PCM is unsigned
        meta["samples"] = samples            # channel-interleaved
        return meta

    def encode_wav(samples, rate: int = 8000, bits: int = 16,
                   channels: int = 1) -> bytes:
        if bits == 16:
            payload = struct.pack("<%dh" % len(samples), *samples)
        else:
            payload = bytes((s + 128) & 0xFF for s in samples)
        frame = channels * bits // 8
        fmt = struct.pack("<HHIIHH", 1, channels, rate,
                          rate * frame, frame, bits)
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def features(b: bytes):
        """Deterministic integer features (oracle-replayable): sample
        count, rate, floor-ms duration, |peak|, sum of squares."""
        a = decode(b)
        if a is None:
            return None
        s = a["samples"]
        return {
            "n_samples": a["n_samples"],
            "sample_rate": a["sample_rate"],
            "duration_ms": a["n_samples"] * 1000 // a["sample_rate"],
            "peak": max((abs(x) for x in s), default=0),
            "sq_sum": sum(x * x for x in s),
        }

    return SimpleNamespace(sniff=sniff, decode_meta=decode_meta,
                           decode=decode, encode_wav=encode_wav,
                           features=features)


# driver-side convenience instance (kernels build their own)
AUDIO_CODEC = make_audio_codec()
