"""Pure-Python WAV (RIFF PCM) + MP3/AAC/FLAC metadata audio codecs —
the real decode paths for the audio half of the multimodal operators.

Scope mirrors imagecodec.py: what the stdlib can express is decoded
for real — RIFF container walk, 'fmt ' parse, PCM 8-bit (unsigned)
and 16-bit (signed LE) samples, mono or interleaved stereo; the
MP3 FRAME-HEADER layer (ISO/IEC 11172-3): ID3v2 tag skip, sync walk,
per-frame version/layer/bitrate/samplerate/channel-mode parse, VBR-
aware duration and average bitrate; the AAC ADTS header walk
(ISO/IEC 13818-7 §6.2: profile/rate-index/channel-config/frame-length
/raw-data-blocks, 1024 samples per block); and FLAC's STREAMINFO
metadata block (flac format spec: 20-bit rate, 3-bit channels-1,
5-bit bits-1, 36-bit total samples). SAMPLE decode now exists for
FLAC (rice/LPC — flaccodec.py), IMA ADPCM / G.711 (here), and
MPEG-1 Layer II (mp2codec.py: allocation/scfsi/scalefactor/grouped
requant + the 32-band polyphase synthesis); the remaining gate is
the MDCT family (MP3 Layer III, AAC spectral, Opus SILK/CELT),
honestly stubbed in multimodal.py.

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
                (audio_fmt, channels, rate, _brate, align,
                 bits) = struct.unpack_from("<HHIIHH", data, 0)
                # 1 = PCM, 6 = A-law, 7 = µ-law (G.711),
                # 0x11 = IMA/DVI ADPCM (mono)
                if audio_fmt not in (1, 6, 7, 0x11):
                    return None
                if audio_fmt == 1 and bits not in (8, 16):
                    return None
                if audio_fmt in (6, 7) and bits != 8:
                    return None
                if audio_fmt == 0x11 and (bits != 4 or channels != 1
                                          or align < 5):
                    return None
                if channels not in (1, 2):
                    return None
                return channels, rate, bits, audio_fmt, align
        return None

    def _data(b: bytes):
        for cc, data in _chunks(b):
            if cc == b"data":
                return data
        return None

    _WAV_FMT_NAMES = {1: "wav", 6: "wav-alaw", 7: "wav-ulaw",
                      0x11: "wav-adpcm"}

    # IMA/DVI ADPCM tables (IMA ADPCM reference algorithm / RFC 3551
    # §4.5.1 DVI4): 89-entry step-size table + 3-bit index adjust
    IMA_STEPS = (
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
        130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
        408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166,
        1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024,
        3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845,
        8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
        20350, 22385, 24623, 27086, 29794, 32767)
    IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)

    def ima_step(pred: int, idx: int, nib: int):
        """One IMA ADPCM decode step: (predictor, index) × 4-bit
        nibble → next (predictor, index). Pure table arithmetic."""
        st = IMA_STEPS[idx]
        diff = st >> 3
        if nib & 1:
            diff += st >> 2
        if nib & 2:
            diff += st >> 1
        if nib & 4:
            diff += st
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IMA_INDEX[nib & 7]))
        return pred, idx

    def ulaw_to_linear(b: int) -> int:
        """G.711 µ-law expansion (the classic CCITT reference
        arithmetic): closed-form per byte, no state."""
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        return (0x84 - t) if u & 0x80 else (t - 0x84)

    def alaw_to_linear(b: int) -> int:
        """G.711 A-law expansion (even-bit inversion + segmented
        linear): closed-form per byte, no state."""
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a >> 4) & 0x07
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if a & 0x80 else -t

    def decode_meta(b: bytes):
        if sniff(b) != "wav":
            return None
        f = _fmt(b)
        d = _data(b)
        if f is None or d is None:
            return None
        channels, rate, bits, audio_fmt, align = f
        if audio_fmt == 0x11:
            # mono IMA blocks: 4-byte header (sample 0) + 2 samples
            # per payload byte; a short tail block contributes its
            # actual payload
            n_samples = 0
            for off in range(0, len(d), align):
                blk = min(align, len(d) - off)
                if blk >= 5:
                    n_samples += 1 + (blk - 4) * 2
        else:
            frame = channels * bits // 8
            n_samples = len(d) // frame
        return {"fmt": _WAV_FMT_NAMES[audio_fmt],
                "channels": channels, "sample_rate": rate,
                "bits": bits, "n_samples": n_samples,
                "n_bytes": len(b)}

    def _decode_adpcm(d: bytes, align: int) -> list:
        out = []
        for off in range(0, len(d), align):
            blk = d[off:off + align]
            if len(blk) < 5:
                break
            pred = struct.unpack_from("<h", blk, 0)[0]
            idx = min(blk[2], 88)
            out.append(pred)
            for byte in blk[4:]:
                for nib in (byte & 0x0F, byte >> 4):  # LOW nibble first
                    pred, idx = ima_step(pred, idx, nib)
                    out.append(pred)
        return out

    def decode(b: bytes):
        meta = decode_meta(b)
        if meta is None:
            return None
        d = _data(b)
        if meta["fmt"] == "wav-adpcm":
            samples = _decode_adpcm(d, _fmt(b)[4])
        elif meta["fmt"] == "wav-ulaw":
            samples = [ulaw_to_linear(x) for x in d]
        elif meta["fmt"] == "wav-alaw":
            samples = [alaw_to_linear(x) for x in d]
        elif meta["bits"] == 16:
            n = len(d) // 2
            samples = list(struct.unpack("<%dh" % n, d[:2 * n]))
        else:
            samples = [x - 128 for x in d]   # 8-bit PCM is unsigned
        meta["samples"] = samples            # channel-interleaved
        return meta

    def encode_wav(samples, rate: int = 8000, bits: int = 16,
                   channels: int = 1, audio_fmt: int = 1) -> bytes:
        """PCM (audio_fmt 1: mono=list[int], stereo interleaved) or
        G.711 (audio_fmt 6/7: ``samples`` are the raw companded
        BYTES, bits must be 8)."""
        if audio_fmt in (6, 7):
            payload = bytes(samples)
            bits = 8
        elif bits == 16:
            payload = struct.pack("<%dh" % len(samples), *samples)
        else:
            payload = bytes((s + 128) & 0xFF for s in samples)
        frame = channels * bits // 8
        fmt = struct.pack("<HHIIHH", audio_fmt, channels, rate,
                          rate * frame, frame, bits)
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def encode_wav_adpcm(nibbles, predictor: int, index: int,
                         rate: int = 8000) -> bytes:
        """Fixture builder: one mono IMA ADPCM block — 4-byte header
        (initial predictor int16 + step index) + the given 4-bit
        nibble stream (LOW nibble first, so len must be even). The
        nibbles are synthetic; the decode walk over them is the real
        stateful IMA algorithm."""
        assert len(nibbles) % 2 == 0, "pad to an even nibble count"
        payload = bytes((nibbles[i] & 0x0F)
                        | ((nibbles[i + 1] & 0x0F) << 4)
                        for i in range(0, len(nibbles), 2))
        align = 4 + len(payload)
        # fmt ext: cbSize=2 + wSamplesPerBlock per the IMA WAV spec
        fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate,
                          rate * align // (1 + len(nibbles)) or 1,
                          align, 4, 2, 1 + len(nibbles))
        block = (struct.pack("<h", predictor)
                 + bytes([min(index, 88), 0]) + payload)
        body = (b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(block)) + block
                + (b"\x00" if len(block) & 1 else b""))
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def features(b: bytes):
        """Deterministic integer features (oracle-replayable): sample
        count, rate, floor-ms duration, |peak|, sum of squares.
        Covers RIFF WAV (PCM/ADPCM/G.711) and AIFF payloads."""
        a = decode(b)
        if a is None:
            ai = aiff_decode(b)
            if ai is None:
                return None
            a = {"fmt": "aiff", "samples": ai["samples"],
                 "n_samples": len(ai["samples"]),
                 "sample_rate": ai["sample_rate"]}
        s = a["samples"]
        return {
            "fmt": a["fmt"],
            "n_samples": a["n_samples"],
            "sample_rate": a["sample_rate"],
            "duration_ms": a["n_samples"] * 1000 // a["sample_rate"],
            "peak": max((abs(x) for x in s), default=0),
            "sq_sum": sum(x * x for x in s),
        }

    # --- MP3 frame-header layer (ISO/IEC 11172-3 / 13818-3) ---------
    # Layer III tables: bitrate kbps by (version group, index) and
    # sample rate by (version, index). Index 0 = "free", 15 = invalid.
    MP3_BITRATES = {
        "1": (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
              224, 256, 320),
        "2": (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
              144, 160),
    }
    MP3_RATES = {"1": (44100, 48000, 32000),
                 "2": (22050, 24000, 16000),
                 "2.5": (11025, 12000, 8000)}
    # MPEG-1 Layer II bitrate ladder (kbps, index 1..14)
    MP2_BITRATES = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                    224, 256, 320, 384)
    MP3_VERSIONS = {0b00: "2.5", 0b10: "2", 0b11: "1"}

    def _mp3_header(b: bytes, i: int):
        """Parse one Layer III frame header at offset i; returns
        (frame_len, kbps, rate, channels, version) or None."""
        if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
            return None
        ver = MP3_VERSIONS.get((b[i + 1] >> 3) & 0b11)
        layer = (b[i + 1] >> 1) & 0b11
        if ver is None or layer != 0b01:        # Layer III only
            return None
        br_idx = (b[i + 2] >> 4) & 0xF
        sr_idx = (b[i + 2] >> 2) & 0b11
        pad = (b[i + 2] >> 1) & 1
        mode = (b[i + 3] >> 6) & 0b11
        if br_idx in (0, 15) or sr_idx == 3:    # free/bad not handled
            return None
        kbps = MP3_BITRATES["1" if ver == "1" else "2"][br_idx]
        rate = MP3_RATES[ver][sr_idx]
        factor = 144 if ver == "1" else 72      # L3 slots per frame
        flen = factor * kbps * 1000 // rate + pad
        channels = 1 if mode == 0b11 else 2
        return flen, kbps, rate, channels, ver

    def mp3_sniff(b: bytes):
        if len(b) >= 3 and b[:3] == b"ID3":
            return "mp3"
        return "mp3" if _mp3_header(b, 0) else None

    def mp3_meta(b: bytes):
        """Walk every frame header: returns {fmt, version, channels,
        sample_rate, n_frames, duration_ms, bitrate_kbps (average of
        per-frame nominal rates — VBR-aware), n_bytes} or None.
        Stops at the first non-frame byte (trailing tags)."""
        i = 0
        if len(b) >= 10 and b[:3] == b"ID3":
            size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
                | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)   # syncsafe
            i = 10 + size
        n_frames, kbps_sum = 0, 0
        rate = channels = ver = None
        while True:
            h = _mp3_header(b, i)
            if h is None or i + h[0] > len(b):
                break
            flen, kbps, rate, channels, ver = h
            n_frames += 1
            kbps_sum += kbps
            i += flen
        if n_frames == 0:
            return None
        spf = 1152 if ver == "1" else 576       # samples per L3 frame
        return {"fmt": "mp3", "version": ver, "channels": channels,
                "sample_rate": rate, "n_frames": n_frames,
                "duration_ms": n_frames * spf * 1000 // rate,
                "bitrate_kbps": kbps_sum // n_frames,
                "n_bytes": len(b)}

    def id3_tags(b: bytes):
        """ID3v2.3/2.4 TEXT frames from the leading tag: [(frame id,
        text), …] or None if no ID3v2 header. v2.4 frame sizes are
        syncsafe, v2.3 plain 32-bit (both handled via the header's
        major version); text encodings 0 (latin-1), 1 (UTF-16 w/BOM)
        and 3 (UTF-8) decoded; non-text frames skipped."""
        if len(b) < 10 or b[:3] != b"ID3":
            return None
        major = b[3]
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        end = min(10 + size, len(b))
        i, out = 10, []
        while i + 10 <= end:
            fid = b[i:i + 4]
            if fid == b"\x00\x00\x00\x00":
                break                        # padding
            if major >= 4:                   # syncsafe frame size
                flen = ((b[i + 4] & 0x7F) << 21) \
                    | ((b[i + 5] & 0x7F) << 14) \
                    | ((b[i + 6] & 0x7F) << 7) | (b[i + 7] & 0x7F)
            else:
                flen = int.from_bytes(b[i + 4:i + 8], "big")
            body = b[i + 10:i + 10 + flen]
            i += 10 + flen
            if len(body) != flen or not fid.startswith(b"T"):
                continue
            enc, text = body[:1], body[1:]
            try:
                if enc == b"\x00":
                    s = text.decode("latin1")
                elif enc == b"\x01":
                    s = text.decode("utf-16")
                elif enc == b"\x03":
                    s = text.decode("utf-8")
                else:
                    continue
            except UnicodeDecodeError:
                continue
            out.append((fid.decode("latin1"),
                        s.rstrip("\x00")))
        return out

    def encode_id3(tags, major: int = 4) -> bytes:
        """Fixture builder: ID3v2.{3,4} tag block with text frames —
        [(frame id, text), …], UTF-8 encoding byte, syncsafe sizes
        for v2.4 / plain for v2.3."""
        body = bytearray()
        for fid, text in tags:
            payload = b"\x03" + text.encode("utf-8")
            n = len(payload)
            if major >= 4:
                sz = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                            (n >> 7) & 0x7F, n & 0x7F])
            else:
                sz = n.to_bytes(4, "big")
            body += fid.encode("latin1") + sz + b"\x00\x00" + payload
        n = len(body)
        return (b"ID3" + bytes([major, 0, 0,
                                (n >> 21) & 0x7F, (n >> 14) & 0x7F,
                                (n >> 7) & 0x7F, n & 0x7F])
                + bytes(body))

    def encode_mp3_frames(frames, version: str = "1",
                          sr_idx: int = 0, channels: int = 2,
                          id3_pad: int = 0) -> bytes:
        """Fixture builder: a valid MP3 frame-header stream (headers
        real, audio payload zero slots — the metadata layer is what
        this codec decodes). ``frames`` = [(bitrate_idx, pad_bit),
        ...]; optional zero-filled ID3v2 tag of ``id3_pad`` bytes."""
        vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
        out = bytearray()
        if id3_pad:
            out += b"ID3\x04\x00\x00" + bytes(
                [(id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F,
                 (id3_pad >> 7) & 0x7F, id3_pad & 0x7F])
            out += bytes(id3_pad)
        grp = "1" if version == "1" else "2"
        for br_idx, pad in frames:
            kbps = MP3_BITRATES[grp][br_idx]
            rate = MP3_RATES[version][sr_idx]
            factor = 144 if version == "1" else 72
            flen = factor * kbps * 1000 // rate + pad
            mode = 0b11 if channels == 1 else 0b00
            hdr = bytes([
                0xFF,
                0xE0 | (vbits << 3) | (0b01 << 1) | 1,  # L3, no CRC
                (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                mode << 6])
            out += hdr + bytes(flen - 4)
        return bytes(out)

    # --- AAC ADTS frame-header layer (ISO/IEC 13818-7 §6.2 /
    # 14496-3 §1.A.3: adts_fixed_header + adts_variable_header) ------
    AAC_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000,
                 22050, 16000, 12000, 11025, 8000, 7350)

    def _adts_header(b: bytes, i: int):
        """Parse one ADTS header at offset i; returns (frame_len,
        profile, rate, channels, raw_data_blocks) or None."""
        if i + 7 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xF0) != 0xF0:
            return None
        if (b[i + 1] >> 1) & 0b11:              # layer must be 00
            return None
        prot_absent = b[i + 1] & 1
        profile = b[i + 2] >> 6
        sr_idx = (b[i + 2] >> 2) & 0xF
        if sr_idx >= len(AAC_RATES):
            return None
        channels = ((b[i + 2] & 1) << 2) | (b[i + 3] >> 6)
        flen = (((b[i + 3] & 0x03) << 11) | (b[i + 4] << 3)
                | (b[i + 5] >> 5))              # incl. header
        rdb = b[i + 6] & 0b11
        if flen < (7 if prot_absent else 9) or channels == 0:
            return None
        return flen, profile, AAC_RATES[sr_idx], channels, rdb

    def aac_sniff(b: bytes):
        return "aac" if _adts_header(b, 0) else None

    def aac_meta(b: bytes):
        """Walk every ADTS frame: {fmt, object_type (profile+1),
        channels, sample_rate, n_frames, n_samples (1024 per raw data
        block), duration_ms, n_bytes} or None. Stops at the first
        non-frame byte."""
        i, n_frames, n_samples = 0, 0, 0
        profile = rate = channels = None
        while True:
            h = _adts_header(b, i)
            if h is None or i + h[0] > len(b):
                break
            flen, profile, rate, channels, rdb = h
            n_frames += 1
            n_samples += (rdb + 1) * 1024
            i += flen
        if n_frames == 0:
            return None
        return {"fmt": "aac", "object_type": profile + 1,
                "channels": channels, "sample_rate": rate,
                "n_frames": n_frames, "n_samples": n_samples,
                "duration_ms": n_samples * 1000 // rate,
                "n_bytes": len(b)}

    def encode_adts(payload_lens, sr_idx: int, channels: int,
                    profile: int = 1, rdb: int = 0) -> bytes:
        """Fixture builder: valid ADTS headers over zero payloads
        (the metadata layer is the decoded surface). ``payload_lens``
        = per-frame payload byte counts; ``profile`` is the 2-bit
        field (object type − 1); ``rdb`` raw-data-blocks-in-frame−1
        extra blocks of 1024 samples."""
        out = bytearray()
        for pl in payload_lens:
            flen = 7 + int(pl)
            out += bytes([
                0xFF,
                0xF0 | 0x01,                     # MPEG-4, layer 00, no CRC
                (profile << 6) | (sr_idx << 2) | ((channels >> 2) & 1),
                ((channels & 0b11) << 6) | ((flen >> 11) & 0b11),
                (flen >> 3) & 0xFF,
                ((flen & 0b111) << 5) | 0x1F,    # fullness high bits
                0xFC | (rdb & 0b11)])            # fullness low + rdb
            out += bytes(int(pl))
        return bytes(out)

    # --- FLAC STREAMINFO (flac format spec: 'fLaC' magic, metadata
    # block walk, block type 0 = 34-byte STREAMINFO) -----------------

    def flac_sniff(b: bytes):
        return "flac" if b[:4] == b"fLaC" else None

    def flac_meta(b: bytes):
        """Walk the metadata blocks to STREAMINFO: {fmt, channels,
        sample_rate, bits, n_samples (total), duration_ms, n_bytes}
        or None (no magic / no intact STREAMINFO)."""
        if b[:4] != b"fLaC":
            return None
        i, info = 4, None
        while i + 4 <= len(b):
            last, typ = b[i] >> 7, b[i] & 0x7F
            ln = int.from_bytes(b[i + 1:i + 4], "big")
            if i + 4 + ln > len(b):
                break
            if typ == 0 and ln >= 34:
                blk = b[i + 4:i + 4 + ln]
                # after 10 bytes of block/frame sizes: 20-bit rate,
                # 3-bit channels-1, 5-bit bits-1, 36-bit total samples
                v = int.from_bytes(blk[10:18], "big")
                rate = v >> 44
                if rate == 0:
                    return None
                info = {"fmt": "flac",
                        "channels": ((v >> 41) & 0x7) + 1,
                        "sample_rate": rate,
                        "bits": ((v >> 36) & 0x1F) + 1,
                        "n_samples": v & ((1 << 36) - 1),
                        "n_bytes": len(b)}
                info["duration_ms"] = \
                    info["n_samples"] * 1000 // rate
            i += 4 + ln
            if last:
                break
        return info

    def encode_flac(rate: int, channels: int, bits: int,
                    total_samples: int, pad: int = 0) -> bytes:
        """Fixture builder: magic + STREAMINFO (+ optional PADDING
        block of ``pad`` bytes to exercise the block walk)."""
        v = ((rate << 44) | ((channels - 1) << 41)
             | ((bits - 1) << 36) | total_samples)
        si = ((4096).to_bytes(2, "big") * 2
              + bytes(3) + bytes(3)            # min/max frame size
              + v.to_bytes(8, "big") + bytes(16))   # md5 zeroed
        out = bytearray(b"fLaC")
        out += bytes([((0 if pad else 1) << 7) | 0]) \
            + (34).to_bytes(3, "big") + si
        if pad:
            out += bytes([0x80 | 1]) + int(pad).to_bytes(3, "big") \
                + bytes(int(pad))
        return bytes(out)

    # --- Ogg/Opus metadata (RFC 3533 page framing + RFC 7845
    # OpusHead identification header) --------------------------------
    _OGG_CRC = []
    for _i in range(256):
        _c = _i << 24
        for _ in range(8):
            _c = ((_c << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                if _c & 0x80000000 else (_c << 1) & 0xFFFFFFFF
        _OGG_CRC.append(_c)

    def _ogg_crc(data: bytes) -> int:
        c = 0
        for x in data:
            c = ((c << 8) & 0xFFFFFFFF) ^ _OGG_CRC[((c >> 24) ^ x)
                                                   & 0xFF]
        return c

    def ogg_sniff(b: bytes):
        return "ogg" if b[:4] == b"OggS" else None

    def _ogg_pages(b: bytes):
        """Yield (header_type, granule, page_seq, first_packet_bytes)
        per CRC-VERIFIED page; stops at the first corrupt page."""
        import struct as _s
        i = 0
        while i + 27 <= len(b) and b[i:i + 4] == b"OggS":
            if b[i + 4] != 0:               # version must be 0
                return
            htype = b[i + 5]
            granule = _s.unpack_from("<q", b, i + 6)[0]
            seq = _s.unpack_from("<I", b, i + 18)[0]
            crc = _s.unpack_from("<I", b, i + 22)[0]
            nseg = b[i + 26]
            seg_end = i + 27 + nseg
            if seg_end > len(b):
                return
            lacing = b[i + 27:seg_end]
            body_len = sum(lacing)
            if seg_end + body_len > len(b):
                return
            page = bytearray(b[i:seg_end + body_len])
            page[22:26] = b"\x00" * 4       # CRC computed with field 0
            if _ogg_crc(bytes(page)) != crc:
                return
            # first packet = segments up to the first lacing < 255
            first_len = 0
            for lv in lacing:
                first_len += lv
                if lv < 255:
                    break
            yield (htype, granule, seq,
                   b[seg_end:seg_end + first_len])
            i = seg_end + body_len

    def ogg_opus_meta(b: bytes):
        """Page walk + OpusHead parse: {fmt, channels, pre_skip,
        input_sample_rate, n_pages, duration_ms} or None. Duration is
        (last granule − pre-skip) at the 48 kHz Opus clock (RFC 7845
        §4/§5.1); every page CRC is verified."""
        import struct as _s
        if ogg_sniff(b) != "ogg":
            return None
        head = None
        n_pages, last_granule = 0, 0
        for htype, granule, _seq, pkt in _ogg_pages(b):
            n_pages += 1
            if htype & 0x02 and pkt[:8] == b"OpusHead" and len(pkt) >= 19:
                head = {"channels": pkt[9],
                        "pre_skip": _s.unpack_from("<H", pkt, 10)[0],
                        "input_sample_rate":
                            _s.unpack_from("<I", pkt, 12)[0]}
            if granule > 0:
                last_granule = granule
        if head is None or n_pages == 0:
            return None
        dur48 = max(last_granule - head["pre_skip"], 0)
        return {"fmt": "opus", "channels": head["channels"],
                "pre_skip": head["pre_skip"],
                "input_sample_rate": head["input_sample_rate"],
                "n_pages": n_pages,
                "duration_ms": dur48 * 1000 // 48000,
                "n_bytes": len(b)}

    def ogg_opus_tags(b: bytes):
        """OpusTags (RFC 7845 §5.2, Vorbis-comment layout) from the
        stream's second packet: {vendor, comments: [(key, value),
        ...]} or None. Keys are upcased per the spec's
        case-insensitive field names; pages are CRC-verified by the
        same walk as ogg_opus_meta."""
        import struct as _s
        if ogg_sniff(b) != "ogg":
            return None
        for _htype, _granule, _seq, pkt in _ogg_pages(b):
            if pkt[:8] != b"OpusTags":
                continue
            try:
                i = 8
                (vlen,) = _s.unpack_from("<I", pkt, i)
                vendor = pkt[i + 4:i + 4 + vlen].decode("utf-8")
                i += 4 + vlen
                (n,) = _s.unpack_from("<I", pkt, i)
                i += 4
                comments = []
                for _ in range(n):
                    (clen,) = _s.unpack_from("<I", pkt, i)
                    c = pkt[i + 4:i + 4 + clen].decode("utf-8")
                    i += 4 + clen
                    k, _, v = c.partition("=")
                    comments.append((k.upper(), v))
                return {"vendor": vendor, "comments": comments}
            except (struct.error, UnicodeDecodeError):
                return None
        return None

    def _ogg_page(serial: int, seq: int, granule: int, htype: int,
                  packet: bytes) -> bytes:
        import struct as _s
        lacing = bytes([255] * (len(packet) // 255)
                       + [len(packet) % 255])
        hdr = (b"OggS" + bytes([0, htype])
               + _s.pack("<q", granule) + _s.pack("<I", serial)
               + _s.pack("<I", seq) + b"\x00" * 4
               + bytes([len(lacing)]) + lacing)
        page = bytearray(hdr + packet)
        page[22:26] = _s.pack("<I", _ogg_crc(bytes(page)))
        return bytes(page)

    def encode_ogg_opus(channels: int, pre_skip: int,
                        input_rate: int, n_audio_pages: int,
                        samples_per_page: int = 960,
                        serial: int = 0x1234,
                        comments: list | None = None) -> bytes:
        """Fixture builder: BOS OpusHead page + OpusTags page (with
        optional 'KEY=value' ``comments``) + ``n_audio_pages``
        one-packet audio pages with cumulative 48 kHz granules (EOS
        on the last), all CRC-stamped."""
        import struct as _s
        head = (b"OpusHead" + bytes([1, channels])
                + _s.pack("<H", pre_skip) + _s.pack("<I", input_rate)
                + _s.pack("<h", 0) + bytes([0]))
        tags = b"OpusTags" + _s.pack("<I", 4) + b"spkg" \
            + _s.pack("<I", len(comments or []))
        for c in comments or []:
            enc = c.encode("utf-8")
            tags += _s.pack("<I", len(enc)) + enc
        out = bytearray(_ogg_page(serial, 0, 0, 0x02, head))
        out += _ogg_page(serial, 1, 0, 0x00, tags)
        for p in range(n_audio_pages):
            granule = pre_skip + (p + 1) * samples_per_page
            htype = 0x04 if p == n_audio_pages - 1 else 0x00
            out += _ogg_page(serial, 2 + p, granule, htype,
                             bytes([0xF8, p & 0xFF]))  # dummy packet
        return bytes(out)

    def ogg_vorbis_meta(b: bytes):
        """Page walk + Vorbis identification-header parse (Vorbis I
        spec §4.2.2): packet type 1 + 'vorbis' + version 0 +
        channels + rate + bitrate triple + blocksize exponents +
        framing bit. Granules are PCM sample positions, so duration
        = last granule / rate. Returns {fmt, channels, sample_rate,
        bitrate_nominal, blocksize_0, blocksize_1, n_pages,
        duration_ms, n_bytes} or None; pages CRC-verified."""
        import struct as _s
        if ogg_sniff(b) != "ogg":
            return None
        head = None
        n_pages, last_granule = 0, 0
        for htype, granule, _seq, pkt in _ogg_pages(b):
            n_pages += 1
            if (htype & 0x02 and pkt[:7] == b"\x01vorbis"
                    and len(pkt) >= 30):
                if _s.unpack_from("<I", pkt, 7)[0] != 0:
                    return None          # vorbis_version must be 0
                bs = pkt[28]
                if pkt[29] & 0x01 == 0:  # framing bit must be set
                    return None
                head = {"channels": pkt[11],
                        "sample_rate": _s.unpack_from("<I", pkt, 12)[0],
                        "bitrate_nominal":
                            _s.unpack_from("<i", pkt, 20)[0],
                        "blocksize_0": 1 << (bs & 0x0F),
                        "blocksize_1": 1 << (bs >> 4)}
            if granule > 0:
                last_granule = granule
        if head is None or n_pages == 0 or head["sample_rate"] == 0:
            return None
        return {"fmt": "vorbis", "n_pages": n_pages,
                "duration_ms":
                    last_granule * 1000 // head["sample_rate"],
                "n_bytes": len(b), **head}

    def ogg_vorbis_tags(b: bytes):
        """Vorbis comment header (packet type 3, Vorbis I §5):
        identical layout to OpusTags plus a trailing framing bit,
        which must be set. {vendor, comments: [(KEY, value), ...]}
        or None."""
        import struct as _s
        if ogg_sniff(b) != "ogg":
            return None
        for _htype, _granule, _seq, pkt in _ogg_pages(b):
            if pkt[:7] != b"\x03vorbis":
                continue
            try:
                i = 7
                (vlen,) = _s.unpack_from("<I", pkt, i)
                vendor = pkt[i + 4:i + 4 + vlen].decode("utf-8")
                i += 4 + vlen
                (n,) = _s.unpack_from("<I", pkt, i)
                i += 4
                comments = []
                for _ in range(n):
                    (clen,) = _s.unpack_from("<I", pkt, i)
                    c = pkt[i + 4:i + 4 + clen].decode("utf-8")
                    i += 4 + clen
                    k, _, v = c.partition("=")
                    comments.append((k.upper(), v))
                if i >= len(pkt) or pkt[i] & 0x01 == 0:
                    return None          # framing bit
                return {"vendor": vendor, "comments": comments}
            except (struct.error, UnicodeDecodeError):
                return None
        return None

    def encode_ogg_vorbis(channels: int, rate: int,
                          bitrate_nominal: int, n_audio_pages: int,
                          samples_per_page: int = 1024,
                          serial: int = 0x5678,
                          comments: list | None = None) -> bytes:
        """Fixture builder: the three mandated Vorbis headers (ident
        BOS page, comment page with optional 'KEY=value' comments,
        minimal setup page) + audio pages with cumulative PCM
        granules (EOS last), all CRC-stamped."""
        import struct as _s
        ident = (b"\x01vorbis" + _s.pack("<I", 0)
                 + bytes([channels]) + _s.pack("<I", rate)
                 + _s.pack("<i", 0)
                 + _s.pack("<i", bitrate_nominal)
                 + _s.pack("<i", 0)
                 + bytes([(11 << 4) | 8])     # blocksizes 2048/256
                 + bytes([0x01]))
        tags = b"\x03vorbis" + _s.pack("<I", 4) + b"spkg" \
            + _s.pack("<I", len(comments or []))
        for c in comments or []:
            enc = c.encode("utf-8")
            tags += _s.pack("<I", len(enc)) + enc
        tags += bytes([0x01])                 # framing bit
        setup = b"\x05vorbis" + bytes([0x01])  # structural minimum
        out = bytearray(_ogg_page(serial, 0, 0, 0x02, ident))
        out += _ogg_page(serial, 1, 0, 0x00, tags)
        out += _ogg_page(serial, 2, 0, 0x00, setup)
        for p in range(n_audio_pages):
            granule = (p + 1) * samples_per_page
            htype = 0x04 if p == n_audio_pages - 1 else 0x00
            out += _ogg_page(serial, 3 + p, granule, htype,
                             bytes([0x00, p & 0xFF]))
        return bytes(out)

    # ---- AIFF (Audio IFF): big-endian chunk container, COMM's
    # sample rate stored as an 80-bit IEEE 754 extended float
    # (1 sign + 15 exponent bits, bias 16383, EXPLICIT integer bit +
    # 63 mantissa bits) — the classic format quirk, parsed for real.
    def ext80_to_rate(b10: bytes) -> int:
        exp = int.from_bytes(b10[0:2], "big") & 0x7FFF
        mant = int.from_bytes(b10[2:10], "big")
        if exp == 0 and mant == 0:
            return 0
        # value = mant * 2^(exp - 16383 - 63)
        shift = exp - 16383 - 63
        val = mant * (2.0 ** shift)
        return int(round(val))

    def rate_to_ext80(rate: int) -> bytes:
        if rate <= 0:
            return b"\x00" * 10
        exp = rate.bit_length() - 1           # floor(log2)
        mant = rate << (63 - exp)             # explicit integer bit set
        return ((16383 + exp).to_bytes(2, "big")
                + mant.to_bytes(8, "big"))

    def aiff_sniff(b: bytes):
        if len(b) >= 12 and b[:4] == b"FORM" and b[8:12] == b"AIFF":
            return "aiff"
        return None

    def encode_aiff(samples, rate: int = 8000) -> bytes:
        """Mono 16-bit big-endian AIFF: FORM/AIFF + COMM (channels,
        frames, bits, ext80 rate) + SSND (offset/block 0 + PCM)."""
        comm = ((1).to_bytes(2, "big")
                + len(samples).to_bytes(4, "big")
                + (16).to_bytes(2, "big")
                + rate_to_ext80(rate))
        pcm = b"".join(int(s).to_bytes(2, "big", signed=True)
                       for s in samples)
        ssnd = (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + pcm
        body = (b"AIFF"
                + b"COMM" + len(comm).to_bytes(4, "big") + comm
                + b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd
                + (b"\x00" if len(ssnd) & 1 else b""))
        return b"FORM" + len(body).to_bytes(4, "big") + body

    def aiff_decode(b: bytes):
        """COMM/SSND walk → {fmt, channels, sample_rate, bits,
        samples (list, interleaved)} or None."""
        if aiff_sniff(b) is None:
            return None
        pos = 12
        channels = bits = rate = nframes = None
        pcm = None
        while pos + 8 <= len(b):
            cc = b[pos:pos + 4]
            size = int.from_bytes(b[pos + 4:pos + 8], "big")
            payload = b[pos + 8:pos + 8 + size]
            if len(payload) < size:
                return None                 # truncated chunk
            if cc == b"COMM" and size >= 18:
                channels = int.from_bytes(payload[0:2], "big")
                nframes = int.from_bytes(payload[2:6], "big")
                bits = int.from_bytes(payload[6:8], "big")
                rate = ext80_to_rate(payload[8:18])
            elif cc == b"SSND" and size >= 8:
                off = int.from_bytes(payload[0:4], "big")
                pcm = payload[8 + off:]
            pos += 8 + size + (size & 1)
        if channels is None or pcm is None or bits != 16:
            return None
        n = min(nframes * channels, len(pcm) // 2)
        samples = [int.from_bytes(pcm[2 * i:2 * i + 2], "big",
                                  signed=True) for i in range(n)]
        return {"fmt": "aiff", "channels": channels,
                "sample_rate": rate, "bits": bits,
                "samples": samples}

    def mp2_sniff(b: bytes):
        """MPEG-1 Layer II elementary stream (same header family as
        mp3 but layer bits '10'); full sample decode lives in
        operators/mp2codec.py."""
        if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xF8) != 0xF8:
            return None                 # sync + ID=1: MPEG-2 LSF has
            # different tables and frame math — refuse, don't guess
        return "mp2" if (b[1] >> 1) & 0b11 == 0b10 else None

    def mp2_meta(b: bytes):
        """Frame-header walk for Layer II streams (metadata only —
        mp2codec.decode_frames is the sample path). 1152 samples per
        MPEG-1 Layer II frame."""
        i, n_frames, kbps_sum = 0, 0, 0
        rate = channels = None
        while i + 4 <= len(b) and b[i] == 0xFF \
                and (b[i + 1] & 0xF8) == 0xF8 \
                and (b[i + 1] >> 1) & 0b11 == 0b10:
            br_idx = (b[i + 2] >> 4) & 0xF
            sr_idx = (b[i + 2] >> 2) & 0b11
            if br_idx in (0, 15) or sr_idx == 3:
                break
            kbps = MP2_BITRATES[br_idx]
            rate = {0: 44100, 1: 48000, 2: 32000}[sr_idx]
            pad = (b[i + 2] >> 1) & 1
            channels = 1 if (b[i + 3] >> 6) & 0b11 == 0b11 else 2
            flen = 144 * kbps * 1000 // rate + pad
            if i + flen > len(b):
                break
            n_frames += 1
            kbps_sum += kbps
            i += flen
        if n_frames == 0:
            return None
        return {"fmt": "mp2", "channels": channels,
                "sample_rate": rate, "n_frames": n_frames,
                "duration_ms": n_frames * 1152 * 1000 // rate,
                "bitrate_kbps": kbps_sum // n_frames,
                "n_bytes": len(b)}

    def audio_sniff(b: bytes):
        """Unified sniff across the seven audio containers."""
        return (sniff(b) or flac_sniff(b) or ogg_sniff(b)
                or aac_sniff(b) or aiff_sniff(b) or mp2_sniff(b)
                or mp3_sniff(b))

    return SimpleNamespace(sniff=sniff, decode_meta=decode_meta,
                           decode=decode, encode_wav=encode_wav,
                           ulaw_to_linear=ulaw_to_linear,
                           alaw_to_linear=alaw_to_linear,
                           ima_step=ima_step, IMA_STEPS=IMA_STEPS,
                           encode_wav_adpcm=encode_wav_adpcm,
                           features=features, mp3_sniff=mp3_sniff,
                           mp3_meta=mp3_meta,
                           encode_mp3_frames=encode_mp3_frames,
                           id3_tags=id3_tags, encode_id3=encode_id3,
                           aac_sniff=aac_sniff, aac_meta=aac_meta,
                           encode_adts=encode_adts,
                           flac_sniff=flac_sniff, flac_meta=flac_meta,
                           encode_flac=encode_flac,
                           ogg_sniff=ogg_sniff,
                           ogg_opus_meta=ogg_opus_meta,
                           ogg_opus_tags=ogg_opus_tags,
                           encode_ogg_opus=encode_ogg_opus,
                           ogg_vorbis_meta=ogg_vorbis_meta,
                           ogg_vorbis_tags=ogg_vorbis_tags,
                           encode_ogg_vorbis=encode_ogg_vorbis,
                           mp2_sniff=mp2_sniff, mp2_meta=mp2_meta,
                           aiff_sniff=aiff_sniff,
                           aiff_decode=aiff_decode,
                           encode_aiff=encode_aiff,
                           ext80_to_rate=ext80_to_rate,
                           rate_to_ext80=rate_to_ext80,
                           audio_sniff=audio_sniff)


# driver-side convenience instance (kernels build their own)
AUDIO_CODEC = make_audio_codec()
