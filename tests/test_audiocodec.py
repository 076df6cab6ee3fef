"""WAV codec unit tests (RIFF PCM decode; multimodal audio surface)."""

import struct

from nowdb_spark.operators.audiocodec import make_audio_codec


def test_wav_roundtrip_pcm16():
    c = make_audio_codec()
    s = [((i * 13 + 7) % 4001) - 2000 for i in range(123)]
    b = c.encode_wav(s, rate=8000, bits=16)
    assert c.sniff(b) == "wav"
    m = c.decode_meta(b)
    assert (m["n_samples"], m["sample_rate"], m["bits"],
            m["channels"]) == (123, 8000, 16, 1)
    assert c.decode(b)["samples"] == s


def test_wav_pcm8_stereo():
    c = make_audio_codec()
    s = [(i % 256) - 128 for i in range(40)]
    b = c.encode_wav(s, rate=4000, bits=8, channels=2)
    a = c.decode(b)
    assert a["samples"] == s
    assert a["channels"] == 2 and a["n_samples"] == 20


def test_wav_features_exact():
    c = make_audio_codec()
    s = [5, -7, 3, 0]
    f = c.features(c.encode_wav(s, rate=1000, bits=16))
    assert f == {"fmt": "wav", "n_samples": 4, "sample_rate": 1000,
                 "duration_ms": 4, "peak": 7, "sq_sum": 83}


def test_wav_rejects_non_wav_and_non_pcm():
    import struct
    c = make_audio_codec()
    assert c.sniff(b"nope") is None
    assert c.decode_meta(b"RIFF\x00\x00\x00\x00WAVE") is None
    # audio_format=2 (ADPCM) → rejected
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    assert c.decode_meta(b) is None


def test_wav_odd_chunk_alignment():
    """RIFF chunks are 2-byte aligned; an odd-length data chunk's pad
    byte must not break the walk (encoder emits it)."""
    c = make_audio_codec()
    s = [(i % 200) - 100 for i in range(7)]       # odd payload (7 bytes)
    b = c.encode_wav(s, rate=8000, bits=8)
    assert c.decode(b)["samples"] == s


# --- MP3 frame-header layer -------------------------------------------

def test_mp3_cbr_meta_exact():
    c = make_audio_codec()
    b = c.encode_mp3_frames([(9, 0)] * 10, version="1", sr_idx=0,
                            channels=2)          # 128 kbps @ 44100
    m = c.mp3_meta(b)
    assert m["fmt"] == "mp3" and m["version"] == "1"
    assert m["channels"] == 2 and m["sample_rate"] == 44100
    assert m["n_frames"] == 10 and m["bitrate_kbps"] == 128
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert c.mp3_sniff(b) == "mp3"


def test_mp3_vbr_average_and_padding():
    c = make_audio_codec()
    frames = [(1, 0), (14, 1), (7, 0)]           # 32, 320, 96 kbps
    b = c.encode_mp3_frames(frames, version="1", sr_idx=1, channels=1)
    m = c.mp3_meta(b)
    assert m["n_frames"] == 3 and m["channels"] == 1
    assert m["sample_rate"] == 48000
    assert m["bitrate_kbps"] == (32 + 320 + 96) // 3


def test_mp3_id3_skip_and_mpeg2():
    c = make_audio_codec()
    b = c.encode_mp3_frames([(5, 0)] * 4, version="2.5", sr_idx=2,
                            channels=1, id3_pad=200)
    assert b[:3] == b"ID3"
    m = c.mp3_meta(b)
    assert m["version"] == "2.5" and m["sample_rate"] == 8000
    assert m["n_frames"] == 4
    # MPEG2/2.5 Layer III frames carry 576 samples
    assert m["duration_ms"] == 4 * 576 * 1000 // 8000


def test_mp3_rejects_garbage_and_truncation():
    c = make_audio_codec()
    assert c.mp3_meta(b"not audio at all") is None
    assert c.mp3_sniff(b"\x00\x01\x02\x03") is None
    b = c.encode_mp3_frames([(9, 0)] * 3, version="1")
    # truncate the final frame: only the complete frames count
    m = c.mp3_meta(b[:-10])
    assert m["n_frames"] == 2
    # WAV sniff and MP3 sniff stay disjoint
    wav = c.encode_wav([0, 1, 2], rate=8000, bits=16)
    assert c.mp3_sniff(wav) is None and c.sniff(b) is None


# --- AAC ADTS (13818-7 §6.2) -------------------------------------------

def test_aac_adts_meta_exact():
    c = make_audio_codec()
    b = c.encode_adts([25, 30, 40], sr_idx=4, channels=2,
                      profile=1, rdb=0)
    m = c.aac_meta(b)
    assert m == {"fmt": "aac", "object_type": 2, "channels": 2,
                 "sample_rate": 44100, "n_frames": 3,
                 "n_samples": 3 * 1024,
                 "duration_ms": 3 * 1024 * 1000 // 44100,
                 "n_bytes": len(b)}


def test_aac_raw_data_blocks_and_channels():
    c = make_audio_codec()
    # rdb=1 → two 1024-sample blocks per ADTS frame; channel config
    # 6 exercises the split bit across header bytes 2/3
    b = c.encode_adts([10] * 5, sr_idx=7, channels=6, profile=3,
                      rdb=1)
    m = c.aac_meta(b)
    assert (m["channels"], m["object_type"]) == (6, 4)
    assert m["sample_rate"] == 22050
    assert m["n_samples"] == 5 * 2 * 1024


def test_aac_rejects_garbage_and_truncation():
    c = make_audio_codec()
    assert c.aac_meta(b"nonsense bytes here") is None
    assert c.aac_sniff(b"\xff\xf0") is None          # too short
    b = c.encode_adts([20] * 3, sr_idx=3, channels=1)
    m = c.aac_meta(b[:-5])      # truncated tail frame dropped
    assert m["n_frames"] == 2
    # an MP3 frame must not sniff as AAC and vice versa (layer bits)
    mp3 = c.encode_mp3_frames([(9, 0)], version="1")
    assert c.aac_sniff(mp3) is None
    assert c.mp3_sniff(b) is None


# --- FLAC STREAMINFO ---------------------------------------------------

def test_flac_streaminfo_exact():
    c = make_audio_codec()
    b = c.encode_flac(rate=44100, channels=2, bits=16,
                      total_samples=441_000)
    m = c.flac_meta(b)
    assert m == {"fmt": "flac", "channels": 2, "sample_rate": 44100,
                 "bits": 16, "n_samples": 441_000,
                 "duration_ms": 10_000, "n_bytes": len(b)}


def test_flac_padding_block_and_extremes():
    c = make_audio_codec()
    # 20-bit rate ceiling, 8 channels, 32 bits, 36-bit sample count,
    # plus a PADDING block after STREAMINFO (block walk exercised)
    b = c.encode_flac(rate=655350, channels=8, bits=32,
                      total_samples=(1 << 36) - 1, pad=13)
    m = c.flac_meta(b)
    assert (m["sample_rate"], m["channels"], m["bits"]) \
        == (655350, 8, 32)
    assert m["n_samples"] == (1 << 36) - 1


def test_flac_rejects_garbage():
    c = make_audio_codec()
    assert c.flac_meta(b"fLaX not flac") is None
    assert c.flac_meta(b"fLaC\x00\x00") is None      # truncated
    b = bytearray(c.encode_flac(44100, 2, 16, 1000))
    assert c.flac_meta(bytes(b)[:20]) is None        # cut STREAMINFO


def test_audio_sniff_dispatch():
    c = make_audio_codec()
    wav = c.encode_wav([0, 5, -5], rate=8000, bits=16)
    mp3 = c.encode_mp3_frames([(9, 0)] * 2, version="1")
    aac = c.encode_adts([15] * 2, sr_idx=4, channels=2)
    flac = c.encode_flac(48000, 2, 24, 4800)
    assert [c.audio_sniff(x) for x in (wav, mp3, aac, flac)] \
        == ["wav", "mp3", "aac", "flac"]
    assert c.audio_sniff(b"plain text") is None


# --- Ogg/Opus (RFC 3533 + RFC 7845) --------------------------------------

def test_ogg_opus_meta_exact():
    c = make_audio_codec()
    b = c.encode_ogg_opus(channels=2, pre_skip=312, input_rate=48000,
                          n_audio_pages=4, samples_per_page=960)
    m = c.ogg_opus_meta(b)
    assert m == {"fmt": "opus", "channels": 2, "pre_skip": 312,
                 "input_sample_rate": 48000, "n_pages": 6,
                 "duration_ms": 4 * 960 * 1000 // 48000,
                 "n_bytes": len(b)}


def test_ogg_crc_rejects_corruption():
    c = make_audio_codec()
    b = bytearray(c.encode_ogg_opus(1, 0, 8000, 3))
    # flip a bit inside the LAST page body: the walk keeps the good
    # prefix (CRC verified page-by-page) and drops the corrupt tail
    b[-1] ^= 0x10
    assert c.ogg_opus_meta(bytes(b))["n_pages"] == 4
    # corrupting the FIRST page (OpusHead) kills the whole parse
    b2 = bytearray(c.encode_ogg_opus(1, 0, 8000, 3))
    b2[30] ^= 0x01
    assert c.ogg_opus_meta(bytes(b2)) is None


def test_ogg_rejects_non_ogg():
    c = make_audio_codec()
    assert c.ogg_opus_meta(b"OggSjunk") is None
    assert c.ogg_opus_meta(b"not ogg") is None
    assert c.ogg_sniff(b"RIFF") is None


def test_audio_sniff_includes_ogg():
    c = make_audio_codec()
    assert c.audio_sniff(c.encode_ogg_opus(1, 0, 8000, 1)) == "ogg"


# --- G.711 µ-law / A-law (closed-form CCITT expansion) -------------------

def test_g711_known_values():
    c = make_audio_codec()
    # canonical table anchors
    assert c.ulaw_to_linear(0xFF) == 0
    assert c.ulaw_to_linear(0x7F) == 0
    assert c.ulaw_to_linear(0x00) == -32124
    assert c.ulaw_to_linear(0x80) == 32124
    assert c.alaw_to_linear(0x55) == -8
    assert c.alaw_to_linear(0xD5) == 8
    assert c.alaw_to_linear(0x2A) == -32256
    assert c.alaw_to_linear(0xAA) == 32256


def test_g711_wav_decode_roundtrip():
    c = make_audio_codec()
    enc = bytes((i * 13 + 7) % 256 for i in range(50))
    for tag, law in ((7, c.ulaw_to_linear), (6, c.alaw_to_linear)):
        w = c.encode_wav(enc, rate=8000, audio_fmt=tag)
        d = c.decode(w)
        assert d["samples"] == [law(x) for x in enc]
        assert d["n_samples"] == 50 and d["bits"] == 8
        assert d["fmt"] == ("wav-ulaw" if tag == 7 else "wav-alaw")
    # PCM path unchanged
    w = c.encode_wav([1, -2, 3], rate=8000, bits=16)
    assert c.decode(w)["fmt"] == "wav"


def test_g711_monotone_per_segment():
    """Expansion must be monotone within each sign (companding is an
    order-preserving quantizer)."""
    c = make_audio_codec()
    # µ-law positive codes run 0xFF (0) down to 0x80 (max)
    pos = [c.ulaw_to_linear(b) for b in range(0xFF, 0x7F, -1)]
    assert pos == sorted(pos) and pos[0] == 0
    neg = [c.ulaw_to_linear(b) for b in range(0x7F, -1, -1)]
    assert neg == sorted(neg, reverse=True)


def test_opus_tags_parse():
    c = make_audio_codec()
    b = c.encode_ogg_opus(2, 100, 48000, 2,
                          comments=["TITLE=hello", "artist=A & B",
                                    "X=a=b", "NOVALUE"])
    t = c.ogg_opus_tags(b)
    assert t["vendor"] == "spkg"
    # keys upcased; '=' splits on FIRST occurrence; no '=' -> empty val
    assert t["comments"] == [("TITLE", "hello"), ("ARTIST", "A & B"),
                             ("X", "a=b"), ("NOVALUE", "")]
    assert c.ogg_opus_tags(c.encode_ogg_opus(1, 0, 8000, 1)) \
        == {"vendor": "spkg", "comments": []}
    assert c.ogg_opus_tags(b"not ogg") is None


# --- IMA/DVI ADPCM (WAV fmt tag 0x11) ------------------------------------

def test_adpcm_decode_matches_scalar_walk():
    c = make_audio_codec()
    nibs = [(7 * i + 3) % 16 for i in range(60)]
    b = c.encode_wav_adpcm(nibs, predictor=-1234, index=30, rate=8000)
    d = c.decode(b)
    pred, idx = -1234, 30
    want = [pred]
    for n in nibs:
        pred, idx = c.ima_step(pred, idx, n)
        want.append(pred)
    assert d["samples"] == want
    assert d["fmt"] == "wav-adpcm" and d["n_samples"] == 61
    assert d["bits"] == 4


def test_adpcm_clamping():
    c = make_audio_codec()
    # all-add nibbles from near the positive rail: predictor clamps
    # at 32767, index at 88
    pred, idx = 32000, 88
    for _ in range(10):
        pred, idx = c.ima_step(pred, idx, 7)   # big positive step
    assert pred == 32767 and idx == 88
    pred, idx = -32000, 88
    for _ in range(10):
        pred, idx = c.ima_step(pred, idx, 15)  # big negative step
    assert pred == -32768
    # index floor
    _, idx = c.ima_step(0, 0, 0)
    assert idx == 0


def test_adpcm_rejects_stereo_and_bad_align():
    import struct
    c = make_audio_codec()
    fmt = struct.pack("<HHIIHH", 0x11, 2, 8000, 4000, 256, 4)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    assert c.decode_meta(b) is None            # stereo unsupported


# --- ID3v2 text frames ---------------------------------------------------

def test_id3_v3_v4_roundtrip():
    c = make_audio_codec()
    tags = [("TIT2", "hello"), ("TPE1", "A & B"), ("TRCK", "7")]
    for major in (3, 4):
        mp3 = (c.encode_id3(tags, major=major)
               + c.encode_mp3_frames([(9, 0)] * 3, version="1"))
        assert c.id3_tags(mp3) == tags
        # the frame-header walk skips the real tag correctly
        assert c.mp3_meta(mp3)["n_frames"] == 3


def test_id3_encodings_and_nontext_frames():
    c = make_audio_codec()
    t = c.encode_id3([("TIT2", "x")])
    # splice in a latin-1 text frame and a binary APIC frame
    extra = (b"TALB" + bytes([0, 0, 0, 3]) + b"\x00\x00" + b"\x00ab"
             + b"APIC" + bytes([0, 0, 0, 2]) + b"\x00\x00"
             + b"\xff\xfe")
    n = len(t) - 10 + len(extra)
    full = (b"ID3\x04\x00\x00"
            + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                     (n >> 7) & 0x7F, n & 0x7F]) + t[10:] + extra)
    assert c.id3_tags(full) == [("TIT2", "x"), ("TALB", "ab")]
    # UTF-16 with BOM
    u16 = "héllo".encode("utf-16")
    frame = b"TIT2" + bytes([0, 0, 0, len(u16) + 1]) + b"\x00\x00" \
        + b"\x01" + u16
    m = len(frame)
    tag = (b"ID3\x04\x00\x00"
           + bytes([(m >> 21) & 0x7F, (m >> 14) & 0x7F,
                    (m >> 7) & 0x7F, m & 0x7F]) + frame)
    assert c.id3_tags(tag) == [("TIT2", "héllo")]
    assert c.id3_tags(b"no tag here") is None


def test_vorbis_meta_roundtrip():
    c = make_audio_codec()
    b = c.encode_ogg_vorbis(channels=2, rate=22050,
                            bitrate_nominal=96000, n_audio_pages=3,
                            samples_per_page=1024,
                            comments=["TITLE=hello", "ARTIST=x"])
    m = c.ogg_vorbis_meta(b)
    assert m["fmt"] == "vorbis" and m["channels"] == 2
    assert m["sample_rate"] == 22050
    assert m["bitrate_nominal"] == 96000
    assert (m["blocksize_0"], m["blocksize_1"]) == (256, 2048)
    assert m["n_pages"] == 6          # ident + comment + setup + 3
    assert m["duration_ms"] == 3 * 1024 * 1000 // 22050
    t = c.ogg_vorbis_tags(b)
    assert t["vendor"] == "spkg"
    assert t["comments"] == [("TITLE", "hello"), ("ARTIST", "x")]


def _ogg_crc32(data: bytes) -> int:
    # Ogg CRC-32: poly 0x04C11DB7, non-reflected, init/xorout 0
    c = 0
    for x in data:
        c ^= x << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) if c & 0x80000000 else c << 1
            c &= 0xFFFFFFFF
    return c


def _restamp_page0(b: bytearray) -> None:
    nseg = b[26]
    body_len = sum(b[27:27 + nseg])
    end = 27 + nseg + body_len
    b[22:26] = b"\x00" * 4
    b[22:26] = struct.pack("<I", _ogg_crc32(bytes(b[:end])))


def test_vorbis_rejects_bad_version_and_framing():
    c = make_audio_codec()
    # corrupt vorbis_version, RE-STAMP the page CRC: the walk passes,
    # the ident parser itself must reject version != 0
    b = bytearray(c.encode_ogg_vorbis(1, 8000, 64000, 1))
    i = b.index(b"\x01vorbis") + 7
    b[i:i + 4] = struct.pack("<I", 5)
    _restamp_page0(b)
    assert c.ogg_vorbis_meta(bytes(b)) is None
    # clear the ident framing bit (last payload byte of packet 1)
    b = bytearray(c.encode_ogg_vorbis(1, 8000, 64000, 1))
    i = b.index(b"\x01vorbis")
    b[i + 29] = 0x00
    _restamp_page0(b)
    assert c.ogg_vorbis_meta(bytes(b)) is None
    # same corruption WITHOUT restamping → rejected by the CRC walk
    b2 = bytearray(c.encode_ogg_vorbis(1, 8000, 64000, 1))
    b2[b2.index(b"\x01vorbis") + 29] = 0x00
    assert c.ogg_vorbis_meta(bytes(b2)) is None


def test_vorbis_crc_corruption_detected():
    c = make_audio_codec()
    b = bytearray(c.encode_ogg_vorbis(1, 16000, 64000, 2))
    b[40] ^= 0xFF
    assert c.ogg_vorbis_meta(bytes(b)) is None


def test_vorbis_non_ogg_and_opus_cross():
    c = make_audio_codec()
    assert c.ogg_vorbis_meta(b"RIFFxxxx") is None
    # an Opus stream is valid Ogg but has no vorbis ident header
    opus = c.encode_ogg_opus(1, 312, 48000, 2)
    assert c.ogg_vorbis_meta(opus) is None
    assert c.ogg_vorbis_tags(opus) is None
    # and vice versa
    vorb = c.encode_ogg_vorbis(1, 8000, 64000, 1)
    assert c.ogg_opus_meta(vorb) is None
