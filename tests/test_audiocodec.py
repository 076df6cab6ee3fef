"""WAV codec unit tests (RIFF PCM decode; multimodal audio surface)."""

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
    assert f == {"n_samples": 4, "sample_rate": 1000,
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
