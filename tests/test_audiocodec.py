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
