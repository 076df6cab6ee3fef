"""MP4 container + H.264 SPS codec (operators/mp4codec.py): pure-
Python round trips of the encoder/parser pair, spec-edge behavior
(cropped dims, high-profile SPS fields, 64-bit boxes, emulation
prevention bytes), and graceful rejection of non-video bytes."""

from __future__ import annotations

import struct

import pytest

from nowdb_spark.operators.mp4codec import make_mp4_codec

C = make_mp4_codec()


def test_sps_roundtrip_grid():
    for prof in (66, 77, 100):
        for w in (16, 320, 322, 1918, 640):
            for h in (16, 238, 240, 1080):
                m = C.parse_sps(C.encode_sps(w, h, prof, 31))
                assert (m["width"], m["height"]) == (w, h)
                assert (m["profile_idc"], m["level_idc"]) == (prof, 31)


def test_sps_high_profile_chroma_fields():
    m = C.parse_sps(C.encode_sps(48, 32, profile=100, level=51))
    assert m["chroma_format_idc"] == 1      # explicit 4:2:0 at high
    m = C.parse_sps(C.encode_sps(48, 32, profile=66, level=51))
    assert m["chroma_format_idc"] == 1      # implied pre-high


def test_sps_emulation_prevention_bytes():
    # ue-heavy zero runs produce 00 00 0x patterns in the raw rbsp;
    # a large mb grid exercises the 00 00 03 escape both ways
    for w in (4096, 2048, 1024):
        m = C.parse_sps(C.encode_sps(w, 2048, 66, 50))
        assert (m["width"], m["height"]) == (w, 2048)


def test_sps_rejects_odd_dims_and_junk():
    with pytest.raises(ValueError):
        C.encode_sps(17, 16)
    with pytest.raises(ValueError):
        C.parse_sps(b"\x41\x00\x00")        # not an SPS NAL type


def test_annexb_census_and_sps():
    b = C.encode_annexb(322, 238, 9, gop=4, profile=100, level=32)
    assert C.sniff(b) == "h264"
    m = C.h264_meta(b)
    assert m["n_frames"] == 9 and m["n_idr"] == 3
    assert (m["width"], m["height"]) == (322, 238)
    assert (m["profile_idc"], m["level_idc"]) == (100, 32)
    # 3-byte start codes parse identically
    b3 = b.replace(b"\x00\x00\x00\x01", b"\x00\x00\x01")
    assert C.h264_meta(b3)["n_frames"] == 9


def test_mp4_full_meta():
    v = C.encode_mp4(1918, 1080, 12345, profile=100, level=40,
                     channels=1, sample_rate=48000)
    assert C.sniff(v) == "mp4"
    m = C.mp4_meta(v)
    assert m["brand"] == "isom" and m["duration_ms"] == 12345
    assert (m["width"], m["height"]) == (1918, 1080)
    assert m["vcodec"] == "avc1" and m["acodec"] == "mp4a"
    assert (m["profile_idc"], m["level_idc"]) == (100, 40)
    assert (m["channels"], m["sample_rate"]) == (1, 48000)
    assert m["n_tracks"] == 2


def test_mp4_sps_dims_override_container_grid():
    # container-level avc1 width/height carry the macroblock grid;
    # the SPS crop must win (330 x 190 inside a 336 x 192 grid)
    v = C.encode_mp4(330, 190, 1000)
    m = C.mp4_meta(v)
    assert (m["width"], m["height"]) == (330, 190)


def test_mp4_64bit_box_size():
    v = bytearray(C.encode_mp4(64, 48, 777))
    # rewrite ftyp as a largesize box: size=1 marker + 64-bit size
    size = struct.unpack_from(">I", v, 0)[0]
    big = struct.pack(">I", 1) + v[4:8] + struct.pack(">Q", size + 8) \
        + v[8:size]
    m = C.mp4_meta(bytes(big) + bytes(v[size:]))
    assert m["brand"] == "isom" and m["duration_ms"] == 777


def test_rejects_non_video_bytes():
    assert C.mp4_meta(b"not an mp4 at all") is None
    assert C.h264_meta(b"plain text here") is None


def test_corrupt_sps_yields_nulls_not_exceptions():
    """A structurally valid stream with a truncated/corrupt SPS must
    degrade to NULL SPS-derived fields, never raise (a raise inside
    the mapInPandas kernel would fail the whole Spark task)."""
    # annex-B: SPS NAL cut to 2 bytes (header survives, payload gone)
    sc = b"\x00\x00\x00\x01"
    good = C.encode_annexb(322, 238, 5)
    sps_nal = good.split(sc)[1]
    b = sc + sps_nal[:2] + sc.join([b""] + good.split(sc)[2:])
    m = C.h264_meta(b)
    assert m is not None and m["n_frames"] == 5
    assert m["width"] is None and m["height"] is None

    # mp4: corrupt the avcC SPS payload bytes in-place
    v = bytearray(C.encode_mp4(330, 190, 1000))
    i = bytes(v).find(b"avcC")
    assert i > 0
    # overwrite the embedded SPS length with an absurd value so the
    # slice truncates and parse_sps sees garbage
    ln_at = i + 4 + 6
    v[ln_at:ln_at + 2] = struct.pack(">H", 0xFFFF)
    m = C.mp4_meta(bytes(v))
    assert m is not None and m["fmt"] == "mp4"
    # container fields survive; SPS-derived dims fall back or NULL
    assert m["n_tracks"] >= 1
    assert C.sniff(b"") is None
    # truncated mp4: ftyp present, moov missing -> metadata NULLs,
    # no crash
    v = C.encode_mp4(64, 48, 500)
    m = C.mp4_meta(v[:24])
    assert m is not None and m["duration_ms"] is None


def test_spark_mp4_pipeline(spark):
    """synth_mp4 -> mp4_meta_real matches the synth arithmetic for
    every doc id (the mm09 gate contract, in miniature)."""
    from nowdb_spark.operators import multimodal as M

    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in
           M.mp4_meta_real(M.synth_mp4(df)).collect()}
    assert len(got) == 40
    for d in range(40):
        r = got[d]
        assert r["fmt"] == "mp4" and r["brand"] == "isom"
        assert r["width"] == 16 * (d % 20 + 2) - 2 * (d % 4)
        assert r["height"] == 16 * (d % 12 + 2) - 2 * (d % 3)
        assert r["duration_ms"] == (d % 50 + 1) * 200
        assert r["profile_idc"] == (66, 77, 100)[d % 3]
        assert r["level_idc"] == 30 + d % 3
        assert r["channels"] == 1 + d % 2
        assert r["sample_rate"] == (44100, 48000, 32000)[d % 3]


def test_spark_h264_annexb(spark):
    """Raw Annex-B payloads through h264_meta_real; junk rows yield
    NULLs in the same frame."""
    from pyspark.sql import functions as F

    from nowdb_spark.operators import multimodal as M

    rows = [(0, C.encode_annexb(64, 48, 5, gop=2)),
            (1, C.encode_annexb(322, 238, 7, gop=3, profile=100)),
            (2, b"junk bytes")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in M.h264_meta_real(df).collect()}
    assert got[0]["n_frames"] == 5 and got[0]["n_idr"] == 3
    assert got[1]["width"] == 322 and got[1]["profile_idc"] == 100
    assert got[2]["fmt"] is None and got[2]["width"] is None
    assert M.h264_meta_real(df).where(F.col("fmt").isNull()).count() == 1


def test_ipcm_roundtrip_multi_mb():
    c = make_mp4_codec()

    def mk(seed):
        return {"y": bytes((seed * 3 + i * 7) % 256 for i in range(256)),
                "cb": bytes((seed + j * 3) % 256 for j in range(64)),
                "cr": bytes((seed * 7 + j) % 256 for j in range(64))}

    mbs = [mk(5), mk(9)]
    b = c.encode_ipcm(mbs, 2, 1, qp_delta=-2, idr_pic_id=3,
                      frame_num=1)
    d = c.decode_ipcm(b)
    assert (d["width"], d["height"]) == (32, 16)
    assert (d["qp"], d["idr_pic_id"], d["frame_num"]) == (24, 3, 1)
    assert d["mbs"] == mbs


def test_ipcm_zero_runs_exercise_epb():
    c = make_mp4_codec()
    z = {"y": bytes(256), "cb": bytes(64), "cr": bytes(64)}
    b = c.encode_ipcm([z], 1, 1)
    # zero sample runs MUST produce real emulation-prevention escapes
    assert b"\x00\x00\x03" in b[22:]
    assert c.decode_ipcm(b)["mbs"][0] == z


def test_ipcm_honest_gates():
    import pytest

    c = make_mp4_codec()
    # the metadata-fixture stream has stub slices (no real slice
    # header) — a clean ValueError, never a raw IndexError
    with pytest.raises(ValueError, match="truncated slice"):
        c.decode_ipcm(c.encode_annexb(32, 16, 1))
    with pytest.raises(ValueError, match="not an Annex-B"):
        c.decode_ipcm(b"RIFFxxxx")
    # a CABAC PPS must hit the entropy gate: rebuild the stream with
    # entropy_coding_mode=1 spliced into the PPS payload
    good = c.encode_ipcm(
        [{"y": bytes(range(256)), "cb": bytes(64), "cr": bytes(64)}],
        1, 1)
    # PPS NAL: starts after the 2nd start code; its 2nd payload byte
    # carries pps_id/sps_id/entropy bits (ue(0) ue(0) u(1) = '111')
    i = good.index(b"\x00\x00\x00\x01\x68") + 4    # PPS header byte
    bad = bytearray(good)
    bad[i + 1] ^= 0b00100000                 # flip entropy bit
    with pytest.raises(NotImplementedError, match="CABAC"):
        c.decode_ipcm(bytes(bad))


def test_ipcm_non_pcm_mb_gate():
    import pytest

    c = make_mp4_codec()
    good = c.encode_ipcm(
        [{"y": bytes(range(256)), "cb": bytes(64), "cr": bytes(64)}],
        1, 1)
    # splice a non-I_PCM mb_type: rebuild the slice with mb_type 0
    # by re-encoding manually is intrusive; instead flip bits right
    # where mb_type ue(25) sits — the decoder must refuse with the
    # honest gate, whatever the flipped value parses as
    # for this fixture (frame_num=0, idr=0, qp_delta=0) the slice
    # header is exactly 21 bits, so mb_type's ue starts at payload
    # bit 21 (byte 2, bit 5); setting it to 1 makes mb_type parse as
    # 0 = I_4x4 — an entropy-coded type the decoder must refuse
    i = good.rindex(b"\x00\x00\x00\x01\x65") + 5   # payload start
    bad = bytearray(good)
    bad[i + 2] |= 0x04
    with pytest.raises(NotImplementedError, match="mb_type 0"):
        c.decode_ipcm(bytes(bad))


def test_parse_sps_slice_fields():
    c = make_mp4_codec()
    sps = c.parse_sps(c.encode_sps(48, 32))
    assert sps["log2_max_frame_num"] == 4
    assert sps["pic_order_cnt_type"] == 0
    assert sps["log2_max_poc_lsb"] == 4
    assert (sps["pic_width_in_mbs"], sps["pic_height_in_mbs"]) == (3, 2)
    assert sps["frame_mbs_only"] == 1
