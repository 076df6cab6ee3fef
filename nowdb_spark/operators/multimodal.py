"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Real decode paths, all pure-Python/numpy/stdlib: images
BMP/PPM/PNG/GIF/JPEG (`imagecodec.py` + `jpegcodec.py`; PNG is a
zlib/DEFLATE entropy path, GIF a from-scratch variable-width LZW
decoder, JPEG a baseline+progressive Huffman-DCT decoder), audio RIFF/PCM WAV
(`audiocodec.py`), video Y4M planar YUV with temporal frame sampling
(`videocodec.py`), MP3 frame headers + AAC-ADTS + FLAC STREAMINFO
behind a unified audio sniff (`audiocodec.py`), FULL FLAC sample
decode (`flaccodec.py`: Rice residuals, fixed/LPC prediction, stereo
decorrelation, CRC-verified frames), and the MP4 container + H.264
SPS layer (`mp4codec.py`: ISO BMFF box walk, avcC, Exp-Golomb SPS
parse — coded dims/profile/level, Annex-B NAL census).
What still needs codec LIBS (H.264/VP9 SAMPLE decode — the
CABAC/CAVLC entropy + prediction layer — MP3/AAC spectral synthesis,
WebP, arithmetic-coded JPEG) stays honestly stubbed behind
`_HAVE_CODECS`: the Spark-side
plumbing (binary schema, Arrow batch shape, mapInPandas signature,
partitioning) is real and tested; swap `_fake_decode` for a
PIL/libav call and nothing else changes.

Design for 100 TB of media: binary payloads stay in their partition
(mapInPandas = narrow, zero shuffle); metadata extraction emits small
typed rows; frame sampling / resize emit binary again. Batch size is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch — lower it for
large blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real codecs are not in this container — keep the import gated
    import PIL.Image  # type: ignore # noqa: F401
    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

META_SCHEMA = ("doc_id long, n_bytes long, fake_width long, "
               "fake_height long, fmt string")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height, format) purely from the byte length so oracles can
    reproduce it. Replace with a real decoder when codecs exist."""
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 64 + 1,
        "fake_height": (n // 64) % 64 + 1,
        "fmt": "fake/raw",
    }


def decode_image(payload: bytes):
    """Real decode entry point. BMP/PPM/PNG (zlib/DEFLATE)/GIF (LZW),
    JPEG — baseline, progressive (SOF2) AND sequential arithmetic
    (SOF9, T.81 QM coder), any 4:4:4/4:2:2/4:2:0 sampling — and
    WebP-LOSSLESS (VP8L: Huffman+LZ77, color cache, all four
    transforms) decode via the vendored pure-Python codecs; remaining
    formats (lossy VP8 WebP, progressive-arithmetic JPEG, …) need
    codec libs (absent in this container) and raise honestly."""
    from nowdb_spark.operators.imagecodec import CODEC
    from nowdb_spark.operators.webpcodec import WEBP_CODEC

    img = CODEC.decode(payload)
    if img is not None:
        return img
    img = WEBP_CODEC.decode(payload)
    if img is not None:
        return img
    if not _HAVE_CODECS:
        raise NotImplementedError(
            "BMP/PPM/PNG/GIF/JPEG (baseline+progressive)/VP8L decode "
            "without codec libs; metadata plumbing for other formats "
            "uses _fake_decode")
    raise NotImplementedError("wire to PIL.Image.open(io.BytesIO(payload))")


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture an opaque binary column from text (the testdata has
    no real media; utf-8 bytes stand in for an encoded image)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_meta(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """mapInPandas metadata extraction over binary payloads.

    Narrow (per-partition) operation: Arrow ships (id, binary) batches
    to Python, the kernel emits typed metadata rows.
    """
    # NOTE: the kernel must be closure-self-contained (no references
    # to module globals) — executors unpickle it without having
    # nowdb_spark importable when the engine is used as a path-added
    # library rather than an installed package.
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def fake_decode(b: bytes) -> dict:
            n = len(b)
            return {"n_bytes": n, "fake_width": n % 64 + 1,
                    "fake_height": (n // 64) % 64 + 1, "fmt": "fake/raw"}

        for pdf in batches:
            metas = pdf[payload_col].map(lambda b: fake_decode(bytes(b)))
            out = _pd.DataFrame(list(metas))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(kernel, META_SCHEMA)


def resize_image(df: DataFrame, width: int = 32, height: int = 32,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """'Resize' plumbing: binary in → binary out at a fixed target
    size (width*height bytes — what a thumbnailer's output shape looks
    like). The deterministic fake truncates/cycles payload bytes to
    the target length; a real implementation swaps in PIL resize and
    nothing else changes. Narrow, zero-shuffle."""
    schema = f"{id_col} long, resized binary, out_w int, out_h int"
    target = width * height

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def fake_resize(b: bytes) -> bytes:
            if not b:
                return bytes(target)
            reps = target // len(b) + 1
            return (b * reps)[:target]

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "resized": [fake_resize(bytes(b))
                            for b in pdf[payload_col]],
                "out_w": width,
                "out_h": height,
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def feature_extract(df: DataFrame, dim: int = 16,
                    id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Binary → fixed-dim float feature vector (the embedding-
    extraction plumbing: array<float> column, Arrow-batched, narrow).
    The deterministic fake folds a rolling byte hash into `dim`
    buckets and L2-normalizes; a real model inference call has the
    same signature and batch shape."""
    schema = f"{id_col} long, features array<float>"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as _pd

        def fake_features(b: bytes) -> list:
            acc = [0.0] * dim
            h = 2166136261
            for i, byte in enumerate(b):
                h = (h ^ byte) * 16777619 % (1 << 32)
                acc[i % dim] += (h % 1000) / 1000.0
            norm = math.sqrt(sum(v * v for v in acc)) or 1.0
            return [v / norm for v in acc]

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "features": [fake_features(bytes(b))
                             for b in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


REAL_META_SCHEMA = ("doc_id long, fmt string, width int, height int, "
                    "n_bytes long, px_check long")


def synth_images(df: DataFrame, id_col: str = "doc_id",
                 formats: tuple = ("bmp", "ppm")) -> DataFrame:
    """Synthesize deterministic image payloads from an id column.

    Oracle-harness companion to the REAL decode path: pixel values are
    a pure function of (id, x, y), so a SQL oracle can recompute what
    the decoder must read back from the actual encoded bytes — format
    = formats[id % len(formats)] (default parity split bmp/ppm; pass
    ("bmp", "ppm", "png") to include the zlib/DEFLATE path, whose
    encoder cycles all five PNG scanline filters). Dimensions:
    w = id % 12 + 2, h = id % 7 + 2; pixel (x, y) =
    ((id+3x+7y) % 256, (2id+5x+y) % 256, (id+x*y) % 256).
    """
    from nowdb_spark.operators.imagecodec import make_image_codec

    codec = make_image_codec()        # closures ship by value (driver)
    schema = f"{id_col} long, payload binary"
    fmts = tuple(formats)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            w, h = did % 12 + 2, did % 7 + 2
            rows = [[((did + 3 * x + 7 * y) % 256,
                      (2 * did + 5 * x + y) % 256,
                      (did + x * y) % 256) for x in range(w)]
                    for y in range(h)]
            fmt = fmts[did % len(fmts)]
            if fmt == "bmp":
                return codec.encode_bmp(w, h, rows)
            if fmt == "png":
                return codec.encode_png(w, h, rows)
            if fmt == "gif":
                return codec.encode_gif(w, h, rows)
            return codec.encode_ppm(w, h, rows)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def synth_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize deterministic PCM16 WAV payloads from an id column
    (audio analogue of synth_images): n = id % 50 + 10 samples at
    8 kHz, sample i = ((id*7 + i*13) % 4001) - 2000 — pure integer
    arithmetic a SQL oracle replays exactly."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            n = did % 50 + 10
            samples = [((did * 7 + i * 13) % 4001) - 2000
                       for i in range(n)]
            return codec.encode_wav(samples, rate=8000, bits=16)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def synth_mp3(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize deterministic MP3 frame-header streams from an id
    column: MPEG1 Layer III, sample-rate index id % 3, mono when
    id % 2 = 1, id % 20 + 5 frames whose bitrate index cycles
    (id + j) % 14 + 1 with padding bit (id + j) % 2; every fifth id
    gets an ID3v2 tag of id % 32 zero bytes to exercise the syncsafe
    skip. Headers are real MP3 structure; audio slots are zeros (the
    metadata layer is the decoded surface — see audiocodec.py)."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            frames = [((did + j) % 14 + 1, (did + j) % 2)
                      for j in range(did % 20 + 5)]
            return codec.encode_mp3_frames(
                frames, version="1", sr_idx=did % 3,
                channels=1 if did % 2 else 2,
                id3_pad=(did % 32) if did % 5 == 0 else 0)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def mp3_meta_real(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """REAL MP3 frame-header metadata: ID3v2 skip, sync walk, per-
    frame header parse — VBR-aware average bitrate, duration from the
    frame count, channel mode. Bytes that are not an MP3 stream yield
    NULLs. Narrow, zero-shuffle (audiocodec.py mp3_meta)."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, fmt string, version string, "
              "channels long, sample_rate long, n_frames long, "
              "duration_ms long, bitrate_kbps long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = codec.mp3_meta(bytes(payload))
                if m is None:
                    out.append((int(did), None, None, None, None,
                                None, None, None))
                else:
                    out.append((int(did), m["fmt"], m["version"],
                                m["channels"], m["sample_rate"],
                                m["n_frames"], m["duration_ms"],
                                m["bitrate_kbps"]))
            yield _pd.DataFrame(out, columns=[
                id_col, "fmt", "version", "channels", "sample_rate",
                "n_frames", "duration_ms", "bitrate_kbps"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_adts_flac(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a MIXED audio corpus from an id column: even ids
    get AAC-ADTS streams (rate index 3+(id%5) → 48000/44100/32000/
    24000/22050 Hz, 1+(id%3) channels, profile (id%12)//4 so object
    type 1..3, id%15+3 frames of (id//2)%2 extra raw-data-blocks,
    payload id%50+10 bytes/frame), odd ids get FLAC files
    (rate [8000,16000,22050,24000,32000,44100,48000][id%7],
    1+(id%5) channels, 8*((id%6)//2+1) bits, (id%997+1)*64 total
    samples, a PADDING block of id%17 bytes when id%3 = 0). Pure
    integer arithmetic a SQL oracle replays exactly."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"
    flac_rates = (8000, 16000, 22050, 24000, 32000, 44100, 48000)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            if did % 2 == 0:
                return codec.encode_adts(
                    [did % 50 + 10] * (did % 15 + 3),
                    sr_idx=3 + did % 5, channels=1 + did % 3,
                    profile=(did % 12) // 4, rdb=(did // 2) % 2)
            return codec.encode_flac(
                rate=flac_rates[did % 7], channels=1 + did % 5,
                bits=8 * ((did % 6) // 2 + 1),
                total_samples=(did % 997 + 1) * 64,
                pad=(did % 17) if did % 3 == 0 else 0)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def audio_meta_real(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Unified REAL audio metadata: sniff each payload (WAV / FLAC /
    AAC-ADTS / MP3) and dispatch to its parser, emitting one typed
    schema — fields a format does not carry stay NULL (bits is
    WAV/FLAC-only, object_type is AAC-only, n_frames is MP3/AAC-only).
    Undecodable bytes yield an all-NULL row, never a task failure.
    Narrow, zero-shuffle (audiocodec.py)."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, fmt string, channels long, "
              "sample_rate long, bits long, object_type long, "
              "n_frames long, n_samples long, duration_ms long")
    cols = [id_col, "fmt", "channels", "sample_rate", "bits",
            "object_type", "n_frames", "n_samples", "duration_ms"]

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def meta(b: bytes):
            kind = codec.audio_sniff(b)
            if kind == "wav":
                m = codec.decode_meta(b)
                if m:
                    return (m["fmt"], m["channels"], m["sample_rate"],
                            m["bits"], None, None, m["n_samples"],
                            m["n_samples"] * 1000 // m["sample_rate"])
            elif kind == "flac":
                m = codec.flac_meta(b)
                if m:
                    return ("flac", m["channels"], m["sample_rate"],
                            m["bits"], None, None, m["n_samples"],
                            m["duration_ms"])
            elif kind == "aac":
                m = codec.aac_meta(b)
                if m:
                    return ("aac", m["channels"], m["sample_rate"],
                            None, m["object_type"], m["n_frames"],
                            m["n_samples"], m["duration_ms"])
            elif kind == "mp3":
                m = codec.mp3_meta(b)
                if m:
                    spf = 1152 if m["version"] == "1" else 576
                    return ("mp3", m["channels"], m["sample_rate"],
                            None, None, m["n_frames"],
                            m["n_frames"] * spf, m["duration_ms"])
            elif kind == "ogg":
                m = codec.ogg_opus_meta(b)
                if m:
                    # n_frames carries the page count; sample count
                    # is not knowable from metadata (packet TOCs)
                    return ("opus", m["channels"],
                            m["input_sample_rate"], None, None,
                            m["n_pages"], None, m["duration_ms"])
            return (None,) * 8

        for pdf in batches:
            out = [(int(did),) + meta(bytes(p))
                   for did, p in zip(pdf[id_col], pdf[payload_col])]
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_png_tagged(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize real PNGs carrying textual metadata: a 2×1 image
    plus the first id%3+1 of [Title=t{id}, Author=a{id%7},
    Page={id%20}] as tEXt (even ids) or deflated zTXt (odd ids) —
    the PNG member of the tag-metadata trio (mm14 OpusTags / mm16
    ID3v2 / mm18 PNG)."""
    from nowdb_spark.operators.imagecodec import make_image_codec

    codec = make_image_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            rows = [[(did % 256, (did * 3) % 256, (did * 7) % 256),
                     ((did * 5) % 256, 0, 255)]]
            png = codec.encode_png(2, 1, rows)
            tags = [("Title", f"t{did}"), ("Author", f"a{did % 7}"),
                    ("Page", str(did % 20))][:did % 3 + 1]
            return codec.png_add_text(png, tags,
                                      compressed=bool(did % 2))

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def png_text_real(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """REAL PNG textual-metadata extraction (imagecodec.py png_text:
    CRC-verified chunk walk, tEXt/zTXt/iTXt). One row per entry
    (doc_id, tag_pos, key, value); non-PNG bytes yield nothing."""
    from nowdb_spark.operators.imagecodec import make_image_codec

    codec = make_image_codec()
    schema = (f"{id_col} long, tag_pos long, key string, "
              "value string")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                t = codec.png_text(bytes(payload))
                if t is None:
                    continue
                for pos, (k, v) in enumerate(t):
                    out.append((int(did), pos, k, v))
            yield _pd.DataFrame(out, columns=[
                id_col, "tag_pos", "key", "value"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_tiffs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL TIFFs from an id column: id%2+1 pages (IFD
    chain), big-endian for odd ids, page p = width 16*(id%40+1)+p,
    height 8*(id%30+1), bits 8/16 by (id+p)%2, compression
    [1,5,7][id%3], photometric (id+p)%4, samples 1+id%4 (3-4 samples
    push BitsPerSample behind an offset)."""
    from nowdb_spark.operators.tiffcodec import make_tiff_codec

    codec = make_tiff_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            pages = [{
                "width": 16 * (did % 40 + 1) + p,
                "height": 8 * (did % 30 + 1),
                "bits": 8 if (did + p) % 2 == 0 else 16,
                "compression": (1, 5, 7)[did % 3],
                "photometric": (did + p) % 4,
                "samples": 1 + did % 4,
            } for p in range(did % 2 + 1)]
            return codec.encode_tiff(pages, big_endian=bool(did % 2))

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def tiff_meta_real(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """REAL TIFF metadata (tiffcodec.py: header/byte-order, IFD
    chain, inline vs offset values). One row per page; non-TIFF
    bytes yield nothing. Narrow, zero-shuffle."""
    from nowdb_spark.operators.tiffcodec import make_tiff_codec

    codec = make_tiff_codec()
    schema = (f"{id_col} long, page long, width long, height long, "
              "bits long, compression long, photometric long, "
              "samples long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = codec.tiff_meta(bytes(payload))
                if m is None:
                    continue
                for rec in m:
                    out.append((int(did), rec["page"], rec["width"],
                                rec["height"], rec["bits"],
                                rec["compression"],
                                rec["photometric"], rec["samples"]))
            yield _pd.DataFrame(out, columns=[
                id_col, "page", "width", "height", "bits",
                "compression", "photometric", "samples"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_tiff_rasters(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL raster TIFFs (strip data, not just IFDs) from
    an id column: w=6+id%11, h=4+id%9, samples 1 (gray) or 3 (RGB) by
    id%2, compression cycling [none, PackBits, LZW] by id%3 with
    Predictor 2 on odd-id LZW files, big-endian for odd ids, ~3
    strips per image; pixel (x,y,ch) = (id*3+x*7+y*11+ch*5)%256."""
    from nowdb_spark.operators.tiffcodec import make_tiff_codec

    codec = make_tiff_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            w, h = 6 + did % 11, 4 + did % 9
            samples = 1 + 2 * (did % 2)
            comp = (1, 32773, 5)[did % 3]
            pred = 2 if (comp == 5 and did % 2 == 1) else 1
            px = bytes((did * 3 + x * 7 + y * 11 + s * 5) % 256
                       for y in range(h) for x in range(w)
                       for s in range(samples))
            return codec.encode_tiff_pixels(
                [{"width": w, "height": h, "samples": samples,
                  "compression": comp, "predictor": pred,
                  "pixels": px}],
                big_endian=bool(did % 2))

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def tiff_decode_real(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """REAL TIFF raster decode (tiffcodec.py pixel layer: strip walk
    via StripOffsets/ByteCounts, PackBits + TIFF-LZW with the early
    width change, Predictor 2 reversal) to exact integer features:
    dims, the position-weighted px_check = Σ(i+1)·vᵢ over the
    interleaved bytes, and the value sum. Non-TIFF / unsupported-
    compression payloads yield NULLs, never a task failure. Narrow,
    zero-shuffle; one row per decoded page."""
    from nowdb_spark.operators.tiffcodec import make_tiff_codec

    codec = make_tiff_codec()
    schema = (f"{id_col} long, page long, width long, height long, "
              "samples long, compression long, predictor long, "
              "n_px long, px_check long, v_sum long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    pages = codec.tiff_pixels(bytes(payload))
                except (ValueError, _struct.error):
                    pages = None
                if not pages:
                    out.append((int(did),) + (None,) * 9)
                    continue
                for g in pages:
                    v = _np.frombuffer(g["pixels"], dtype=_np.uint8)
                    v64 = v.astype(_np.int64)
                    out.append((
                        int(did), g["page"], g["width"], g["height"],
                        g["samples"], g["compression"], g["predictor"],
                        int(v.size),
                        int((v64 * (_np.arange(v.size) + 1)).sum()),
                        int(v64.sum())))
            yield _pd.DataFrame(out, columns=[
                id_col, "page", "width", "height", "samples",
                "compression", "predictor", "n_px", "px_check",
                "v_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_pdfs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL PDFs from an id column: id%2+1 pages, page p
    carrying (id+p)%3+1 lines 'd{id} p{p} l{k} (x)\\y' (parens +
    backslash exercise literal-string escaping), odd lines rendered
    as kerned TJ arrays split mid-line, streams Flate-compressed for
    odd ids — correct xref/page tree throughout."""
    from nowdb_spark.operators.pdfcodec import make_pdf_codec

    codec = make_pdf_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            pages = [[f"d{did} p{p} l{k} (x)\\y"
                      for k in range((did + p) % 3 + 1)]
                     for p in range(did % 2 + 1)]
            return codec.encode_pdf(pages, flate=bool(did % 2),
                                    tj_split=True)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def pdf_text_real(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """REAL PDF text extraction (pdfcodec.py: object scan, Flate
    streams, page-tree walk, Tj/TJ/' tokenization with full literal-
    string unescaping). One row per page (doc_id, page, text);
    non-PDF bytes yield nothing. Narrow, zero-shuffle."""
    from nowdb_spark.operators.pdfcodec import make_pdf_codec

    codec = make_pdf_codec()
    schema = f"{id_col} long, page long, text string"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                texts = codec.extract_text(bytes(payload))
                if texts is None:
                    continue
                for p, t in enumerate(texts):
                    out.append((int(did), p, t))
            yield _pd.DataFrame(out, columns=[id_col, "page", "text"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_epubs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL EPUBs from an id column: id%3+1 chapters,
    chapter c = '<p>d{id} ch{c} &amp; body</p>' (entity exercises the
    shared HTML transform); zip member order is reversed vs the spine
    so extraction must follow the OPF."""
    from nowdb_spark.operators.epubcodec import make_epub_codec

    codec = make_epub_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            return codec.encode_epub(
                [f"<p>d{did} ch{c} &amp; body</p>"
                 for c in range(did % 3 + 1)])

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def epub_text_real(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """REAL EPUB text extraction (epubcodec.py: zip container →
    container.xml → OPF manifest/spine → XHTML chapters through the
    shared html_to_text transform). One row per chapter
    (doc_id, chapter, text); non-EPUB bytes yield nothing."""
    from nowdb_spark.operators.epubcodec import make_epub_codec

    codec = make_epub_codec()
    schema = f"{id_col} long, chapter long, text string"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                texts = codec.extract_text(bytes(payload))
                if texts is None:
                    continue
                for ch, t in enumerate(texts):
                    out.append((int(did), ch, t))
            yield _pd.DataFrame(out, columns=[id_col, "chapter",
                                              "text"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_docx(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL DOCX files from an id column: id%4+1
    paragraphs, paragraph k = 'd{id} p{k} a&b <q> t\\tend{(id+k)%10}'
    — the entities exercise XML escaping, the tab becomes a real
    <w:tab/> element, and paragraph k is split into k%3+1 runs so
    extraction must re-join <w:t> fragments."""
    from nowdb_spark.operators.docxcodec import make_docx_codec

    codec = make_docx_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            return codec.encode_docx(
                [f"d{did} p{k} a&b <q> t\tend{(did + k) % 10}"
                 for k in range(did % 4 + 1)])

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def docx_text_real(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """REAL DOCX text extraction (docxcodec.py: zip container →
    word/document.xml → paragraph walk joining split <w:t> runs,
    mapping <w:tab/>/<w:br/>, unescaping entities). One row per
    paragraph (doc_id, para, text); non-DOCX bytes yield nothing."""
    from nowdb_spark.operators.docxcodec import make_docx_codec

    codec = make_docx_codec()
    schema = f"{id_col} long, para long, text string"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                paras = codec.extract_paras(bytes(payload))
                if paras is None:
                    continue
                for k, t in enumerate(paras):
                    out.append((int(did), k, t))
            yield _pd.DataFrame(out, columns=[id_col, "para", "text"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_adpcm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize mono IMA-ADPCM WAV payloads from an id column:
    (id%30+10)*2 nibbles nib_j = (id*7 + j*3) % 16, initial predictor
    ((id*31)%4001)-2000, initial step index id%89, 8 kHz. The nibble
    stream is synthetic; the decode walk over it is the REAL stateful
    IMA algorithm — and because each step is table arithmetic, a SQL
    list_reduce replays the whole state machine."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            nibs = [(did * 7 + j * 3) % 16
                    for j in range((did % 30 + 10) * 2)]
            return codec.encode_wav_adpcm(
                nibs, predictor=((did * 31) % 4001) - 2000,
                index=did % 89, rate=8000)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def synth_g711(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize G.711 companded WAV payloads from an id column:
    n = id%50+20 encoded bytes b_i = (id*13 + i*7) % 256, µ-law
    (fmt tag 7) for even ids, A-law (fmt tag 6) for odd, mono 8 kHz.
    The companded byte stream is pure arithmetic, and the expansion
    formulas are closed-form per byte — so the oracle replays decode
    END-TO-END in SQL."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            enc = bytes((did * 13 + i * 7) % 256
                        for i in range(did % 50 + 20))
            return codec.encode_wav(enc, rate=8000,
                                    audio_fmt=7 if did % 2 == 0 else 6)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def synth_mp3_tagged(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize MP3 streams with REAL ID3v2 tags: the first id%3+1
    of [TIT2=t{id}, TPE1=a{id%7}, TRCK={id%20}] (mirroring the
    OpusTags synth so tag metadata is comparable across container
    families), ID3v2.4 for even ids / v2.3 for odd (syncsafe vs plain
    frame sizes), followed by id%5+2 real frame headers."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            tags = [("TIT2", f"t{did}"), ("TPE1", f"a{did % 7}"),
                    ("TRCK", str(did % 20))][:did % 3 + 1]
            return (codec.encode_id3(tags,
                                     major=4 if did % 2 == 0 else 3)
                    + codec.encode_mp3_frames(
                        [((did + j) % 14 + 1, 0)
                         for j in range(did % 5 + 2)], version="1"))

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def id3_tags_real(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """REAL ID3v2 text-frame extraction (audiocodec.py id3_tags:
    v2.3/v2.4 frame walk, syncsafe vs plain sizes, latin-1/UTF-16/
    UTF-8 text encodings). One row per frame (doc_id, tag_pos, key,
    value); untagged bytes yield nothing."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, tag_pos long, key string, "
              "value string")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                t = codec.id3_tags(bytes(payload))
                if t is None:
                    continue
                for pos, (k, v) in enumerate(t):
                    out.append((int(did), pos, k, v))
            yield _pd.DataFrame(out, columns=[
                id_col, "tag_pos", "key", "value"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_opus(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL Ogg/Opus streams from an id column (CRC-
    stamped pages: BOS OpusHead + OpusTags + id%10+2 audio pages of
    (id%5+1)*960 48 kHz samples): 1+id%2 channels, pre-skip
    id%400+100, informational input rate [8000,16000,24000,48000]
    [id%4]."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"
    rates = (8000, 16000, 24000, 48000)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            tags = [f"TITLE=t{did}", f"ARTIST=a{did % 7}",
                    f"TRACKNUMBER={did % 20}"][:did % 3 + 1]
            return codec.encode_ogg_opus(
                channels=1 + did % 2, pre_skip=did % 400 + 100,
                input_rate=rates[did % 4],
                n_audio_pages=did % 10 + 2,
                samples_per_page=(did % 5 + 1) * 960,
                comments=tags)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def opus_tags_real(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """REAL OpusTags (Vorbis-comment) extraction: CRC-verified page
    walk to the second packet, vendor + length-prefixed KEY=value
    list, keys upcased per RFC 7845 §5.2. One row per comment
    (doc_id, tag_pos, key, value); non-Ogg bytes yield nothing."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, tag_pos long, key string, "
              "value string")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                t = codec.ogg_opus_tags(bytes(payload))
                if t is None:
                    continue
                for pos, (k, v) in enumerate(t["comments"]):
                    out.append((int(did), pos, k, v))
            yield _pd.DataFrame(out, columns=[
                id_col, "tag_pos", "key", "value"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def opus_meta_real(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """REAL Ogg/Opus metadata: page walk with per-page CRC-32
    verification + OpusHead parse (audiocodec.py ogg_opus_meta).
    Non-Ogg bytes yield NULLs. Narrow, zero-shuffle."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, fmt string, channels long, "
              "pre_skip long, input_sample_rate long, n_pages long, "
              "duration_ms long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = codec.ogg_opus_meta(bytes(payload))
                if m is None:
                    out.append((int(did),) + (None,) * 6)
                else:
                    out.append((int(did), m["fmt"], m["channels"],
                                m["pre_skip"],
                                m["input_sample_rate"], m["n_pages"],
                                m["duration_ms"]))
            yield _pd.DataFrame(out, columns=[
                id_col, "fmt", "channels", "pre_skip",
                "input_sample_rate", "n_pages", "duration_ms"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def h264_samples_real(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL H.264 SAMPLE decode for the one macroblock type the
    standard carries uncoded — I_PCM (14496-10 §7.3.5, mb_type 25):
    Annex-B NAL walk, SPS/PPS parse, full §7.3.3 slice-header walk
    (Exp-Golomb with SPS-derived bit widths), per-MB PCM byte-aligned
    sample extraction through emulation-prevention stripping. Emits
    one row per macroblock with position-weighted luma/chroma
    checksums + the slice-header fields (qp, frame_num, idr_pic_id).
    Entropy-coded macroblocks (CAVLC/CABAC residuals) stay honestly
    gated with NotImplementedError. Narrow kernel."""
    from nowdb_spark.operators.mp4codec import make_mp4_codec

    codec = make_mp4_codec()
    schema = (f"{id_col} long, mb long, width long, height long, "
              "qp long, frame_num long, idr_pic_id long, "
              "y_check long, cb_check long, cr_check long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "mb", "width", "height", "qp", "frame_num",
                "idr_pic_id", "y_check", "cb_check", "cr_check"]

        def check(b: bytes) -> int:
            return sum((i + 1) * v for i, v in enumerate(b))

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                d = codec.decode_ipcm(bytes(payload))
                for mi, mb in enumerate(d["mbs"]):
                    out.append((int(did), mi, d["width"],
                                d["height"], d["qp"],
                                d["frame_num"], d["idr_pic_id"],
                                check(mb["y"]), check(mb["cb"]),
                                check(mb["cr"])))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def phash_real(df: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """Perceptual image hash (pHash, 8×8 DCT variant) over REAL
    decoded images — visual near-dup dedup for image corpora.

    Per image: decode → BT.601 integer luma ((299r+587g+114b)//1000)
    → 2×2 mean downsample to 8×8 → orthonormal 2D DCT-II (the
    dct8_basis constants, inlined identically into the SQL oracle) →
    coefficients rounded to 4dp (makes the bit threshold
    cross-engine-deterministic) → 63 AC bits vs their median (odd
    count ⇒ the exact middle order statistic, no interpolation).
    Returns (id, phash) with phash a 63-char '0'/'1' string; clones
    and near-identical images collide. 16×16 inputs only (the
    fixture contract); other sizes yield NULL. Narrow kernel."""
    from nowdb_spark.operators.dsp import dct8_basis
    from nowdb_spark.operators.imagecodec import make_image_codec

    codec = make_image_codec()
    basis = dct8_basis()
    schema = f"{id_col} long, phash string"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        C = _np.array(basis)               # (8, 8)
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                img = codec.decode(bytes(payload))
                if (img is None or img["width"] != 16
                        or img["height"] != 16):
                    out.append((did, None))
                    continue
                px = _np.array(img["rows"], dtype=_np.int64)  # (16,16,3)
                luma = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                        + 114 * px[:, :, 2]) // 1000
                p8 = (luma[0::2, 0::2] + luma[0::2, 1::2]
                      + luma[1::2, 0::2] + luma[1::2, 1::2]) // 4
                cf = _np.round(C @ p8.astype(_np.float64) @ C.T, 4)
                ac = cf.ravel()[1:]
                med = _np.median(ac)
                bits = "".join("1" if x > med else "0" for x in ac)
                out.append((did, bits))
            yield _pd.DataFrame(out, columns=[id_col, "phash"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_vorbis(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL Ogg/Vorbis streams from an id column: the
    three mandated headers (ident/comment/setup) + id%6+1 audio
    pages of 1024 PCM samples; 1+id%2 channels, rate
    [8000,16000,22050,44100][id%4], nominal bitrate (id%10+1)·16000,
    comments = first id%2+1 of [TITLE=v{id}, ARTIST=a{id%5}]."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"
    rates = (8000, 16000, 22050, 44100)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            tags = [f"TITLE=v{did}", f"ARTIST=a{did % 5}"][:did % 2 + 1]
            return codec.encode_ogg_vorbis(
                channels=1 + did % 2, rate=rates[did % 4],
                bitrate_nominal=(did % 10 + 1) * 16000,
                n_audio_pages=did % 6 + 1,
                samples_per_page=1024, comments=tags)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def vorbis_meta_real(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """REAL Ogg/Vorbis metadata + comment extraction in one pass:
    CRC-verified page walk, identification-header parse (Vorbis I
    §4.2.2: version/channels/rate/bitrates/blocksizes/framing bit),
    PCM-granule duration, and the comment header's vendor + tag
    count + TITLE value. One row per stream; non-Vorbis bytes yield
    NULL fields. Narrow, zero-shuffle."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, channels long, sample_rate long, "
              "bitrate_nominal long, blocksize_0 long, "
              "blocksize_1 long, n_pages long, duration_ms long, "
              "vendor string, n_tags long, title string")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "channels", "sample_rate", "bitrate_nominal",
                "blocksize_0", "blocksize_1", "n_pages",
                "duration_ms", "vendor", "n_tags", "title"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                m = codec.ogg_vorbis_meta(b)
                if m is None:
                    out.append((int(did),) + (None,) * 10)
                    continue
                t = codec.ogg_vorbis_tags(b)
                title = None
                if t is not None:
                    title = dict(t["comments"]).get("TITLE")
                out.append((int(did), m["channels"],
                            m["sample_rate"], m["bitrate_nominal"],
                            m["blocksize_0"], m["blocksize_1"],
                            m["n_pages"], m["duration_ms"],
                            t["vendor"] if t else None,
                            len(t["comments"]) if t else None,
                            title))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_flac_files(df: DataFrame, id_col: str = "doc_id",
                     n_samples: int | None = None) -> DataFrame:
    """Synthesize REAL FLAC files from an id column: n = id%50+10
    samples per channel, channel 1 s_i = ((id*7+i*13)%4001)-2000 (the
    synth_audio arithmetic), channel 2 (when 1+id%2 = 2)
    t_i = ((id*11+i*17)%4001)-2000; rate [8000,16000,44100][id%3];
    subframe kind cycles verbatim/fixed1/fixed2/lpc by id%4, stereo
    decorrelation cycles independent/left-side/right-side/mid-side by
    (id//2)%4, rice partition order id%3, block size 16 (multi-frame
    streams) — every decoder path exercised across the corpus.

    ``n_samples`` overrides the per-id length (bench long-clip shape,
    block size 4096 like real encoders); the oracle row uses the
    default id-derived lengths."""
    from nowdb_spark.operators.flaccodec import make_flac_codec

    codec = make_flac_codec()
    schema = f"{id_col} long, payload binary"
    rates = (8000, 16000, 44100)
    kinds = ("verbatim", "fixed1", "fixed2", "lpc")
    modes = ("independent", "left_side", "right_side", "mid_side")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            n = n_samples or (did % 50 + 10)
            chans = [[((did * 7 + i * 13) % 4001) - 2000
                      for i in range(n)]]
            if did % 2:
                chans.append([((did * 11 + i * 17) % 4001) - 2000
                              for i in range(n)])
            return codec.encode(
                chans, rate=rates[did % 3], bits=16,
                block_size=16 if n_samples is None else 4096,
                subframe=kinds[did % 4],
                stereo_mode=modes[(did // 2) % 4],
                rice_partition_order=did % 3)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def flac_features_real(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL FLAC SAMPLE decode (flaccodec.py: frame sync + CRCs,
    Rice-coded residuals, fixed + LPC prediction, stereo
    decorrelation) to exact integer features over the interleaved
    samples. Non-FLAC or corrupt bytes yield NULLs, never a task
    failure. Narrow, zero-shuffle."""
    from nowdb_spark.operators.flaccodec import make_flac_codec

    codec = make_flac_codec()
    schema = (f"{id_col} long, fmt string, channels long, "
              "n_samples long, sample_rate long, duration_ms long, "
              "peak long, sq_sum long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = codec.features(bytes(payload))
                except ValueError:
                    m = None
                if m is None:
                    out.append((int(did),) + (None,) * 7)
                else:
                    out.append((int(did), "flac", m["channels"],
                                m["n_samples"], m["sample_rate"],
                                m["duration_ms"], m["peak"],
                                m["sq_sum"]))
            yield _pd.DataFrame(out, columns=[
                id_col, "fmt", "channels", "n_samples", "sample_rate",
                "duration_ms", "peak", "sq_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_webps(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL WebP-lossless (VP8L) files from an id column:
    w = 8+id%9, h = 8+id%7. Encoding variant cycles by id%7 —
    0: plain literals + back-references, 1: subtract-green + color
    cache, 2: predictor transform (mode id%14), 3: subtract-green +
    predictor (mode (id//2)%14), 4: color transform (id-derived
    element), 5: color-indexing palette ([2,4,9,16,40][(id//7)%5]
    colors — every bundling width plus unbundled), 6: META PREFIX
    CODES (2 tile-assigned code groups) + cache. Non-palette
    pixels (xx = x//3 so runs exist for LZ77):
      r=(id*3+xx*7+y*11)%256, g=(id*5+xx*13+y*3)%256,
      b=(id*7+xx*3+y*5)%256, a=255-((id+x+y)%2)
    palette entry i: r=(id*3+i*17)%256, g=(id*5+i*29)%256,
    b=(id*7+i*43)%256, a=255; index (x//2 + y + id) % n_colors."""
    from nowdb_spark.operators.webpcodec import make_webp_codec

    codec = make_webp_codec()
    schema = f"{id_col} long, payload binary"
    pal_sizes = (2, 4, 9, 16, 40)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            w, h = 8 + did % 9, 8 + did % 7
            v = did % 7
            px = []
            if v == 5:
                nc = pal_sizes[(did // 7) % 5]
                pal = [0xFF000000
                       | (((did * 3 + i * 17) % 256) << 16)
                       | (((did * 5 + i * 29) % 256) << 8)
                       | ((did * 7 + i * 43) % 256)
                       for i in range(nc)]
                for y in range(h):
                    for x in range(w):
                        px.append(pal[(x // 2 + y + did) % nc])
                return codec.encode(px, w, h, transform="palette")
            for y in range(h):
                for x in range(w):
                    xx = x // 3
                    r = (did * 3 + xx * 7 + y * 11) % 256
                    g = (did * 5 + xx * 13 + y * 3) % 256
                    b = (did * 7 + xx * 3 + y * 5) % 256
                    a = 255 - ((did + x + y) % 2)
                    px.append((a << 24) | (r << 16) | (g << 8) | b)
            if v == 0:
                return codec.encode(px, w, h)
            if v == 1:
                return codec.encode(px, w, h,
                                    transform="subtract_green",
                                    cache_bits=4)
            if v == 2:
                return codec.encode(px, w, h, transform="predictor",
                                    predictor_mode=did % 14,
                                    cache_bits=3)
            if v == 3:
                return codec.encode(px, w, h,
                                    transform="green_predictor",
                                    predictor_mode=(did // 2) % 14)
            if v == 4:
                return codec.encode(px, w, h, transform="color",
                                    color_elem=((did * 37) % 256,
                                                (did * 59) % 256,
                                                (did * 83) % 256))
            return codec.encode(px, w, h, cache_bits=4,
                                meta_bits=2 + did % 3, n_groups=2)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def webp_features_real(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL VP8L SAMPLE decode (webpcodec.py: prefix codes, LZ77 +
    2D distance map, color cache, all four inverse transforms) to
    exact integer features: dims, the position/channel-weighted
    px_check of decode_meta_real, and the alpha-plane sum. Non-WebP
    or corrupt bytes yield NULLs, never a task failure. Narrow,
    zero-shuffle."""
    from nowdb_spark.operators.webpcodec import make_webp_codec

    codec = make_webp_codec()
    schema = (f"{id_col} long, fmt string, width long, height long, "
              "n_px long, px_check long, a_sum long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = codec.features(bytes(payload))
                except ValueError:
                    m = None
                if m is None:
                    out.append((int(did),) + (None,) * 6)
                else:
                    out.append((int(did), m["fmt"], m["width"],
                                m["height"], m["n_px"],
                                m["px_check"], m["a_sum"]))
            yield _pd.DataFrame(out, columns=[
                id_col, "fmt", "width", "height", "n_px",
                "px_check", "a_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def upsample2x_real(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """REAL 2× audio upsampling over decoded WAV PCM — the
    sample-rate-conversion step of audio preprocessing, kept in
    EXACT integer arithmetic (floor midpoints inserted between
    consecutive samples: u[2i]=s[i], u[2i+1]=⌊(s[i]+s[i+1])/2⌋,
    n_out = 2n−1, rate doubles) so the oracle replays it value-for-
    value. Mono only (the fixture shape); non-WAV or multichannel
    payloads yield NULLs. Narrow, zero-shuffle."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, n_in long, n_out long, rate_out long, "
              "peak long, sq_sum long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                try:
                    a = codec.decode(bytes(payload))
                except ValueError:
                    a = None
                if a is None or a.get("channels") != 1:
                    out.append((did,) + (None,) * 5)
                    continue
                s = a["samples"]
                u = []
                for i, x in enumerate(s):
                    u.append(x)
                    if i + 1 < len(s):
                        u.append((x + s[i + 1]) // 2)  # floor
                out.append((did, len(s), len(u),
                            a["sample_rate"] * 2,
                            max((abs(x) for x in u), default=0),
                            sum(x * x for x in u)))
            yield _pd.DataFrame(out, columns=[
                id_col, "n_in", "n_out", "rate_out", "peak",
                "sq_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def trim_silence_real(df: DataFrame, threshold: int = 200,
                      id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL silence trimming over decoded WAV PCM — the VAD-lite
    preprocessing step: drop leading/trailing samples with
    |s| < threshold, keep the interior untouched. Integer-exact
    outputs (trimmed length, lead cut, trimmed-window energy) so the
    oracle replays the trim decision sample-for-sample. Mono only;
    an all-quiet clip trims to 0 with lead_cut = n. Narrow."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, n_in long, n_out long, lead_cut long, "
              "sq_sum long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                try:
                    a = codec.decode(bytes(payload))
                except ValueError:
                    a = None
                if a is None or a.get("channels") != 1:
                    out.append((did,) + (None,) * 4)
                    continue
                s = a["samples"]
                loud = [i for i, x in enumerate(s)
                        if abs(x) >= threshold]
                if not loud:
                    out.append((did, len(s), 0, len(s), 0))
                    continue
                lo, hi = loud[0], loud[-1]
                win = s[lo:hi + 1]
                out.append((did, len(s), len(win), lo,
                            sum(x * x for x in win)))
            yield _pd.DataFrame(out, columns=[
                id_col, "n_in", "n_out", "lead_cut", "sq_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def scene_cuts_real(df: DataFrame, threshold_per_px: int = 24,
                    id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """REAL scene-change detection over decoded Y4M video — the
    shot-segmentation step of video-corpus preprocessing: per
    consecutive frame pair, the luma SAD (sum of absolute Y-plane
    differences); a CUT where SAD > threshold_per_px · plane_size.
    Integer-exact (n_cuts, total SAD) so the oracle replays every
    comparison. Narrow, zero-shuffle."""
    from nowdb_spark.operators.videocodec import make_video_codec

    codec = make_video_codec()
    schema = (f"{id_col} long, n_frames long, n_cuts long, "
              "total_sad long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                v = codec.decode(bytes(payload))
                if v is None:
                    out.append((did,) + (None,) * 3)
                    continue
                ys = [_np.frombuffer(f[0], dtype=_np.uint8)
                      .astype(_np.int64) for f in v["frames"]]
                thresh = threshold_per_px * (len(ys[0]) if ys else 0)
                cuts = 0
                total = 0
                for a, b in zip(ys, ys[1:]):
                    sad = int(_np.abs(a - b).sum())
                    total += sad
                    if sad > thresh:
                        cuts += 1
                out.append((did, len(ys), cuts, total))
            yield _pd.DataFrame(out, columns=[
                id_col, "n_frames", "n_cuts", "total_sad"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


AUGMENT_OPS = ("flip_h", "flip_v", "rot90", "rot180", "rot270")


def augment_image_real(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL data-augmentation over decoded images (the training-set
    expansion step): per-id op from AUGMENT_OPS — horizontal /
    vertical flip, 90/180/270° rotation — applied to the decoded
    pixel grid, verified by the transformed grid's px_check.
    Conventions (top-down rows, CW rotation):
      flip_h  out(x,y) = in(w-1-x, y)
      flip_v  out(x,y) = in(x, h-1-y)
      rot90   out[r][c] = in[h-1-c][r]   (dims swap)
      rot180  out[r][c] = in[h-1-r][w-1-c]
      rot270  out[r][c] = in[c][w-1-r]   (dims swap)
    Non-decodable payloads yield NULLs. Narrow, zero-shuffle."""
    from nowdb_spark.operators.imagecodec import make_image_codec

    codec = make_image_codec()
    schema = (f"{id_col} long, op string, out_w long, out_h long, "
              "px_check long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def transform(rows, w, h, op):
            if op == "flip_h":
                return [list(reversed(r)) for r in rows]
            if op == "flip_v":
                return rows[::-1]
            if op == "rot90":
                return [[rows[h - 1 - c][r] for c in range(h)]
                        for r in range(w)]
            if op == "rot180":
                return [[rows[h - 1 - r][w - 1 - c]
                         for c in range(w)] for r in range(h)]
            return [[rows[c][w - 1 - r] for c in range(h)]
                    for r in range(w)]

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                img = codec.decode(bytes(payload))
                if img is None:
                    out.append((did,) + (None,) * 4)
                    continue
                w, h = img["width"], img["height"]
                op = AUGMENT_OPS[did % 5]
                t = transform(img["rows"], w, h, op)
                ow = len(t[0])
                chk = 0
                for y, row in enumerate(t):
                    base = y * ow + 1
                    for x, (r, g, bl) in enumerate(row):
                        chk += (base + x) * (r + 2 * g + 3 * bl)
                out.append((did, op, ow, len(t), chk))
            yield _pd.DataFrame(out, columns=[id_col, "op", "out_w",
                                              "out_h", "px_check"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_webps_extended(df: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Extended-format (VP8X) WebP fixtures: canvas w = 8+id%9,
    h = 8+id%7, embedded VP8L image with the mm19 non-palette pixel
    arithmetic (subtract-green + cache encoding), an EXIF chunk
    carrying a REAL TIFF stream (width 100+id%50, height 80+id%30,
    bits 8, samples 1+id%3 — samples = 3 exercises the out-of-line
    BitsPerSample path), and an XMP chunk on even ids."""
    from nowdb_spark.operators.webpcodec import make_webp_codec

    codec = make_webp_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            w, h = 8 + did % 9, 8 + did % 7
            px = []
            for y in range(h):
                for x in range(w):
                    xx = x // 3
                    r = (did * 3 + xx * 7 + y * 11) % 256
                    g = (did * 5 + xx * 13 + y * 3) % 256
                    b = (did * 7 + xx * 3 + y * 5) % 256
                    a = 255 - ((did + x + y) % 2)
                    px.append((a << 24) | (r << 16) | (g << 8) | b)
            return codec.encode_extended(
                px, w, h,
                exif_pages=[{"width": 100 + did % 50,
                             "height": 80 + did % 30, "bits": 8,
                             "compression": 1, "photometric": 2,
                             "samples": 1 + did % 3}],
                xmp=f"<x:xmpmeta>doc {did}</x:xmpmeta>"
                    if did % 2 == 0 else None,
                transform="subtract_green", cache_bits=4)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def webp_ext_meta_real(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL extended-WebP metadata + sample decode: VP8X chunk walk
    (flags, 24-bit canvas dims, chunk inventory), the EXIF chunk
    through the TIFF IFD walker, XMP presence, and the embedded VP8L
    image decoded to the px_check feature. Non-WebP or corrupt bytes
    yield NULLs. Narrow, zero-shuffle."""
    from nowdb_spark.operators.webpcodec import make_webp_codec

    codec = make_webp_codec()
    schema = (f"{id_col} long, canvas_w long, canvas_h long, "
              "n_chunks long, exif_w long, exif_h long, "
              "exif_samples long, has_xmp long, px_check long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = codec.parse_extended(bytes(payload))
                except ValueError:
                    m = None
                if m is None or m["image"] is None:
                    out.append((int(did),) + (None,) * 8)
                    continue
                img = m["image"]
                w = img["width"]
                chk = 0
                for y, row in enumerate(img["rows"]):
                    base = y * w + 1
                    for x, (r, g, bl) in enumerate(row):
                        chk += (base + x) * (r + 2 * g + 3 * bl)
                e = (m["exif"] or [{}])[0]
                out.append((int(did), m["canvas_w"], m["canvas_h"],
                            len(m["chunks"]), e.get("width"),
                            e.get("height"), e.get("samples"),
                            int(m["xmp"] is not None), chk))
            yield _pd.DataFrame(out, columns=[
                id_col, "canvas_w", "canvas_h", "n_chunks", "exif_w",
                "exif_h", "exif_samples", "has_xmp", "px_check"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_mp4(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize deterministic MP4 containers from an id column:
    avc1 video track whose SPS encodes width 16*(id%20+2)-2*(id%4),
    height 16*(id%12+2)-2*(id%3) (cropped from the macroblock grid),
    profile cycling 66/77/100 with level 30+id%3, mvhd duration
    (id%50+1)*200 ms, and an mp4a track with 1+id%2 channels at
    44100/48000/32000 Hz by id%3. Container + SPS structure is real
    (mp4codec.py); media samples are empty (sample decode is the
    honestly gated layer)."""
    from nowdb_spark.operators.mp4codec import make_mp4_codec

    codec = make_mp4_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            return codec.encode_mp4(
                width=16 * (did % 20 + 2) - 2 * (did % 4),
                height=16 * (did % 12 + 2) - 2 * (did % 3),
                duration_ms=(did % 50 + 1) * 200,
                profile=(66, 77, 100)[did % 3],
                level=30 + did % 3,
                channels=1 + did % 2,
                sample_rate=(44100, 48000, 32000)[did % 3])

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def mp4_meta_real(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """REAL MP4 container metadata: ISO BMFF box walk (ftyp brand,
    mvhd duration, per-trak hdlr/stsd), avcC decoder config, and a
    full Exp-Golomb H.264 SPS parse for exact coded width/height/
    profile/level (mp4codec.py). Bytes that are not an MP4 yield
    NULLs. Narrow, zero-shuffle."""
    from nowdb_spark.operators.mp4codec import make_mp4_codec

    codec = make_mp4_codec()
    cols = ["fmt", "brand", "duration_ms", "n_tracks", "vcodec",
            "width", "height", "profile_idc", "level_idc", "acodec",
            "channels", "sample_rate"]
    schema = (f"{id_col} long, fmt string, brand string, "
              "duration_ms long, n_tracks long, vcodec string, "
              "width long, height long, profile_idc long, "
              "level_idc long, acodec string, channels long, "
              "sample_rate long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = codec.mp4_meta(bytes(payload))
                if m is None:
                    out.append((int(did),) + (None,) * len(cols))
                else:
                    out.append((int(did),) + tuple(m[c] for c in cols))
            yield _pd.DataFrame(out, columns=[id_col] + cols)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def h264_meta_real(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload") -> DataFrame:
    """REAL Annex-B H.264 elementary-stream metadata: start-code NAL
    walk, IDR/slice census, SPS parse for dims/profile/level
    (mp4codec.py). Non-H.264 bytes yield NULLs. Narrow, zero-shuffle."""
    from nowdb_spark.operators.mp4codec import make_mp4_codec

    codec = make_mp4_codec()
    cols = ["fmt", "n_nals", "n_frames", "n_idr", "width", "height",
            "profile_idc", "level_idc"]
    schema = (f"{id_col} long, fmt string, n_nals long, "
              "n_frames long, n_idr long, width long, height long, "
              "profile_idc long, level_idc long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = codec.h264_meta(bytes(payload))
                if m is None:
                    out.append((int(did),) + (None,) * len(cols))
                else:
                    out.append((int(did),) + tuple(m[c] for c in cols))
            yield _pd.DataFrame(out, columns=[id_col] + cols)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def audio_features_real(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """REAL WAV decode + integer features: the RIFF container and PCM
    samples are parsed by the vendored pure-Python codec; bytes it
    cannot decode yield NULLs. Features are exact integers (count,
    rate, floor-ms duration, |peak|, sum of squares) so the oracle
    compares hash-exactly. Narrow, zero-shuffle."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = (f"{id_col} long, fmt string, n_samples long, "
              "sample_rate long, duration_ms long, peak long, "
              "sq_sum long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                f = codec.features(bytes(payload))
                if f is None:
                    out.append((int(did), None, None, None, None,
                                None, None))
                else:
                    out.append((int(did), f["fmt"], f["n_samples"],
                                f["sample_rate"], f["duration_ms"],
                                f["peak"], f["sq_sum"]))
            yield _pd.DataFrame(out, columns=[
                id_col, "fmt", "n_samples", "sample_rate",
                "duration_ms", "peak", "sq_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def decode_meta_real(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """REAL metadata extraction: BMP/PPM payloads are parsed by the
    vendored pure-Python codec (header fields + full pixel decode);
    bytes the codec cannot decode yield NULL dims rather than fakes.

    px_check is a position- and channel-weighted checksum
    Σ (y*w + x + 1) * (r + 2g + 3b) over the decoded top-down pixel
    grid — it catches row-order (BMP bottom-up) and BGR/RGB channel
    mistakes that a plain byte sum would miss. Narrow, zero-shuffle.
    """
    from nowdb_spark.operators.imagecodec import make_image_codec

    codec = make_image_codec()

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                img = codec.decode(b)
                if img is None:
                    out.append((int(did), None, None, None, len(b), None))
                    continue
                w, h = img["width"], img["height"]
                chk = 0
                for y, row in enumerate(img["rows"]):
                    base = y * w + 1
                    for x, (r, g, bl) in enumerate(row):
                        chk += (base + x) * (r + 2 * g + 3 * bl)
                out.append((int(did), img["fmt"], w, h, len(b), chk))
            yield _pd.DataFrame(out, columns=[id_col, "fmt", "width",
                                              "height", "n_bytes",
                                              "px_check"])

    return df.select(id_col, payload_col).mapInPandas(
        kernel, REAL_META_SCHEMA)


def resize_image_real(df: DataFrame, width: int, height: int,
                      id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL nearest-neighbor resize for BMP/PPM payloads (output is
    24-bit BMP); non-decodable payloads pass through as NULL. Source
    pixel for output (x, y) is (x*w // tw, y*h // th) — the oracle can
    replay that index arithmetic exactly. Narrow, zero-shuffle."""
    from nowdb_spark.operators.imagecodec import make_image_codec

    codec = make_image_codec()
    schema = f"{id_col} long, resized binary, out_w int, out_h int"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "resized": [codec.resize_nn(bytes(b), width, height)
                            for b in pdf[payload_col]],
                "out_w": width,
                "out_h": height,
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_jpegs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize UNIFORM-gray JPEGs from an id column — BASELINE for
    even ids, PROGRESSIVE (SOF2 multi-scan) for odd ids, so both
    entropy architectures sit under the same oracle. For doc d,
    w = d % 12 + 2, h = d % 7 + 2, every pixel = d % 256, unit
    quantization tables. Uniform 8x8 blocks carry only a DC
    coefficient — the integer 8*(v-128) — which unit tables store
    exactly in either architecture (progressive reassembles the DC
    from its Al=1 first scan + refinement bit), so the decode is
    bit-exact and a SQL oracle can replay the pixels (see
    jpegcodec.py exactness note). Gradient/noisy content is
    exercised by tests with tolerances instead."""
    from nowdb_spark.operators.jpegcodec import make_jpeg_codec

    codec = make_jpeg_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            w, h = did % 12 + 2, did % 7 + 2
            v = did % 256
            enc = (codec.encode_gray if did % 2 == 0
                   else codec.encode_progressive_gray)
            return enc(w, h, [[v] * w] * h, unit_quant=True)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def synth_jpegs_arith(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize UNIFORM-gray ARITHMETIC-CODED JPEGs (SOF9 + DAC,
    T.81 Annex D QM coder) from an id column: w = d%21+2, h = d%11+2
    (multi-MCU streams), every pixel = d%256, unit quant; ids
    divisible by 3 add a restart interval of 2 MCUs (coder +
    statistics reset, RSTn resync). Uniform blocks are DC-only and
    unit tables store the DC exactly, so decode is bit-exact and the
    SQL oracle replays the pixels (same exactness argument as
    synth_jpegs); gradient/noisy arithmetic content is exercised by
    the codec tests against the progressive twin."""
    from nowdb_spark.operators.jpegcodec import make_jpeg_codec

    codec = make_jpeg_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            w, h = did % 21 + 2, did % 11 + 2
            v = did % 256
            return codec.encode_gray_arith(
                w, h, [[v] * w] * h, unit_quant=True,
                dri=2 if did % 3 == 0 else 0)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def synth_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize deterministic Y4M video payloads from an id column
    (video analogue of synth_images/synth_audio). For doc d:
    width = 8 + (d % 3) * 4, height = 8, n_frames = d % 5 + 2,
    C420jpeg at 25:1; plane bytes are pure integer arithmetic a SQL
    oracle replays exactly —
      Y[f][i] = (d*7 + f*13 + i*3)  % 256
      U[f][i] = (d*5 + f*11 + i*7)  % 256
      V[f][i] = (d*3 + f*17 + i*5)  % 256
    """
    from nowdb_spark.operators.videocodec import make_video_codec

    codec = make_video_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            w, h = 8 + (did % 3) * 4, 8
            ysz, csz = w * h, (w // 2) * (h // 2)
            frames = []
            for f in range(did % 5 + 2):
                y = bytes((did * 7 + f * 13 + i * 3) % 256
                          for i in range(ysz))
                u = bytes((did * 5 + f * 11 + i * 7) % 256
                          for i in range(csz))
                v = bytes((did * 3 + f * 17 + i * 5) % 256
                          for i in range(csz))
                frames.append((y, u, v))
            return codec.encode_y4m(frames, w, h)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def video_features_real(df: DataFrame, every_n: int = 1,
                        id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """REAL Y4M decode + exact integer features over every
    ``every_n``-th frame: container facts (dims, frame count, fps,
    floor-ms duration) and plane statistics (luma sum/max, chroma
    sum). Bytes the codec cannot decode yield NULLs. Narrow,
    zero-shuffle — payloads never leave their partition."""
    from nowdb_spark.operators.videocodec import make_video_codec

    codec = make_video_codec()
    schema = (f"{id_col} long, fmt string, width long, height long, "
              "n_frames long, n_sampled long, duration_ms long, "
              "luma_sum long, luma_max long, chroma_sum long")
    cols = [id_col, "fmt", "width", "height", "n_frames", "n_sampled",
            "duration_ms", "luma_sum", "luma_max", "chroma_sum"]

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                ft = codec.features(bytes(payload), every_n)
                if ft is None:
                    out.append((int(did),) + (None,) * 9)
                else:
                    out.append((int(did), "y4m", ft["width"],
                                ft["height"], ft["n_frames"],
                                ft["n_sampled"], ft["duration_ms"],
                                ft["luma_sum"], ft["luma_max"],
                                ft["chroma_sum"]))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def frame_sample_real(df: DataFrame, every_n: int = 2,
                      id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL temporal subsampling: decode the Y4M container, keep every
    ``every_n``-th frame, re-encode a valid stream (fps rescaled so
    duration is preserved). Output column ``sampled`` is binary —
    composes with video_features_real. Narrow, zero-shuffle."""
    from nowdb_spark.operators.videocodec import make_video_codec

    codec = make_video_codec()
    schema = f"{id_col} long, sampled binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "sampled": [codec.frame_sample(bytes(b), every_n)
                            for b in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 997,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """'Frame sampling' plumbing: emit one row per sampled offset with
    a sliced binary chunk (what a video frame sampler's shuffle/output
    shape looks like). Deterministic; works on any binary column."""
    schema = f"{id_col} long, frame_no long, chunk binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for fno, off in enumerate(range(0, len(b), every_n_bytes)):
                    rows.append((did, fno, b[off:off + 16]))
            yield _pd.DataFrame(rows, columns=[id_col, "frame_no", "chunk"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_mp2(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize one-frame mono MPEG-1 Layer II payloads (48 kHz,
    192 kbps, 576 bytes) from an id column. Subband-domain content
    s(g,k) = ((id·31 + g·7 + k·13) % 4001 − 2000)/2048 (g-independent
    when id % 4 == 0, which drives the encoder down the scfsi=2
    shared-scalefactor path); allocation indexes cycle the B.2a
    ladder classes so grouped (3/5/9-level) AND ungrouped quantizers
    are exercised: subband sb is allocated iff (id+sb) % 3 == 0. The
    content is synthetic; the bitstream written/parsed is the REAL
    Layer II layout (operators/mp2codec.py)."""
    from nowdb_spark.operators.mp2codec import make_mp2_codec

    codec = make_mp2_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            sub = [[((did * 31 + (0 if did % 4 == 0 else g * 7)
                      + k * 13) % 4001 - 2000) / 2048.0
                    for k in range(32)] for g in range(36)]
            alloc = [0] * 27
            for sb in range(27):
                if (did + sb) % 3:
                    continue
                if sb < 3:
                    alloc[sb] = 1 + (did + sb) % 3
                elif sb < 11:
                    alloc[sb] = 1 + (did + sb) % 4
                elif sb < 23:
                    alloc[sb] = 1 + (did + sb) % 5
                else:
                    alloc[sb] = 1 + (did + sb) % 2
            return codec.encode_frame(sub, alloc)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def mp2_granules_real(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL MPEG-1 Layer II decode to PCM, per granule: the payload's
    frames are bit-parsed (allocation → scfsi → scalefactors →
    grouped/ungrouped codes → requantization) and run through the
    32-band polyphase synthesis filterbank. Emits one row per granule
    g (32 PCM samples): q_sum = Σ_k code (integer-exact bitstream
    check) and the PCM row sums rounded to 3 decimals (synthesis
    check; magnitudes ~1e3, cross-engine float noise ~1e-9). Narrow,
    zero-shuffle; vectorized numpy per clip."""
    from nowdb_spark.operators.mp2codec import make_mp2_codec

    codec = make_mp2_codec()
    schema = (f"{id_col} long, granule long, q_sum long, "
              "x_sum double, x_abs_sum double")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                frames = codec.decode_frames(bytes(payload))
                g0 = 0
                v = None
                for f in frames:
                    S = _np.asarray(f["sub"])
                    v = _np.zeros(1024) if v is None else v
                    pcm = codec.synthesize(S, v_state=v)
                    qarr = _np.asarray(f["q"])
                    for g in range(S.shape[0]):
                        rows.append((did, g0 + g,
                                     int(qarr[g].sum()),
                                     round(float(pcm[g].sum()), 3),
                                     round(float(_np.abs(pcm[g])
                                                 .sum()), 3)))
                    g0 += S.shape[0]
            yield _pd.DataFrame(rows, columns=[
                id_col, "granule", "q_sum", "x_sum", "x_abs_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_mp3_l3(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize 3-frame mono MPEG-1 Layer III payloads (48 kHz,
    192 kbps, 1728 bytes) from an id column, in the integer spectral
    code domain (granule index g = 0..5 across the frames):

    * region0 (i<16, Huffman table 1): ((id + 3g + i) % 3) − 1;
    * region1 (16≤i<36, table 2): ((id·7 + g·5 + i·3) % 5) − 2;
    * region2 (36≤i<96, table 3): ((id·11 + g + i·7) % 5) − 2;
    * count1 tail (96≤i<120, table B quadruples): ((id+g·3+i)%3)−1;
    * scalefactors scf[b] = (id + 7g + b) % 8 (scalefac_compress 13,
      slen 3,3); global_gain = 200 + (id+g) % 32.

    The content is synthetic; the bitstream written/parsed is the
    REAL Layer III layout (operators/mp3codec.py): side info,
    slen-coded scalefactors, per-region Huffman with sign bits, the
    count1 quadruple region, and part2_3_length accounting."""
    from nowdb_spark.operators.mp3codec import make_mp3_codec

    codec = make_mp3_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def content(did: int, g: int):
            isv = [0] * 576
            for i in range(16):
                isv[i] = ((did + 3 * g + i) % 3) - 1
            for i in range(16, 36):
                isv[i] = ((did * 7 + g * 5 + i * 3) % 5) - 2
            for i in range(36, 96):
                isv[i] = ((did * 11 + g + i * 7) % 5) - 2
            for i in range(96, 120):
                isv[i] = ((did + g * 3 + i) % 3) - 1
            scf = [(did + 7 * g + b) % 8 for b in range(21)]
            return isv, scf, 200 + (did + g) % 32

        def synth(did: int) -> bytes:
            did = int(did)
            payload = b""
            for f in range(3):
                g0 = content(did, 2 * f)
                g1 = content(did, 2 * f + 1)
                payload += codec.encode_frame(
                    [g0[0], g1[0]], [g0[1], g1[1]],
                    [g0[2], g1[2]], count1_quads=6)
            return payload

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def mp3_granules_real(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """REAL MPEG-1 Layer III decode, per granule: header → side info
    → slen scalefactors → per-region Huffman (+count1 quadruples) →
    requantization → alias butterflies → 36-point IMDCT (sine
    window) → overlap-add → frequency inversion
    (operators/mp3codec.py). Emits one row per granule with
    integer-exact bitstream checks (q_sum/q_abs_sum over the decoded
    spectral codes, scf_sum over the scalefactors — any side-info,
    Huffman or sign-bit misparse breaks them) and float checks
    rounded at 1e-6 of the requantized spectrum (xr_*) and the
    post-IMDCT/overlap-add time samples (s_*). The final polyphase
    filterbank is the mm31-certified shared synthesize(); its PCM is
    covered by the pytest battery. Narrow, zero-shuffle."""
    from nowdb_spark.operators.mp3codec import make_mp3_codec

    codec = make_mp3_codec()
    schema = (f"{id_col} long, granule long, q_sum long, "
              "q_abs_sum long, scf_sum long, xr_sum double, "
              "xr_abs_sum double, s_sum double, s_abs_sum double")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                g0 = 0
                for f in codec.decode_frames(bytes(payload)):
                    for gr in f["granules"]:
                        isv = _np.asarray(gr["is"])
                        xr = gr["xr"]
                        ts = gr["ts"]
                        rows.append((
                            did, g0, int(isv.sum()),
                            int(_np.abs(isv).sum()),
                            int(sum(gr["scf"])),
                            round(float(xr.sum()), 6),
                            round(float(_np.abs(xr).sum()), 6),
                            round(float(ts.sum()), 6),
                            round(float(_np.abs(ts).sum()), 6)))
                        g0 += 1
            yield _pd.DataFrame(rows, columns=[
                id_col, "granule", "q_sum", "q_abs_sum", "scf_sum",
                "xr_sum", "xr_abs_sum", "s_sum", "s_abs_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_mp3_reservoir(df: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Synthesize two-frame mono Layer III streams that genuinely
    USE the bit reservoir and short blocks (operators/mp3codec.py
    encode_stream): every granule is block_type 2 (short windows),
    frame 0's granules are sparse (nonzero span 24) and frame 1's
    dense (span 96), so frame 1's main data starts hundreds of bytes
    back inside frame 0's region — a real nonzero main_data_begin,
    not a header forgery. Content per (id, global granule g = 2f+g'):

    * spectral codes (Huffman transmit order, window-major per short
      sfb): v[i] = ((id·7 + g·5 + i·3) % 5) − 2 for i < span, 0 on,
      span = 24 + 2·((id+g) % 8) sparse / 96 + 2·((id+g) % 8) dense
      — the span varies per document so the Huffman bit counts, and
      therefore main_data_begin, genuinely differ across rows;
      table_select (3,3,3);
    * short scalefactors scf_s[w][b] = (id + 5g + 3w + b) % 8;
    * subblock_gain[w] = (id + g + w) % 4;
    * global_gain = 200 + (id + g) % 16.

    The packing arithmetic (granule bit counts → frame byte counts →
    ancillary alignment and 511-byte stuffing → main_data_begin) is
    closed-form in the content, so the mm38 oracle replays it in
    SQL."""
    from nowdb_spark.operators.mp3codec import make_mp3_codec

    codec = make_mp3_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def content(did: int, g2: int):
            span = (24 if g2 < 2 else 96) + 2 * ((did + g2) % 8)
            isv = [((did * 7 + g2 * 5 + i * 3) % 5) - 2
                   if i < span else 0 for i in range(576)]
            scf_s = [[(did + 5 * g2 + 3 * w + b) % 8
                      for b in range(12)] for w in range(3)]
            sbg = tuple((did + g2 + w) % 4 for w in range(3))
            return isv, scf_s, sbg, 200 + (did + g2) % 16

        def synth(did: int) -> bytes:
            did = int(did)
            frames = []
            for f in range(2):
                c0 = content(did, 2 * f)
                c1 = content(did, 2 * f + 1)
                frames.append({
                    "is2": [c0[0], c1[0]],
                    "scf2": [c0[1], c1[1]],
                    "gains": [c0[3], c1[3]],
                    "block_type": (2, 2),
                    "subblock_gain": (c0[2], c1[2]),
                    "table_select": (3, 3, 3),
                })
            return codec.encode_stream(frames)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def mp3_reservoir_real(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """REAL Layer III reservoir + short-block decode, per granule:
    locate each frame's main data through the rolling bit reservoir
    (main_data_begin), parse the window-switching side info
    (block_type 2, subblock gains), decode the per-window short
    scalefactors and the Huffman regions, requantize with the
    2^(−2·subblock_gain) per-window factor into the 3i+w reorder,
    and run the three 12-point IMDCTs per subband with 6-sample
    offset overlap-add (operators/mp3codec.py). Emits per granule:
    the frame's main_data_begin (mdb — integer-exact proof of the
    reservoir packing arithmetic, which the oracle recomputes from
    the content's Huffman bit counts), q/scf integer sums (bitstream
    parse proofs) and xr/ts float sums rounded at 1e-6. Narrow,
    zero-shuffle."""
    from nowdb_spark.operators.mp3codec import make_mp3_codec

    codec = make_mp3_codec()
    schema = (f"{id_col} long, frame long, granule long, mdb long, "
              "q_sum long, q_abs_sum long, scf_sum long, "
              "xr_sum double, xr_abs_sum double, s_sum double, "
              "s_abs_sum double")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                g2 = 0
                for fi, f in enumerate(
                        codec.decode_frames(bytes(payload))):
                    for gr in f["granules"]:
                        isv = _np.asarray(gr["is"])
                        xr = gr["xr"]
                        ts = gr["ts"]
                        rows.append((
                            did, fi, g2, int(f["mdb"]),
                            int(isv.sum()),
                            int(_np.abs(isv).sum()),
                            int(sum(sum(w) for w in gr["scf_s"])),
                            round(float(xr.sum()), 6),
                            round(float(_np.abs(xr).sum()), 6),
                            round(float(ts.sum()), 6),
                            round(float(_np.abs(ts).sum()), 6)))
                        g2 += 1
            yield _pd.DataFrame(rows, columns=[
                id_col, "frame", "granule", "mdb", "q_sum",
                "q_abs_sum", "scf_sum", "xr_sum", "xr_abs_sum",
                "s_sum", "s_abs_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_mp3_ms(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize two-frame MS joint-stereo Layer III streams
    (operators/mp3codec.py encode_stream with ch1 + mode_ext=0b10):
    the transmitted channels are the MID/SIDE integer spectra, long
    blocks, no reservoir borrowing beyond natural packing. Content
    per (id, global granule g = 2f+g', channel ch), with u = g+4·ch:

    * region0 (i<16, table 1): ((id + 3u + i) % 3) − 1;
    * region1 (16≤i<36, table 2): ((id·7 + u·5 + i·3) % 5) − 2;
    * region2 (36≤i<96, table 3): ((id·11 + u + i·7) % 5) − 2;
    * scalefactors scf[b] = (id + 7u + b) % 8; global_gain =
      200 + (id+u) % 32."""
    from nowdb_spark.operators.mp3codec import make_mp3_codec

    codec = make_mp3_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def content(did: int, g2: int, ch: int):
            u = g2 + 4 * ch
            isv = [0] * 576
            for i in range(16):
                isv[i] = ((did + 3 * u + i) % 3) - 1
            for i in range(16, 36):
                isv[i] = ((did * 7 + u * 5 + i * 3) % 5) - 2
            for i in range(36, 96):
                isv[i] = ((did * 11 + u + i * 7) % 5) - 2
            scf = [(did + 7 * u + b) % 8 for b in range(21)]
            return isv, scf, 200 + (did + u) % 32

        def synth(did: int) -> bytes:
            did = int(did)
            frames = []
            for f in range(2):
                m0 = content(did, 2 * f, 0)
                m1 = content(did, 2 * f + 1, 0)
                s0 = content(did, 2 * f, 1)
                s1 = content(did, 2 * f + 1, 1)
                frames.append({
                    "is2": [m0[0], m1[0]], "scf2": [m0[1], m1[1]],
                    "gains": [m0[2], m1[2]], "mode_ext": 0b10,
                    "ch1": {"is2": [s0[0], s1[0]],
                            "scf2": [s0[1], s1[1]],
                            "gains": [s0[2], s1[2]]},
                })
            return codec.encode_stream(frames)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def mp3_ms_real(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """REAL MS joint-stereo Layer III decode, per granule: 32-byte
    stereo side info, per-channel scalefactors and Huffman regions,
    requantization of the MID/SIDE spectra, the per-line L,R =
    (M±S)/√2 recombine, then alias butterflies, 36-point IMDCT,
    per-channel overlap-add and frequency inversion
    (operators/mp3codec.py). Emits per granule: integer bitstream
    proofs per transmitted channel (q/scf sums over MID and SIDE)
    and 1e-6-rounded float sums of the requantized+recombined L/R
    spectra and their time-domain samples. Narrow, zero-shuffle."""
    from nowdb_spark.operators.mp3codec import make_mp3_codec

    codec = make_mp3_codec()
    schema = (f"{id_col} long, granule long, "
              "q_sum_m long, q_abs_sum_m long, scf_sum_m long, "
              "q_sum_s long, q_abs_sum_s long, scf_sum_s long, "
              "xr_sum_l double, xr_abs_sum_l double, "
              "xr_sum_r double, xr_abs_sum_r double, "
              "s_sum_l double, s_abs_sum_l double, "
              "s_sum_r double, s_abs_sum_r double")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                g2 = 0
                for f in codec.decode_frames(bytes(payload)):
                    for gr in f["granules"]:
                        ism = _np.asarray(gr["is"][0])
                        iss = _np.asarray(gr["is"][1])
                        xr = gr["xr"]         # (2, 576) post-MS L/R
                        ts = gr["ts"]         # (2, 18, 32)
                        rows.append((
                            did, g2,
                            int(ism.sum()), int(_np.abs(ism).sum()),
                            int(sum(gr["scf_ch"][0]["scf"])),
                            int(iss.sum()), int(_np.abs(iss).sum()),
                            int(sum(gr["scf_ch"][1]["scf"])),
                            round(float(xr[0].sum()), 6),
                            round(float(_np.abs(xr[0]).sum()), 6),
                            round(float(xr[1].sum()), 6),
                            round(float(_np.abs(xr[1]).sum()), 6),
                            round(float(ts[0].sum()), 6),
                            round(float(_np.abs(ts[0]).sum()), 6),
                            round(float(ts[1].sum()), 6),
                            round(float(_np.abs(ts[1]).sum()), 6)))
                        g2 += 1
            yield _pd.DataFrame(rows, columns=[
                id_col, "granule", "q_sum_m", "q_abs_sum_m",
                "scf_sum_m", "q_sum_s", "q_abs_sum_s", "scf_sum_s",
                "xr_sum_l", "xr_abs_sum_l", "xr_sum_r",
                "xr_abs_sum_r", "s_sum_l", "s_abs_sum_l", "s_sum_r",
                "s_abs_sum_r"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_vp8(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize single-macroblock lossy-VP8 key frames (16×16,
    RFC 6386 layout; operators/vp8codec.py) from an id column, in
    the quantized coefficient domain:

    * Y2 (DC plane): ((id·3 + j·7) % 21) − 10, j = 0..15;
    * 16 luma blocks i: coeff j = ((id·5 + i·11 + j·3) % 13) − 6 for
      1 ≤ j < 10, 0 beyond (position 0 comes from Y2);
    * 8 chroma blocks i: ((id·7 + i·3 + j·5) % 9) − 4 for j < 6;
    * q_index = id % 128, luma mode = (DC,V,H,TM)[id % 4].

    The bitstream is the real key-frame layout — frame tag,
    start code, bool-coded feature/quant/update flags, mode trees,
    token trees with sign and category-extra bits — see the module
    docstring for the structure-vs-data split."""
    from nowdb_spark.operators.vp8codec import make_vp8_codec

    codec = make_vp8_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            y2 = [((did * 3 + j * 7) % 21) - 10 for j in range(16)]
            y = [[0] + [((did * 5 + i * 11 + j * 3) % 13) - 6
                        if j < 10 else 0 for j in range(1, 16)]
                 for i in range(16)]
            uv = [[((did * 7 + i * 3 + j * 5) % 9) - 4
                   if j < 6 else 0 for j in range(16)]
                  for i in range(8)]
            return codec.encode_frame(did % 4, y2, y, uv,
                                      q_index=did % 128)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def vp8_frames_real(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """REAL lossy-VP8 intra decode, per frame: boolean-decode both
    partitions (header/modes + DCT tokens), dequantize, inverse WHT
    the Y2 plane into the luma DCs, inverse-DCT every block, predict
    (DC/V/H/TM) and reconstruct (operators/vp8codec.py). Every
    emitted column is INTEGER-exact — the transforms are integer —
    so any bool-coder, token-tree, context, zigzag, WHT, IDCT or
    prediction misparse breaks the row: coefficient sums per plane,
    plane pixel sums, and position-weighted pixel sums (catches
    block-placement mistakes that plain sums cancel). Narrow,
    zero-shuffle."""
    from nowdb_spark.operators.vp8codec import make_vp8_codec

    codec = make_vp8_codec()
    schema = (f"{id_col} long, ymode long, q_index long, "
              "qy_sum long, qy2_sum long, quv_sum long, "
              "y_sum long, y_wsum long, u_sum long, v_sum long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as _np
        import pandas as _pd

        w16 = (_np.arange(256).reshape(16, 16) + 1)

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                # payloads are minted by vp8_frames_synth's twin of
                # this codec — declared out-of-band per the gate
                out = codec.decode_frame(bytes(payload),
                                         fixture=True)
                qy = sum(sum(b[1:]) for b in out["y_coeffs"])
                quv = sum(sum(b) for b in out["uv_coeffs"])
                rows.append((
                    int(did), out["ymode"], out["q_index"],
                    int(qy), int(sum(out["y2_coeffs"])), int(quv),
                    int(out["y"].sum()),
                    int((out["y"] * w16).sum()),
                    int(out["u"].sum()), int(out["v"].sum())))
            yield _pd.DataFrame(rows, columns=[
                id_col, "ymode", "q_index", "qy_sum", "qy2_sum",
                "quv_sum", "y_sum", "y_wsum", "u_sum", "v_sum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_webps_anim(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Animated extended-WebP fixtures (the container spec's ANIM/
    ANMF layer): id%3+2 frames on a canvas sized to the largest
    frame; frame f sits at (2·(f%2), 2·(f//2)), is (4+id%3)×(4+(id+f)%2)
    px of VP8L-encoded ARGB content r=(id·3+f·5+x·7+y·11)%256,
    g=(id·5+f·7+x·13+y·3)%256, b=(id·7+f·3+x·3+y·5)%256 (opaque),
    duration (id+f)%9·10+40 ms, blend flag (id+f)%2==0, dispose
    (id+f)%3==0; background BGRA (id%256,0,255,255), loop id%4; even
    ids carry a synthetic ICC profile ('mntr'/'RGB ')."""
    from nowdb_spark.operators.webpcodec import make_webp_codec

    codec = make_webp_codec()
    schema = f"{id_col} long, payload binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            frames = []
            maxw = maxh = 1
            for f in range(did % 3 + 2):
                fw, fh = 4 + did % 3, 4 + (did + f) % 2
                x0, y0 = 2 * (f % 2), 2 * (f // 2)
                px = [0xFF000000
                      | (((did * 3 + f * 5 + x * 7 + y * 11) % 256)
                         << 16)
                      | (((did * 5 + f * 7 + x * 13 + y * 3) % 256)
                         << 8)
                      | ((did * 7 + f * 3 + x * 3 + y * 5) % 256)
                      for y in range(fh) for x in range(fw)]
                frames.append({"x": x0, "y": y0, "w": fw, "h": fh,
                               "pixels": px,
                               "duration_ms": (did + f) % 9 * 10 + 40,
                               "blend": (did + f) % 2 == 0,
                               "dispose_bg": (did + f) % 3 == 0})
                maxw = max(maxw, x0 + fw)
                maxh = max(maxh, y0 + fh)
            icc = codec.synth_icc("mntr", "RGB ", n_tail=did % 8 + 4) \
                if did % 2 == 0 else None
            return codec.encode_extended(
                [], maxw, maxh, icc=icc, anim_frames=frames,
                anim_bg=(did % 256, 0, 255, 255),
                anim_loops=did % 4)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)


def webp_anim_frames_real(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """REAL animated-WebP frame extraction: VP8X flag walk, ANIM
    background/loop, per-ANMF offsets/dims/duration/blend/dispose,
    and each frame's embedded VP8L image SAMPLE-decoded to the
    px_check integer (the same position/channel-weighted checksum
    the other image rows use). One row per frame; ICC color space
    and loop count ride along. Narrow, zero-shuffle."""
    from nowdb_spark.operators.webpcodec import make_webp_codec

    codec = make_webp_codec()
    schema = (f"{id_col} long, frame long, x long, y long, w long, "
              "h long, duration_ms long, blend long, dispose long, "
              "loop_count long, icc_space string, px_check long")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                meta = codec.parse_extended(bytes(payload))
                if meta is None:
                    continue
                loops = (meta["anim"] or {}).get("loop_count")
                icc_space = (meta["icc"] or {}).get("color_space")
                for i, fr in enumerate(meta["frames"]):
                    chk = None
                    img = fr["image"]
                    if img is not None:
                        w = img["width"]
                        chk = 0
                        for y, row in enumerate(img["rows"]):
                            base = y * w + 1
                            for x, (r, g, bl) in enumerate(row):
                                chk += (base + x) * (r + 2 * g
                                                     + 3 * bl)
                    rows.append((did, i, fr["x"], fr["y"], fr["w"],
                                 fr["h"], fr["duration_ms"],
                                 int(fr["blend"]),
                                 int(fr["dispose_bg"]), loops,
                                 icc_space, chk))
            yield _pd.DataFrame(rows, columns=[
                id_col, "frame", "x", "y", "w", "h", "duration_ms",
                "blend", "dispose", "loop_count", "icc_space",
                "px_check"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def synth_aiff(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Mono 16-bit AIFF payloads from an id column: n = id%40+10
    samples s_i = ((id·31 + i·17) % 4001) − 2000, rate cycling
    {8000, 22050, 44100} by id%3 — each rate a REAL 80-bit extended
    float in the COMM chunk (the AIFF quirk), big-endian PCM in
    SSND."""
    from nowdb_spark.operators.audiocodec import make_audio_codec

    codec = make_audio_codec()
    schema = f"{id_col} long, payload binary"
    rates = (8000, 22050, 44100)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            samples = [((did * 31 + i * 17) % 4001) - 2000
                       for i in range(did % 40 + 10)]
            return codec.encode_aiff(samples, rate=rates[did % 3])

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(d) for d in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(kernel, schema)
