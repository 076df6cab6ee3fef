"""WebDataset tar-shard source: member walk, sample regroup."""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.sources import webdataset as WD


def test_read_webdataset_samples(spark, tmp_path):
    shard_a = WD.encode_tar([
        ("000001.txt", b"caption one"),
        ("000001.cls", b"7"),
        ("000002.txt", b"caption two"),
        ("000002.cls", b"3"),
    ])
    shard_b = WD.encode_tar([
        # nested path + multi-dot ext: basename cuts at FIRST dot of
        # the leaf (WebDataset convention)
        ("imgs/000003.seg.png", b"\x89fakepng"),
        ("imgs/000003.txt", b"caption three"),
    ])
    (tmp_path / "a.tar").write_bytes(shard_a)
    (tmp_path / "b.tar").write_bytes(shard_b)
    df = WD.read_webdataset(spark, str(tmp_path))
    rows = {r["basename"]: dict(r["parts"]) for r in df.collect()}
    assert set(rows) == {"000001", "000002", "000003"}
    assert bytes(rows["000001"]["txt"]) == b"caption one"
    assert bytes(rows["000002"]["cls"]) == b"3"
    assert set(rows["000003"]) == {"seg.png", "txt"}


def test_webdataset_oversized_shard_clear_error(spark, tmp_path):
    """A shard past the binaryFile row cap must fail UP FRONT with an
    actionable message (metadata-only check, shared with the WARC
    reader via binlimits.py), not an opaque Arrow error in a task."""
    import pytest
    shard = WD.encode_tar([("000001.txt", b"x" * 4096)])
    (tmp_path / "big.tar").write_bytes(shard)
    with pytest.raises(ValueError, match="max_file_bytes"):
        WD.read_webdataset(spark, str(tmp_path), max_file_bytes=64)
    # under the cap the same shard parses fine
    assert WD.read_webdataset(spark, str(tmp_path)).count() == 1


def test_tar_members_skips_non_regular_and_bad(spark):
    import io
    import tarfile
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        info = tarfile.TarInfo("dir/x.txt")
        payload = b"inside"
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    df = spark.createDataFrame(
        [("s1", bytearray(buf.getvalue())), ("s2", bytearray(b"not a tar"))],
        "path string, content binary")
    rows = WD.tar_members(df).collect()
    assert [(r["basename"], r["ext"]) for r in rows] == [("x", "txt")]
    assert bytes(rows[0]["payload"]) == b"inside"


def test_read_zip_samples(spark, tmp_path):
    """ZIP twin of read_webdataset: deflate + stored members, nested
    paths, bad archives skipped, size guard shared."""
    import pytest

    from nowdb_spark.sources import ziparchive as ZA

    za = ZA.encode_zip([("000001.txt", b"caption one"),
                        ("000001.cls", b"7")], compress=True)
    zb = ZA.encode_zip([("imgs/000002.seg.png", b"\x89fake"),
                        ("imgs/000002.txt", b"caption two")],
                       compress=False)
    (tmp_path / "a.zip").write_bytes(za)
    (tmp_path / "b.zip").write_bytes(zb)
    rows = {r["basename"]: dict(r["parts"]) for r in
            ZA.read_zip(spark, str(tmp_path)).collect()}
    assert set(rows) == {"000001", "000002"}
    assert bytes(rows["000001"]["txt"]) == b"caption one"
    assert set(rows["000002"]) == {"seg.png", "txt"}
    with pytest.raises(ValueError, match="max_file_bytes"):
        ZA.read_zip(spark, str(tmp_path), max_file_bytes=16)
    bad = spark.createDataFrame(
        [(1, bytearray(za)), (2, bytearray(b"not a zip"))],
        "doc_id long, payload binary")
    got = ZA.parse_zip_bytes(bad).collect()
    assert {r["doc_id"] for r in got} == {1}
