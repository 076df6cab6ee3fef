"""TIFF metadata codec: IFD walk, byte orders, offsets, chains."""

from __future__ import annotations

from nowdb_spark.operators.tiffcodec import make_tiff_codec

C = make_tiff_codec()

PAGES = [
    {"width": 640, "height": 480, "bits": 8, "compression": 1,
     "photometric": 2, "samples": 3},      # BitsPerSample via offset
    {"width": 32, "height": 16, "bits": 16, "compression": 5,
     "photometric": 1, "samples": 1},      # inline
]


def test_both_byte_orders_multipage():
    for be in (False, True):
        b = C.encode_tiff(PAGES, big_endian=be)
        assert C.sniff(b) == "tiff"
        m = C.tiff_meta(b)
        assert [r["page"] for r in m] == [0, 1]
        for want, got in zip(PAGES, m):
            for k, v in want.items():
                assert got[k] == v, (be, k, got)


def test_rejects_garbage_and_truncation():
    assert C.tiff_meta(b"not tiff") is None
    assert C.tiff_meta(b"II*\x00\xff\xff\xff\xff") is None
    b = C.encode_tiff(PAGES)
    # cut mid-IFD: the intact prefix pages still parse
    m = C.tiff_meta(b[:30])
    assert m is None or all(r["page"] == 0 for r in m)


def test_ifd_cycle_terminates():
    import struct
    b = bytearray(C.encode_tiff([PAGES[1]]))
    # point next-IFD back at the first IFD: the walk must not loop
    n_at = len(b) - 4
    b[n_at:n_at + 4] = struct.pack("<I", 8)
    m = C.tiff_meta(bytes(b))
    assert len(m) == 1
