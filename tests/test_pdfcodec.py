"""PDF text extraction: object scan, streams, page tree, escapes."""

from __future__ import annotations

from nowdb_spark.operators.pdfcodec import make_pdf_codec

C = make_pdf_codec()

PAGES = [["hello world", "line two (with) parens"],
         ["page 2 \\ backslash"], ["third"]]


def test_roundtrip_grid():
    for flate in (False, True):
        for tj in (False, True):
            b = C.encode_pdf(PAGES, flate=flate, tj_split=tj)
            assert C.sniff(b) == "pdf"
            assert C.extract_text(b) == ["\n".join(p) for p in PAGES], \
                (flate, tj)


def test_string_escapes():
    b = C.encode_pdf([["x"]])
    raw = b.replace(b"(x)", b"(oc\\164al \\(n\\) tab\\tnl\\nbs\\\\)")
    assert C.extract_text(raw) == ["octal (n) tab\tnl\nbs\\"]


def test_line_continuation_and_nested_parens():
    b = C.encode_pdf([["x"]])
    raw = b.replace(b"(x)", b"(a\\\nb (nested (deep)) c)")
    assert C.extract_text(raw) == ["ab (nested (deep)) c"]


def test_quote_operator_and_fallback_order():
    """The ' (move-and-show) operator counts as a text op, and a file
    with a broken /Root still yields text via the object-order
    fallback."""
    b = C.encode_pdf([["first"], ["second"]])
    raw = b.replace(b"(first) Tj", b"(first) '")
    assert C.extract_text(raw) == ["first", "second"]
    broken = raw.replace(b"/Root 1 0 R", b"/Root 99 0 R")
    assert C.extract_text(broken) == ["first", "second"]


def test_rejects_non_pdf_and_corrupt_flate():
    assert C.extract_text(b"plain text") is None
    b = bytearray(C.encode_pdf([["zzz"]], flate=True))
    i = b.find(b"stream\n") + 10
    b[i] ^= 0xFF
    # corrupt deflate → that stream is skipped, not a crash
    assert C.extract_text(bytes(b)) == [""]


def test_multipage_order_via_page_tree():
    # reverse the Kids order: extraction must follow the TREE, not
    # object numbering
    b = C.encode_pdf([["A"], ["B"]])
    raw = b.replace(b"/Kids [4 0 R 6 0 R]", b"/Kids [6 0 R 4 0 R]")
    assert C.extract_text(raw) == ["B", "A"]
