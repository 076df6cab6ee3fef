"""DOCX codec: container sniff, paragraph walk, runs/tabs/entities."""

from __future__ import annotations

from nowdb_spark.operators.docxcodec import make_docx_codec

C = make_docx_codec()


def test_roundtrip_paragraphs_runs_tabs_entities():
    paras = ["hello world",
             "a&b <q> t\tend7",           # entities + structural tab
             "  spaced  ",                 # xml:space preserve
             "entity &amp; raw",           # literal '&amp;' in input
             "",                           # empty paragraph survives
             "x\ty\tz"]                    # multiple tabs
    b = C.encode_docx(paras)
    assert C.sniff(b) == "docx"
    assert C.extract_paras(b) == paras


def test_runs_are_actually_split():
    # paragraph index 2 → 3 runs: the raw XML must contain split
    # <w:t> fragments that extraction re-joins
    b = C.encode_docx(["first", "second", "abcdefghij"])
    import io
    import zipfile
    xml = zipfile.ZipFile(io.BytesIO(b)).read(
        "word/document.xml").decode()
    last_para = xml.rsplit("<w:p>", 1)[1]
    assert last_para.count("<w:r>") >= 2
    assert C.extract_paras(b)[2] == "abcdefghij"


def test_table_cell_paragraphs_are_plain_w_p():
    # hand-build a document.xml with a table: the same walk lifts
    # cell text in document order
    import io
    import zipfile
    doc = ("<w:document><w:body><w:p><w:r><w:t>before</w:t></w:r>"
           "</w:p><w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell A</w:t>"
           "</w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>cell B</w:t>"
           "</w:r></w:p></w:tc></w:tr></w:tbl>"
           "<w:p><w:r><w:br/><w:t>after</w:t></w:r></w:p>"
           "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    got = C.extract_paras(buf.getvalue())
    assert got == ["before", "cell A", "cell B", "\nafter"]


def test_numeric_character_references():
    import io
    import zipfile
    doc = ("<w:document><w:body><w:p><w:r>"
           "<w:t>A&#66;&#x43;</w:t></w:r></w:p></w:body>"
           "</w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", doc)
    assert C.extract_paras(buf.getvalue()) == ["ABC"]


def test_rejects_non_docx():
    assert C.extract_paras(b"plain text") is None
    assert C.sniff(b"PK\x03\x04 but not a zip") is None
    # a zip without the main part (e.g. an EPUB) is not a DOCX
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
    assert C.sniff(buf.getvalue()) is None
