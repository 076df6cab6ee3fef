"""EPUB extraction: container/OPF/spine walk + shared HTML-to-text."""

from __future__ import annotations

from nowdb_spark.operators.epubcodec import make_epub_codec

C = make_epub_codec()


def test_roundtrip_spine_order():
    chs = ["<p>first &amp; chapter</p>",
           "<script>x</script><p>two</p>",
           "<h1>three</h1> done"]
    b = C.encode_epub(chs)
    assert C.sniff(b) == "epub"
    # zip order is REVERSED vs spine in the fixture — extraction must
    # follow the spine; <title>chN</title> text survives (html_to_text
    # keeps title text, same contract as the WARC pipeline)
    assert C.extract_text(b) == ["ch0 first & chapter", "ch1 two",
                                 "ch2 three done"]


def test_rejects_non_epub():
    assert C.extract_text(b"not zip") is None
    assert C.extract_text(b"PK\x03\x04junk") is None
    import io
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("random.txt", "zip but not epub")
    assert C.sniff(buf.getvalue()) is None


def test_missing_chapter_skipped():
    b = C.encode_epub(["<p>a</p>", "<p>b</p>"])
    # drop ch0 from the spine's manifest target by renaming inside zip
    import io
    import zipfile
    src = zipfile.ZipFile(io.BytesIO(b))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n in src.namelist():
            if n != "OEBPS/ch0.xhtml":
                z.writestr(n, src.read(n))
    assert C.extract_text(buf.getvalue()) == ["ch1 b"]
