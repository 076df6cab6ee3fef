"""DOCX text extraction — OOXML WordprocessingML paragraph walk.

DOCX (ECMA-376 / ISO 29500, public OOXML spec) is a zip archive whose
main document part is word/document.xml: <w:body> holds <w:p>
paragraphs, each a sequence of <w:r> runs whose literal text lives in
<w:t> elements (often split mid-word by revision tracking or
formatting changes), with <w:tab/> and <w:br/> as explicit control
elements. Extraction walks exactly that structure with stdlib
zipfile + regex: runs are re-joined per paragraph, tabs/breaks map to
\\t/\\n, and the five XML entities plus numeric character references
are unescaped. Paragraphs inside table cells (<w:tbl><w:tc>…) are
plain <w:p> nodes, so the same walk lifts table text in cell order.
Headers/footers/footnotes live in separate parts and are out of
scope here (the main-document part is what a corpus pipeline keeps).

Built by `make_docx_codec()` as nested closures so cloudpickle ships
the code by value to executors.

Reference parity note: the reference engine has no document handling;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family).
"""

from __future__ import annotations

from types import SimpleNamespace


def make_docx_codec() -> SimpleNamespace:
    """Returns a namespace with:
      sniff(b)           -> 'docx' | None (zip magic + main part)
      extract_paras(b)   -> list[str] paragraph texts in body order
                            | None for non-DOCX bytes
      encode_docx(paras) -> bytes — real DOCX ([Content_Types].xml,
                            _rels/.rels, word/document.xml) with
                            deterministic mid-text run splits
    """
    import io
    import re
    import zipfile

    _ENT = {"amp": "&", "lt": "<", "gt": ">",
            "quot": '"', "apos": "'"}

    def _unescape(s: str) -> str:
        def sub(m):
            g = m.group(1)
            if g.startswith("#x") or g.startswith("#X"):
                return chr(int(g[2:], 16))
            if g.startswith("#"):
                return chr(int(g[1:]))
            return _ENT.get(g, m.group(0))
        return re.sub(r"&(#[xX]?[0-9A-Fa-f]+|[a-z]+);", sub, s)

    def _escape(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;"))

    def sniff(b: bytes):
        if b[:4] != b"PK\x03\x04":
            return None
        try:
            with zipfile.ZipFile(io.BytesIO(b)) as z:
                if "word/document.xml" in set(z.namelist()):
                    return "docx"
        except zipfile.BadZipFile:
            return None
        return None

    # one regex pass per paragraph body: text nodes and control
    # elements in document order
    _TOK = re.compile(
        r"<w:t(?:\s[^>]*)?>(.*?)</w:t>"        # 1: literal text
        r"|<w:tab\s*/>"                         # tab
        r"|<w:br\s*/>",                         # line break
        re.S)

    def extract_paras(b: bytes):
        if sniff(b) is None:
            return None
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            xml = z.read("word/document.xml").decode("utf-8", "replace")
        out = []
        for pbody in re.findall(r"<w:p(?:\s[^>]*)?>(.*?)</w:p>",
                                xml, re.S):
            parts = []
            for m in _TOK.finditer(pbody):
                if m.group(0).startswith("<w:tab"):
                    parts.append("\t")
                elif m.group(0).startswith("<w:br"):
                    parts.append("\n")
                else:
                    parts.append(_unescape(m.group(1)))
            out.append("".join(parts))
        return out

    def _runs_xml(text: str, n_splits: int) -> str:
        """Render one paragraph: split the text into n_splits+1 runs
        at deterministic offsets (proving run re-joining), mapping
        tabs to <w:tab/> elements inside their run."""
        cuts = sorted({1 + (i * 7) % max(1, len(text) - 1)
                       for i in range(n_splits)} - {0})
        pieces, prev = [], 0
        for c in cuts + [len(text)]:
            if c > prev:
                pieces.append(text[prev:c])
                prev = c
        runs = []
        for piece in pieces:
            inner = []
            for j, seg in enumerate(piece.split("\t")):
                if j:
                    inner.append("<w:tab/>")
                if seg:
                    # xml:space keeps leading/trailing blanks alive
                    inner.append(
                        f'<w:t xml:space="preserve">{_escape(seg)}'
                        f"</w:t>")
            runs.append(f"<w:r>{''.join(inner)}</w:r>")
        return f"<w:p>{''.join(runs)}</w:p>"

    def encode_docx(paras: list) -> bytes:
        """Real minimal DOCX: content types, package rels, and the
        main document part; paragraph i is split into (i % 3) + 1
        runs."""
        body = "".join(_runs_xml(p, i % 3 + 1)
                       for i, p in enumerate(paras))
        doc = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<w:document xmlns:w="http://schemas.openxmlformats.org'
               '/wordprocessingml/2006/main">'
               f"<w:body>{body}</w:body></w:document>")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr(
                "[Content_Types].xml",
                '<?xml version="1.0"?><Types xmlns="http://schemas.'
                'openxmlformats.org/package/2006/content-types">'
                '<Default Extension="xml" ContentType="application/xml"/>'
                '<Override PartName="/word/document.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.'
                'wordprocessingml.document.main+xml"/></Types>')
            z.writestr(
                "_rels/.rels",
                '<?xml version="1.0"?><Relationships xmlns="http://'
                'schemas.openxmlformats.org/package/2006/relationships">'
                '<Relationship Id="rId1" Type="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships/'
                'officeDocument" Target="word/document.xml"/>'
                '</Relationships>')
            z.writestr("word/document.xml", doc)
        return buf.getvalue()

    return SimpleNamespace(sniff=sniff, extract_paras=extract_paras,
                           encode_docx=encode_docx)


# driver-side convenience instance (kernels build their own)
DOCX_CODEC = make_docx_codec()
