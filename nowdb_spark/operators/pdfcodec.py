"""Pure-Python PDF text extraction — the document-pipeline front door.

Built from the public PDF 1.7 specification (ISO 32000-1): object
scan (`N 0 obj … endobj`), stream payloads with /FlateDecode
(stdlib zlib) or raw, page-tree walk (/Root → /Pages → /Kids →
/Contents, including indirect /Contents arrays), and content-stream
tokenization for the text-showing operators — `(…) Tj`, `(…) '`, and
`[(…) kern (…)] TJ` — with full literal-string unescaping
(\\\\ \\( \\) \\n \\r \\t \\b \\f, octal \\ddd, and
line-continuation backslash). Lines are emitted per text-showing
operator and joined with newlines per page.

What this intentionally does NOT do (real-extractor scope cuts,
documented): positioning-based layout reconstruction (Td/TL matrices
reorder nothing here — streams are read in operator order), font
cmap decoding for hex strings (<…> Tj), and encrypted documents.
The companion encoder emits REAL PDFs (correct xref offsets,
trailer, page tree, Flate or raw streams) that external viewers can
open; extraction round-trips them exactly.

Built by `make_pdf_codec()` as nested closures so cloudpickle ships
the code by value to executors (same rule as the other codecs).

Reference parity note: the reference engine has no document
handling; this module belongs to the training-data-pipeline
extension surface (SURVEY.md §2 pipeline family).
"""

from __future__ import annotations

from types import SimpleNamespace


def make_pdf_codec() -> SimpleNamespace:
    """Returns a namespace with:
      sniff(b)          -> 'pdf' | None
      extract_text(b)   -> list[str] page texts (lines joined by \\n)
                           | None for non-PDF bytes
      encode_pdf(pages, -> bytes — real PDF; pages = list of page
        flate, tj_split)   line-lists; flate compresses streams;
                           tj_split renders odd lines as kerned TJ
                           arrays split mid-line
    """
    import re
    import zlib

    def sniff(b: bytes):
        return "pdf" if b[:5] == b"%PDF-" else None

    # --- literal string unescape (ISO 32000-1 §7.3.4.2) ---------------

    _ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}

    def _unescape(raw: bytes) -> str:
        out = bytearray()
        i, n = 0, len(raw)
        while i < n:
            c = raw[i:i + 1]
            if c != b"\\":
                out += c
                i += 1
                continue
            nxt = raw[i + 1:i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):      # line continuation
                i += 2
                if nxt == b"\r" and raw[i:i + 1] == b"\n":
                    i += 1
            else:                            # lone backslash: dropped
                i += 1
        return out.decode("latin1")

    def _scan_string(data: bytes, i: int):
        """Balanced escape-aware literal-string scan starting at the
        '(' at ``i``; returns (unescaped text, index past ')')."""
        depth, j, n = 1, i + 1, len(data)
        while j < n and depth:
            c = data[j:j + 1]
            if c == b"\\":
                j += 2
                continue
            if c == b"(":
                depth += 1
            elif c == b")":
                depth -= 1
            j += 1
        return _unescape(data[i + 1:j - 1]), j

    # --- object scan ---------------------------------------------------

    _OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj",
                         re.DOTALL)
    _STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream",
                            re.DOTALL)

    def _objects(b: bytes) -> dict:
        return {int(m.group(1)): m.group(2)
                for m in _OBJ_RE.finditer(b)}

    def _stream_data(body: bytes):
        m = _STREAM_RE.search(body)
        if m is None:
            return None
        data = m.group(1)
        head = body[:m.start()]
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return None
        return data

    def _refs(body: bytes, key: bytes) -> list:
        """Indirect reference(s) after /Key: '3 0 R' or '[3 0 R …]'."""
        m = re.search(key + rb"\s*(\[(?:[^\]]*)\]|\d+\s+\d+\s+R)",
                      body)
        if m is None:
            return []
        return [int(x) for x in
                re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]

    def _page_text(data: bytes) -> str:
        """Sequential content-stream scan: literal strings (balanced
        parens, nesting allowed) accumulate — flat, or concatenated
        inside a [... ] kerning array — and flush to a line at each
        text-showing operator (Tj, TJ, ', \")."""
        lines, i, n = [], 0, len(data)
        arr = None          # strings collected inside the open [ ... ]
        last = None         # most recent string/array text
        while i < n:
            c = data[i:i + 1]
            if c == b"(":
                s, i = _scan_string(data, i)
                if arr is not None:
                    arr.append(s)
                else:
                    last = s
                continue
            if c == b"<":                # hex string: skipped (scope)
                j = data.find(b">", i)
                i = j + 1 if j >= 0 else n
                continue
            if c == b"[":
                arr, i = [], i + 1
                continue
            if c == b"]":
                last, arr, i = "".join(arr), None, i + 1
                continue
            if data[i:i + 2] in (b"Tj", b"TJ"):
                if last is not None:
                    lines.append(last)
                    last = None
                i += 2
                continue
            if c in (b"'", b'"'):
                if last is not None:
                    lines.append(last)
                    last = None
                i += 1
                continue
            i += 1
        return "\n".join(lines)

    def extract_text(b: bytes):
        """One text blob per page, in page-tree order. Falls back to
        object-number order over ALL content streams when the page
        tree is unresolvable (damaged xref / unusual layout) — text
        is recovered either way."""
        if sniff(b) is None:
            return None
        objs = _objects(b)
        # page tree: trailer /Root -> /Pages -> /Kids (may nest)
        pages = []
        root = _refs(b, rb"/Root")
        stack = [objs.get(r) for r in root if r in objs]
        seen = set()
        while stack:
            body = stack.pop(0)
            if body is None:
                continue
            if b"/Type" in body and b"/Page" in body \
                    and b"/Pages" not in body:
                pages.append(body)
                continue
            for kid in (_refs(body, rb"/Kids")
                        or _refs(body, rb"/Pages")):
                if kid not in seen and kid in objs:
                    seen.add(kid)
                    stack.append(objs[kid])
        out = []
        if pages:
            for body in pages:
                parts = []
                for ref in _refs(body, rb"/Contents"):
                    data = _stream_data(objs.get(ref, b""))
                    if data:
                        parts.append(_page_text(data))
                out.append("\n".join(p for p in parts if p))
            return out
        # fallback: every stream in object order
        for num in sorted(objs):
            data = _stream_data(objs[num])
            if data:
                t = _page_text(data)
                if t:
                    out.append(t)
        return out

    # --- encoder (real PDFs: correct xref, page tree) -------------------

    def _esc(s: str) -> bytes:
        return (s.replace("\\", "\\\\").replace("(", "\\(")
                 .replace(")", "\\)").encode("latin1"))

    def encode_pdf(pages: list, flate: bool = False,
                   tj_split: bool = False) -> bytes:
        """``pages`` = list of line-lists. Odd lines render as
        kerned TJ arrays split mid-line when ``tj_split`` (extraction
        must reassemble them); streams Flate-compress when ``flate``."""
        objs: list = []                      # (num, bytes) in order
        n_pages = len(pages)
        # 1 catalog, 2 pages, 3 font; page i -> obj 4+2i, content 5+2i
        kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
        objs.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
        objs.append((2, (f"<< /Type /Pages /Kids [{kids}] "
                         f"/Count {n_pages} >>").encode()))
        objs.append((3, b"<< /Type /Font /Subtype /Type1 "
                        b"/BaseFont /Helvetica >>"))
        for i, lines in enumerate(pages):
            pg, ct = 4 + 2 * i, 5 + 2 * i
            objs.append((pg, (
                f"<< /Type /Page /Parent 2 0 R /MediaBox "
                f"[0 0 612 792] /Resources << /Font << /F1 3 0 R >> "
                f">> /Contents {ct} 0 R >>").encode()))
            ops = [b"BT /F1 12 Tf 72 720 Td"]
            for k, line in enumerate(lines):
                if tj_split and k % 2 == 1 and len(line) > 2:
                    mid = len(line) // 2
                    ops.append(b"[(" + _esc(line[:mid]) + b") -250 ("
                               + _esc(line[mid:]) + b")] TJ")
                else:
                    ops.append(b"(" + _esc(line) + b") Tj")
                ops.append(b"0 -14 Td")
            ops.append(b"ET")
            data = b"\n".join(ops)
            filt = b""
            if flate:
                data = zlib.compress(data, 6)
                filt = b"/Filter /FlateDecode "
            objs.append((ct, b"<< " + filt
                         + f"/Length {len(data)} >>".encode()
                         + b"\nstream\n" + data + b"\nendstream"))
        out = bytearray(b"%PDF-1.4\n")
        offsets = {}
        for num, body in objs:
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, len(objs) + 1):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
                f"startxref\n{xref_at}\n%%EOF\n").encode()
        return bytes(out)

    return SimpleNamespace(sniff=sniff, extract_text=extract_text,
                           encode_pdf=encode_pdf)


# driver-side convenience instance (kernels build their own)
PDF_CODEC = make_pdf_codec()
