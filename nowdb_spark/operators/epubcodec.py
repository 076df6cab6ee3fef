"""EPUB text extraction — zip container walk + spine-ordered chapters.

EPUB (IDPF/W3C spec) is a zip archive: META-INF/container.xml names
the OPF package document; the OPF's <manifest> maps ids to hrefs and
its <spine> fixes reading order. Extraction walks exactly that chain
with stdlib zipfile + regex (no XML lib needed for the two
attribute lookups involved) and strips each XHTML chapter to text
with the SAME html_to_text transform the WARC pipeline uses — one
definition of HTML-to-text across the corpus stack.

Built by `make_epub_codec()` as nested closures so cloudpickle ships
the code by value to executors.

Reference parity note: the reference engine has no document handling;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family).
"""

from __future__ import annotations

from types import SimpleNamespace


def make_epub_codec() -> SimpleNamespace:
    """Returns a namespace with:
      sniff(b)         -> 'epub' | None  (zip magic + epub mimetype)
      extract_text(b)  -> list[str] chapter texts in SPINE order
                          | None for non-EPUB bytes
      encode_epub(chs) -> bytes — real EPUB (container.xml + OPF +
                          XHTML chapters; chs = list of HTML bodies)
    """
    import io
    import posixpath
    import re
    import zipfile

    from nowdb_spark.sources.warc import html_to_text_py

    def sniff(b: bytes):
        if b[:4] != b"PK\x03\x04":
            return None
        try:
            with zipfile.ZipFile(io.BytesIO(b)) as z:
                names = set(z.namelist())
                if "META-INF/container.xml" in names:
                    return "epub"
        except zipfile.BadZipFile:
            return None
        return None

    def extract_text(b: bytes):
        if sniff(b) is None:
            return None
        with zipfile.ZipFile(io.BytesIO(b)) as z:
            container = z.read("META-INF/container.xml").decode(
                "utf-8", "replace")
            m = re.search(r'full-path="([^"]+)"', container)
            if m is None:
                return []
            opf_path = m.group(1)
            opf = z.read(opf_path).decode("utf-8", "replace")
            base = posixpath.dirname(opf_path)
            # manifest id -> href, spine = ordered idrefs
            hrefs = dict(re.findall(
                r'<item\b[^>]*\bid="([^"]+)"[^>]*\bhref="([^"]+)"',
                opf))
            # attribute order varies in the wild — try href-first too
            for href, iid in re.findall(
                    r'<item\b[^>]*\bhref="([^"]+)"[^>]*\bid="([^"]+)"',
                    opf):
                hrefs.setdefault(iid, href)
            spine = re.findall(r'<itemref\b[^>]*\bidref="([^"]+)"',
                               opf)
            out = []
            for iid in spine:
                href = hrefs.get(iid)
                if href is None:
                    continue
                path = posixpath.normpath(posixpath.join(base, href))
                try:
                    html = z.read(path).decode("utf-8", "replace")
                except KeyError:
                    continue
                out.append(html_to_text_py(html))
            return out

    def encode_epub(chapters: list) -> bytes:
        """Real EPUB zip: mimetype (stored, first), container.xml,
        OPF with manifest + spine, one XHTML file per chapter body.
        Spine order is REVERSED relative to zip order so extraction
        provably follows the spine, not file order."""
        buf = io.BytesIO()
        n = len(chapters)
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr(zipfile.ZipInfo("mimetype"),
                       "application/epub+zip")
            z.writestr(
                "META-INF/container.xml",
                '<?xml version="1.0"?><container>'
                '<rootfiles><rootfile full-path="OEBPS/content.opf" '
                'media-type="application/oebps-package+xml"/>'
                '</rootfiles></container>')
            items = "".join(
                f'<item id="c{i}" href="ch{i}.xhtml" '
                f'media-type="application/xhtml+xml"/>'
                for i in range(n))
            spine = "".join(f'<itemref idref="c{i}"/>'
                            for i in range(n))
            z.writestr(
                "OEBPS/content.opf",
                f'<?xml version="1.0"?><package>'
                f'<manifest>{items}</manifest>'
                f'<spine>{spine}</spine></package>')
            for i in range(n - 1, -1, -1):   # zip order ≠ spine order
                z.writestr(
                    f"OEBPS/ch{i}.xhtml",
                    f"<html><head><title>ch{i}</title></head>"
                    f"<body>{chapters[i]}</body></html>")
        return buf.getvalue()

    return SimpleNamespace(sniff=sniff, extract_text=extract_text,
                           encode_epub=encode_epub)


# driver-side convenience instance (kernels build their own)
EPUB_CODEC = make_epub_codec()
