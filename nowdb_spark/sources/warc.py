"""WARC (ISO 28500 Web ARChive) source + HTML text extraction — the
web-crawl ingestion front of a training-data pipeline (Common-Crawl-
shaped corpora arrive as tens of thousands of ~1 GB .warc.gz files).

Scale design: WARC's production framing is CONCATENATED per-record
gzip members, which is unsplittable mid-file — so parallelism is
per FILE, exactly how Common Crawl shards (64k files per crawl).
`read_warc` uses Spark's binaryFile source (one row per file, path +
content) and decodes records in a mapInPandas kernel: narrow, zero
shuffle, each task owns whole files. Record parsing is pure stdlib
(gzip member walk + WARC/1.0 header block + HTTP response split);
the HTML-to-text step strips script/style/comments and tags and
normalizes entities/whitespace — a deterministic, oracle-replayable
boilerplate pass (the CCNet-style quality/dedup stages downstream
live in operators/).

Reference parity note: the reference's loader is csv-only
(scope/loader.c); WARC belongs to the pipeline extension surface.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = ("path string, record_id string, warc_type string, "
               "target_uri string, warc_date string, "
               "content_type string, http_status int, payload binary")


def _warc_tools():
    """Closure-self-contained parser kit (cloudpickle ships it by
    value to executors, same rule as the media codecs)."""
    import zlib

    def split_members(b: bytes):
        """Yield decompressed gzip members of a concatenated .gz, or
        the bytes themselves when not gzip. Member-by-member (zlib
        decompressobj, NOT GzipFile.read — that devours every member
        in one call), so a corrupt/truncated tail member only drops
        itself, never the valid records before it."""
        if b[:2] != b"\x1f\x8b":
            yield b
            return
        rest = b
        while rest[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(31)
            try:
                out = d.decompress(rest)
            except zlib.error:           # corrupt member: keep prior
                return
            if not d.eof:                # truncated final member
                return
            yield out
            rest = d.unused_data

    def parse_records(data: bytes):
        """Yield dicts for each WARC record in a decompressed block
        (a block may hold one record — per-member gzip — or many)."""
        i, n = 0, len(data)
        while i < n:
            j = data.find(b"WARC/", i)
            if j < 0:
                return
            he = data.find(b"\r\n\r\n", j)
            if he < 0:
                return
            headers: dict[str, str] = {}
            for line in data[j:he].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("latin1")] = \
                    v.strip().decode("latin1", "replace")
            try:
                length = int(headers.get("content-length", "0"))
            except ValueError:
                length = 0
            body = data[he + 4:he + 4 + length]
            yield headers, body
            i = he + 4 + length

    def http_payload(body: bytes):
        """Split an application/http response block into (status,
        payload); non-HTTP blocks pass through with NULL status."""
        if not body.startswith(b"HTTP/"):
            return None, body
        he = body.find(b"\r\n\r\n")
        if he < 0:
            return None, body
        status_line = body[:body.find(b"\r\n")].split(b" ")
        try:
            status = int(status_line[1])
        except (IndexError, ValueError):
            status = None
        return status, body[he + 4:]

    return split_members, parse_records, http_payload


def encode_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Fixture/synth encoder — the parser's inverse. Each record dict:
    {uri, date, html, [status=200], [rid]}. Emits response records
    framed exactly like production WARCs (HTTP headers + CRLF body,
    one gzip member per record when ``gzip_members``)."""
    import gzip
    import hashlib

    out = bytearray()
    for r in records:
        html = r["html"].encode("utf-8")
        http = (f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
                f"Content-Type: text/html\r\n"
                f"Content-Length: {len(html)}\r\n\r\n"
                ).encode("latin1") + html
        rid = r.get("rid", "<urn:md5:%s>"
                    % hashlib.md5(r["uri"].encode()).hexdigest())
        rec = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Record-ID: {rid}\r\n"
               f"WARC-Target-URI: {r['uri']}\r\n"
               f"WARC-Date: {r['date']}\r\n"
               f"Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(http)}\r\n\r\n"
               ).encode("latin1") + http + b"\r\n\r\n"
        if gzip_members:
            out += gzip.compress(rec, mtime=0)
        else:
            out += rec
    return bytes(out)


# binaryFile materializes each file as ONE row; Spark's byte-array and
# Arrow limits sit just under 2 GiB, and a file over the line fails as
# an opaque Arrow/negative-length error deep in a task. Real crawl
# shards flirt with 1 GiB+, so the reader PRE-CHECKS sizes (a
# metadata-only listing, content never read) and raises a clear,
# actionable error instead.
WARC_MAX_FILE_BYTES = 1_800_000_000


def read_warc(spark: SparkSession, path: str,
              max_file_bytes: int = WARC_MAX_FILE_BYTES) -> DataFrame:
    """One row per WARC record across every file under ``path``
    (plain .warc or member-gzipped .warc.gz), schema WARC_SCHEMA.
    File-parallel: binaryFile rows fan out to tasks, record decode
    never crosses a file boundary.

    Files larger than ``max_file_bytes`` raise ValueError up front
    (see WARC_MAX_FILE_BYTES) — re-shard them (gzip members
    concatenate, so `split` at member boundaries is lossless) rather
    than raising the cap past the 2 GiB row limit."""
    tools = _warc_tools()

    listing = spark.read.format("binaryFile").load(path)
    over = (listing.select("path", "length")
            .where(F.col("length") > int(max_file_bytes))
            .limit(5).collect())
    if over:
        names = ", ".join(f"{r['path']} ({r['length']:,} B)"
                          for r in over)
        raise ValueError(
            f"WARC file(s) exceed max_file_bytes="
            f"{int(max_file_bytes):,} and would overflow the ~2 GiB "
            f"binaryFile row limit: {names}. Split them at gzip "
            f"member boundaries and retry.")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        split_members, parse_records, http_payload = tools
        cols = ["path", "record_id", "warc_type", "target_uri",
                "warc_date", "content_type", "http_status", "payload"]
        for pdf in batches:
            out = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for member in split_members(bytes(content)):
                    for h, body in parse_records(member):
                        status, payload = http_payload(body)
                        out.append((
                            path_, h.get("warc-record-id"),
                            h.get("warc-type"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            h.get("content-type"), status, payload))
            yield _pd.DataFrame(out, columns=cols)

    return (listing
            .select("path", "content")
            .mapInPandas(kernel, WARC_SCHEMA))


def synth_warc(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Wrap each document in deterministic HTML (title, script junk,
    an entity-bearing tail, a comment) and frame it as a one-record
    gzip-member WARC — the fixture generator for the crawl-ingest
    round trip, distributed (mapInPandas, zero shuffle)."""
    tools = (encode_warc,)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        enc = tools[0]
        for pdf in batches:
            out = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                html = (f"<html><head><title>d{did}</title>"
                        f"<script>var x = {did};</script></head>"
                        f"<body><p>{text}</p>"
                        f"<p>tail &amp; {did}</p>"
                        f"<!-- boilerplate --></body></html>")
                out.append((did, enc([{
                    "uri": f"http://corpus.example/{did}",
                    "date": "2026-01-01T00:00:00Z",
                    "html": html}])))
            yield _pd.DataFrame(out, columns=[id_col, "payload"])

    return df.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} long, payload binary")


def parse_warc_bytes(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Record-level WARC parse over a BYTES COLUMN (vs read_warc's
    whole-file rows): same parser kit, id passthrough — lets the
    encode->parse->extract round trip run fully distributed with no
    driver or filesystem involvement."""
    tools = _warc_tools()

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        split_members, parse_records, http_payload = tools
        cols = [id_col, "record_id", "warc_type", "target_uri",
                "warc_date", "content_type", "http_status", "payload"]
        for pdf in batches:
            out = []
            for did, content in zip(pdf[id_col], pdf[payload_col]):
                for member in split_members(bytes(content)):
                    for h, body in parse_records(member):
                        status, payload = http_payload(body)
                        out.append((
                            int(did), h.get("warc-record-id"),
                            h.get("warc-type"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            h.get("content-type"), status, payload))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, record_id string, warc_type string, "
                "target_uri string, warc_date string, "
                "content_type string, http_status int, payload binary")


# -- HTML -> text (deterministic boilerplate strip) ---------------------

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"',
             "apos": "'", "nbsp": " "}


def html_to_text_py(html: str) -> str:
    """Pure-Python twin of `html_to_text` (same regex pipeline) so
    kernels and tests share one definition of the transform.

    Entity decoding is single-pass over the NAMED entities only
    (numeric &#NN; stays literal — a documented lossy edge shared by
    both twins, since the JVM side cannot compute chr()). Single-pass
    semantics match the JVM's sequential per-entity passes because
    only amp's replacement introduces '&' and the JVM runs amp LAST:
    '&amp;lt;' decodes to '&lt;' (once), never to '<'."""
    s = re.sub(r"(?is)<(script|style)\b.*?</\1\s*>", " ", html)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    s = re.sub(r"&(amp|lt|gt|quot|apos|nbsp);",
               lambda m: _ENTITIES[m.group(1)], s)
    return re.sub(r"\s+", " ", s).strip()


def html_to_text(col):
    """Column expression: strip script/style blocks, comments and
    tags, decode the common entities, collapse whitespace — all
    JVM-side regexp_replace (no Python in the hot path).

    The amp pass runs LAST: every other entity's replacement contains
    no '&', so no pass can create a match for a later pass, and the
    '&' that amp emits is never rescanned — exactly the single-pass
    left-to-right semantics of html_to_text_py ('&amp;lt;' → '&lt;',
    not '<'). Numeric &#NN; entities stay literal in BOTH twins."""
    s = F.regexp_replace(col, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    for ent, ch in _ENTITIES.items():
        if ent != "amp":
            s = F.regexp_replace(s, f"&{ent};", ch)
    s = F.regexp_replace(s, "&amp;", "&")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def extract_links(col):
    """Column expression: every href target in an HTML string, in
    document order — JVM regexp_extract_all, no Python. Feeds the
    crawl link graph (explode → (page, url) edges → graph ops)."""
    return F.regexp_extract_all(col, F.lit('href="([^"]*)"'), 1)


def link_host(url_col):
    """Column expression: the host of an http(s) URL (JVM regex)."""
    return F.regexp_extract(url_col, r"^https?://([^/]+)", 1)


def parse_robots(df: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt",
                 user_agent: str = "*") -> DataFrame:
    """robots.txt → (host, prefix) disallow rules for ``user_agent``.

    Entirely JVM-side: lines are posexploded, each line is assigned
    to its governing User-agent section by a running `last(...)
    ignorenulls` window over line order (the stateful part of the
    format), then Disallow values are filtered to the requested
    agent's sections. Empty Disallow (allow-all) lines drop out.
    Comments (#) and surrounding whitespace are stripped per the
    original 1994 robots.txt convention."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))
    clean = lines.withColumn(
        "line", F.trim(F.regexp_replace("line", "#.*$", "")))
    w = Window.partitionBy("host").orderBy("pos")
    sec = clean.withColumn(
        "ua", F.last(
            F.when(F.lower("line").startswith("user-agent:"),
                   F.trim(F.expr("substring(line, 12)"))),
            ignorenulls=True).over(w))
    return (sec
            .where(F.col("ua") == user_agent)
            .where(F.lower("line").startswith("disallow:"))
            .select("host",
                    F.trim(F.expr("substring(line, 10)"))
                    .alias("prefix"))
            .where(F.length("prefix") > 0)
            .distinct())


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Rows of ``urls`` whose URL is NOT disallowed by ``rules``
    (host, prefix): extract host+path, inner-join rules on host with
    a startswith prefix test to find blocked URLs, then anti-join
    them away. Rules are a per-host handful — Spark broadcasts the
    blocked set; the anti-join is the only shuffle."""
    with_path = urls.withColumn(
        "__host", link_host(F.col(url_col))).withColumn(
        "__path", F.regexp_extract(F.col(url_col),
                                   r"^https?://[^/]+(/.*)?$", 1))
    blocked = (with_path
               .join(rules.withColumnRenamed("host", "__host"),
                     "__host")
               .where(F.expr("startswith(__path, prefix)"))
               .select(url_col).distinct())
    return (with_path.join(blocked, url_col, "left_anti")
            .drop("__host", "__path"))


def parse_sitemap(df: DataFrame, xml_col: str = "sitemap_xml",
                  id_col: str = "doc_id") -> DataFrame:
    """XML sitemap (sitemaps.org) → one row per <url> entry:
    (id, url_pos, loc, lastmod, priority). Entirely JVM: split on
    </url> blocks, posexplode, per-field regexp_extract — lastmod /
    priority are optional and NULL when absent. Feeds crawl
    scheduling (what to fetch, how fresh) next to robots_filter
    (what is allowed)."""
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(xml_col), "</url>"))
        .alias("pos", "blk"))
    loc = F.regexp_extract("blk", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        "blk", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
    prio = F.regexp_extract(
        "blk", r"(?s)<priority>\s*(.*?)\s*</priority>", 1)
    entries = (blocks.select(
        id_col, "pos", loc.alias("loc"),
        F.when(lastmod != "", lastmod).alias("lastmod"),
        F.when(prio != "", prio).try_cast("double").alias("priority"))
        .where(F.col("loc") != ""))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy("pos")
    return (entries.withColumn(
                "url_pos", (F.row_number().over(w) - 1).cast("long"))
            .select(id_col, "url_pos", "loc", "lastmod", "priority"))


def warc_text_documents(records: DataFrame,
                        min_status: int = 200,
                        max_status: int = 299) -> DataFrame:
    """response-record HTML -> (target_uri, warc_date, text): the
    crawl-to-corpus step. Narrow ops end-to-end; downstream dedup /
    quality / tokenize stages consume the result as a documents
    table."""
    return (records
            .where(F.col("warc_type") == "response")
            .where(F.col("http_status").between(min_status, max_status))
            .select(
                F.col("target_uri"),
                F.col("warc_date"),
                html_to_text(
                    F.decode(F.col("payload"), "utf-8")).alias("text"))
            .where(F.length("text") > 0))
