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

from nowdb_spark.sources.binlimits import (
    MAX_BINARYFILE_BYTES, check_file_sizes)

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


# size guard shared with WebDataset (see sources/binlimits.py)
WARC_MAX_FILE_BYTES = MAX_BINARYFILE_BYTES


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

    check_file_sizes(spark, path, max_file_bytes, "WARC",
                     "Split them at gzip member boundaries and retry.")

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

    return (spark.read.format("binaryFile").load(path)
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
    document order — JVM regexp_extract_all + per-element quote
    strip, no Python. Matches double-quoted, single-quoted AND
    unquoted attribute values (all three occur in real HTML; HTML5
    allows unquoted values without spaces). Feeds the crawl link
    graph (explode → (page, url) edges → graph ops)."""
    raw = F.regexp_extract_all(
        col, F.lit("(?i)href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"), 1)
    return F.transform(
        raw, lambda v: F.regexp_replace(v, "^[\"']|[\"']$", ""))


def link_host(url_col):
    """Column expression: the host of an http(s) URL (JVM regex)."""
    return F.regexp_extract(url_col, r"^https?://([^/]+)", 1)


# RFC 3986 §2.3 unreserved characters: percent-escapes of these are
# equivalent to the bare character and MUST be decoded by a
# normalizer; every other escape is preserved (case-normalized).
_URL_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "0123456789-._~")


def canonicalize_url(col):
    """Column expression: RFC 3986 §6 URL normalization, entirely
    JVM-side — the canonical form crawl dedup/frontier keying needs
    (the same raw page is fetched under dozens of spellings):

    * fragment stripped (never sent to the server)
    * scheme and host lowercased (path/query case preserved)
    * default ports removed (http:80, https:443)
    * percent-escapes of UNRESERVED chars decoded (%41 → A), all
      remaining escapes uppercased (%2f → %2F)
    * path dot-segments resolved (/a/./b/../c → /a/c, a trailing
      /. or /.. keeps its directory slash per the RFC algorithm)
    * empty path → "/"

    Query parameter reordering is deliberately NOT applied (it is not
    part of RFC 3986 and changes semantics for some endpoints)."""
    u = F.regexp_replace(col, "#.*$", "")           # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*:", "")
    hostport = F.regexp_extract(rest, r"^//([^/?]*)", 1)
    tail = F.regexp_replace(rest, r"^//[^/?]*", "")  # path?query
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = (F.when((port == "") |
                   ((scheme == "http") & (port == "80")) |
                   ((scheme == "https") & (port == "443")), F.lit(""))
            .otherwise(F.concat(F.lit(":"), port)))

    # ONE pass handles both escape rules: split on '%', then per
    # segment decode an unreserved escape via a 66-entry map literal
    # (%41 → 'A'), uppercase any other valid escape's hex, and pass
    # malformed input through untouched. (The first cut chained 66
    # regexp_replace calls — correct but ~66 regex passes per URL,
    # measured 46k urls/s on 32 cores; this single-pass form is the
    # production shape.)
    unres = F.create_map(*[
        F.lit(x)
        for ch in _URL_UNRESERVED
        for x in ("{:02X}".format(ord(ch)), ch)])
    parts = F.split(tail, "%", -1)
    hx = lambda p: F.upper(F.substring(p, 1, 2))  # noqa: E731
    fixed = F.concat(
        F.element_at(parts, 1),
        F.array_join(
            F.transform(
                F.slice(parts, 2, F.greatest(F.size(parts) - 1,
                                             F.lit(0))),
                lambda p: F.when(
                    p.rlike("^[0-9a-fA-F]{2}"),
                    F.concat(
                        F.coalesce(unres[hx(p)],
                                   F.concat(F.lit("%"), hx(p))),
                        p.substr(F.lit(3), F.length(p))))
                .otherwise(F.concat(F.lit("%"), p))),
            ""))
    path = F.regexp_extract(fixed, r"^([^?]*)", 1)
    query = F.regexp_replace(fixed, r"^[^?]*", "")
    # dot-segment resolution: fold the segments through an array
    # stack ('.' skipped, '..' pops); the RFC algorithm keeps a
    # directory slash when the path ENDS in /. or /..
    # NB: slice length must be size-derived — a literal Int.MaxValue
    # length makes the aggregate below evaluate over an empty array
    # (Spark higher-order-function + giant-literal-slice interaction)
    parr = F.split(path, "/", -1)
    segs = F.slice(parr, 2, F.greatest(F.size(parr) - 1, F.lit(0)))
    stack = F.aggregate(
        segs, F.expr("array()").cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(s == "..",
                  F.slice(acc, F.lit(1),
                          F.greatest(F.size(acc) - 1, F.lit(0))))
            .otherwise(F.concat(acc, F.array(s)))))
    resolved = F.concat(F.lit("/"), F.array_join(stack, "/"))
    resolved = F.when(
        path.rlike(r"/\.\.?$") & ~resolved.endswith("/"),
        F.concat(resolved, F.lit("/"))).otherwise(resolved)
    norm_path = (F.when(path == "", F.lit("/"))
                 .when(~path.startswith("/"), path)  # opaque path
                 .otherwise(resolved))
    return F.concat(scheme, F.lit("://"), host, port, norm_path, query)


def parse_robots(df: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt",
                 user_agent: str = "*") -> DataFrame:
    """robots.txt → (host, rule, prefix) for ``user_agent`` under
    RFC 9309 semantics, entirely JVM-side:

    * grouping: ADJACENT User-agent lines share one group (a group
      starts at a UA line not directly preceded by another UA line);
      rules bind to their whole group, not just the nearest UA line.
    * group selection: the groups whose UA token equals
      ``user_agent`` case-insensitively; only if a host has none, its
      ``*`` groups. Multiple matching groups merge (RFC 9309 §2.2.1).
    * BOTH Allow and Disallow rules are returned (``rule`` column);
      empty-valued lines drop (an empty Disallow restricts nothing).
    * comments (#) and surrounding whitespace stripped.

    Longest-match precedence and the ``*``/``$`` pattern characters
    are applied by :func:`robots_filter` (RFC 9309 §2.2.2–2.2.3)."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("pos", "line"))
    clean = lines.withColumn(
        "line", F.trim(F.regexp_replace("line", "#.*$", "")))
    w = Window.partitionBy("host").orderBy("pos")
    marked = (clean
              .withColumn("is_ua",
                          F.lower("line").startswith("user-agent:"))
              .withColumn(
                  "gid",
                  F.sum(F.when(
                      F.col("is_ua") &
                      ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
                      1).otherwise(0)).over(w)))
    uas = (marked.where("is_ua")
           .select("host", "gid",
                   F.lower(F.trim(F.expr("substring(line, 12)")))
                   .alias("token")))
    rule = (F.when(F.lower("line").startswith("disallow:"),
                   F.struct(F.lit("disallow").alias("rule"),
                            F.trim(F.expr("substring(line, 10)"))
                            .alias("prefix")))
             .when(F.lower("line").startswith("allow:"),
                   F.struct(F.lit("allow").alias("rule"),
                            F.trim(F.expr("substring(line, 7)"))
                            .alias("prefix"))))
    rules = (marked.select("host", "gid", rule.alias("r"))
             .where(F.col("r").isNotNull())
             .select("host", "gid", "r.rule", "r.prefix")
             .where(F.length("prefix") > 0))
    exact = (uas.where(F.col("token") == F.lit(user_agent.lower()))
             .select("host", "gid"))
    if user_agent == "*":
        chosen = exact
    else:
        star = uas.where(F.col("token") == "*").select("host", "gid")
        chosen = exact.unionByName(
            star.join(exact.select("host").distinct(),
                      "host", "left_anti"))
    return (rules.join(chosen.distinct(), ["host", "gid"])
            .select("host", "rule", "prefix").distinct())


# Java-regex metacharacters a robots path rule must have escaped when
# translated to a pattern — everything except '*', which RFC 9309
# §2.2.3 defines as "any sequence of characters" ('.*' after escape).
_ROBOTS_REGEX_SPECIALS = r"([\\.\[\]{}()+?^$|])"


def _robots_rule_pattern():
    """Column expression: the Java-regex translation of a robots path
    rule — '*' → '.*', a trailing '$' anchors the end of the path,
    every other character literal (RFC 9309 §2.2.3)."""
    anchored = F.col("prefix").endswith("$")
    body = F.when(anchored,
                  F.expr("substring(prefix, 1, length(prefix) - 1)")
                  ).otherwise(F.col("prefix"))
    esc = F.regexp_replace(body, _ROBOTS_REGEX_SPECIALS, "\\\\$1")
    return F.concat(F.lit("^"),
                    F.replace(esc, F.lit("*"), F.lit(".*")),
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Rows of ``urls`` whose URL survives the RFC 9309 decision
    against ``rules`` (host, rule, prefix): among the rules whose
    path pattern matches the URL's path, the LONGEST rule wins
    (§2.2.2 most-specific match); an Allow/Disallow tie goes to
    Allow; no matching rule means allowed.

    Plain prefixes (no '*' anywhere, no trailing '$') take the
    codegen ``startswith`` fast path; pattern rules match by their
    regex translation. Rules are a per-host handful — the rule join
    broadcasts; the verdict groupBy and final anti-join key on the
    URL string."""
    raw_path = F.regexp_extract(F.col(url_col),
                                r"^https?://[^/]+(/.*)?$", 1)
    with_path = (urls
                 .withColumn("__host", link_host(F.col(url_col)))
                 .withColumn("__path",
                             F.when(raw_path == "", "/")
                             .otherwise(raw_path)))
    r = (rules
         .withColumn("__plain", ~F.col("prefix").rlike(r"[*]|[$]$"))
         .withColumn("__pat", _robots_rule_pattern())
         .withColumnRenamed("host", "__host"))
    matched = (with_path.select(url_col, "__host", "__path").distinct()
               .join(F.broadcast(r), "__host")
               .where(F.when(F.col("__plain"),
                             F.expr("startswith(__path, prefix)"))
                       .otherwise(
                           F.expr("regexp_like(__path, __pat)"))))
    verdict = matched.groupBy(url_col).agg(
        F.max(F.when(F.col("rule") == "allow",
                     F.length("prefix"))).alias("__a"),
        F.max(F.when(F.col("rule") == "disallow",
                     F.length("prefix"))).alias("__d"))
    blocked = (verdict
               .where(F.col("__d").isNotNull() &
                      (F.col("__d") >
                       F.coalesce(F.col("__a"), F.lit(-1))))
               .select(url_col))
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


def parse_html_tables(df: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id") -> DataFrame:
    """HTML table extraction: one output row per CELL —
    (id, table_idx, row_idx, col_idx, cell) — the structured-data
    recovery step of web-corpus curation (tables feed QA/table-QA
    training sets rather than the prose pipeline).

    Pure JVM: three regexp_extract_all levels (<table> → <tr> →
    <td|th>, non-greedy with (?is) so attributes, newlines and case
    survive), posexplode for the indices, then inner-tag strip +
    entity unescape + trim on the cell. Narrow, zero-shuffle."""
    tables = F.expr(
        f"regexp_extract_all({html_col}, "
        "'(?is)<table[^>]*>(.*?)</table>', 1)")
    t = df.select(id_col, F.posexplode(tables)
                  .alias("table_idx", "tbl"))
    rows = F.expr(
        "regexp_extract_all(tbl, '(?is)<tr[^>]*>(.*?)</tr>', 1)")
    r = t.select(id_col, "table_idx",
                 F.posexplode(rows).alias("row_idx", "row"))
    cells = F.expr(
        "regexp_extract_all(row, '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1)")
    c = r.select(id_col, "table_idx", "row_idx",
                 F.posexplode(cells).alias("col_idx", "raw"))
    cell = F.trim(F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("raw", r"(?is)<[^>]+>", " "),
                    "&lt;", "<"),
                "&gt;", ">"),
            "&amp;", "&"),
        r"\s+", " "))
    return c.select(
        id_col,
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("col_idx").cast("long").alias("col_idx"),
        cell.alias("cell"))


# --------------------------------------------------------------
# Public-suffix registrable-domain extraction (eTLD+1) — the crawl
# frontier / per-site grouping key (robots scope, politeness queues,
# per-site dedup all key on it). Algorithm per publicsuffix.org: the
# prevailing rule is the matching EXCEPTION rule if any (its suffix
# is the rule minus its leftmost label), else the LONGEST matching
# rule (wildcard '*.x' matches one extra label), else the implicit
# default rule '*'; the registrable domain is the public suffix plus
# exactly one more label, NULL when the host IS a public suffix.
# The embedded rule set is a representative SUBSET of the public
# suffix list (the full PSL is a continuously-updated data file;
# swap PSL_NORMAL/PSL_WILDCARD/PSL_EXCEPTION out for a full load).
PSL_NORMAL = [
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "ai", "dev", "app",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "jp", "co.jp", "ne.jp", "ac.jp", "or.jp",
    "au", "com.au", "net.au", "org.au", "edu.au",
    "de", "fr", "nl", "it", "es", "pl", "se",
    "br", "com.br", "net.br", "org.br",
    "cn", "com.cn", "net.cn", "org.cn",
    "in", "co.in", "net.in", "org.in",
    "us", "ca", "ru", "ch", "at", "be",
    # private-section entries behave identically in the algorithm
    "github.io", "blogspot.com", "s3.amazonaws.com",
]
PSL_WILDCARD = ["ck", "bd", "er", "fk"]       # '*.ck' etc.
PSL_EXCEPTION = ["www.ck", "city.kawasaki.jp"]


def registrable_domain(col):
    """Column expression: registrable domain (eTLD+1) of a lowercase
    hostname, entirely JVM-side and zero-shuffle. The rule tables
    compile into ONE map literal keyed by candidate suffix (value =
    rule class), and the candidate suffixes are materialized ONCE per
    row by a running right-to-left fold — so matching is n_labels map
    probes per host instead of the 3 × n_labels × |rules| string
    rebuild the naive form pays (measured 10×). Returns NULL for
    hosts that are themselves public suffixes."""
    host = F.lower(col)
    labels = F.split(host, "\\.")
    # rule map: suffix -> class (2 = exception, 1 = wildcard base,
    # 0 = normal). Exceptions win on lookup; a suffix appearing in
    # several lists keeps the strongest class.
    rule_items: dict[str, int] = {}
    for r in PSL_NORMAL:
        rule_items[r] = 0
    for r in PSL_WILDCARD:
        rule_items[r] = max(rule_items.get(r, 1), 1)
    for r in PSL_EXCEPTION:
        rule_items[r] = 2
    rule_map = F.create_map(
        *[x for kv in rule_items.items()
          for x in (F.lit(kv[0]), F.lit(kv[1]))])
    # EVERYTHING in one aggregate(init, merge, finish): Catalyst has
    # no common-subexpression elimination across Column references,
    # so a shared candidate-suffix fold referenced from each rule
    # class re-runs per reference (measured 13×, 120k hosts/s);
    # folding the suffix build, the per-class longest-match state AND
    # the final pick into one pass restores the one-fold cost. State:
    # arr = right-to-left candidate suffixes, e/n/w = longest
    # exception/normal/wildcard match (label counts, 0 = none).
    rev = F.reverse(labels)
    init = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(0).alias("e"), F.lit(0).alias("n"), F.lit(0).alias("w"))

    def merge(acc, lab):
        suf = F.when(F.size(acc["arr"]) == 0, lab).otherwise(
            F.concat(lab, F.lit("."),
                     F.element_at(acc["arr"], F.size(acc["arr"]))))
        i = F.size(acc["arr"]) + 1
        cls = rule_map[suf]
        return F.struct(
            F.concat(acc["arr"], F.array(suf)).alias("arr"),
            F.when(cls == 2, i).otherwise(acc["e"]).alias("e"),
            F.when(cls == 0, i).otherwise(acc["n"]).alias("n"),
            F.when(cls == 1, i).otherwise(acc["w"]).alias("w"))

    def finish(acc):
        nlab = F.size(acc["arr"])
        # a wildcard rule needs a real label in *-position
        wl = F.when((acc["w"] > 0) & (acc["w"] + 1 <= nlab),
                    acc["w"] + 1).otherwise(F.lit(1))
        nl = F.when(acc["n"] > 0, acc["n"]).otherwise(F.lit(1))
        ps = F.when(acc["e"] > 0, acc["e"] - 1) \
             .otherwise(F.greatest(nl, wl))
        # F.get is 0-based and NULL out of bounds — the "host IS a
        # public suffix" case falls out naturally
        return F.get(acc["arr"], ps)

    return F.aggregate(rev, init, merge, finish)
