"""WARC source (sources/warc.py): file-level binaryFile ingestion of
.warc / .warc.gz, record parsing, HTTP splitting, and the HTML-to-
text extraction contract (Spark regex pipeline == pure-Python twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.sources import warc as W


def _fixture(tmp_path, gz: bool):
    recs = [{"uri": f"http://ex.com/{i}",
             "date": "2026-01-01T00:00:00Z",
             "html": (f"<html><head><script>var x={i};</script>"
                      f"<style>p{{color:red}}</style></head>"
                      f"<body><h1>Doc {i}</h1><p>body &amp; {i}</p>"
                      f"<!-- hidden --></body></html>"),
             "status": 200 if i % 3 else 404}
            for i in range(6)]
    ext = "warc.gz" if gz else "warc"
    (tmp_path / f"a.{ext}").write_bytes(W.encode_warc(recs[:3], gz))
    (tmp_path / f"b.{ext}").write_bytes(W.encode_warc(recs[3:], gz))
    return recs


def test_read_warc_gzip_members(spark, tmp_path):
    _fixture(tmp_path, gz=True)
    df = W.read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    assert {r["warc_type"] for r in rows} == {"response"}
    assert sorted(r["http_status"] for r in rows) == [200] * 4 + [404] * 2
    assert all(r["target_uri"].startswith("http://ex.com/")
               for r in rows)
    assert all(r["path"].endswith(".warc.gz") for r in rows)


def test_read_warc_plain_and_extract(spark, tmp_path):
    _fixture(tmp_path, gz=False)
    docs = W.warc_text_documents(W.read_warc(spark, str(tmp_path)))
    got = {r["target_uri"]: r["text"] for r in docs.collect()}
    # 404s are filtered; script/style/comment/tags stripped,
    # entity decoded, whitespace collapsed
    assert len(got) == 4
    assert got["http://ex.com/1"] == "Doc 1 body & 1"
    assert "http://ex.com/0" not in got        # 404
    assert "http://ex.com/3" not in got        # 404


def test_html_to_text_spark_matches_python(spark):
    cases = [
        "<p>plain</p>",
        "<script>drop();</script>kept<style>x</style>",
        "a &amp; b &lt;c&gt; &quot;d&quot; &nbsp;e",
        "<!-- comment --><div attr='<x>'>text</div>",
        "  lots   of \t whitespace  ",
        "",
        # double-encoded: '&amp;lt;' must decode ONCE to '&lt;', not
        # cascade to '<' (the amp pass runs last on the JVM side)
        "&amp;lt;b&amp;gt; and &amp;amp; x",
        # numeric entities stay literal in BOTH twins
        "&#65;&#x41; &#160; &amp;#38;",
        # amp adjacent to other entities, mixed order
        "&lt;&amp; &amp;&lt; &amp;nbsp; &nbsp;amp;",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["html"])
    got = [r["t"] for r in
           df.select(W.html_to_text(F.col("html")).alias("t"))
             .collect()]
    assert got == [W.html_to_text_py(c) for c in cases]
    # absolute expectations (guards against both twins drifting the
    # same wrong way): single decode, numeric left literal
    assert (W.html_to_text_py("&amp;lt;b&amp;gt; and &amp;amp; x")
            == "&lt;b&gt; and &amp; x")
    assert W.html_to_text_py("&#65; and &amp;") == "&#65; and &"


def test_warc_oversized_file_clear_error(spark, tmp_path):
    """A file past the binaryFile row cap must fail UP FRONT with an
    actionable message (metadata-only check), not an opaque Arrow
    error deep in a task."""
    import pytest
    recs = [{"uri": "http://ex.com/big",
             "date": "2026-01-01T00:00:00Z",
             "html": "<p>" + "x" * 4096 + "</p>"}]
    (tmp_path / "big.warc.gz").write_bytes(W.encode_warc(recs))
    with pytest.raises(ValueError, match="max_file_bytes"):
        W.read_warc(spark, str(tmp_path), max_file_bytes=64)
    # under the cap the same file parses fine
    assert W.read_warc(spark, str(tmp_path)).count() == 1


def test_warc_corrupt_tail_is_graceful(spark, tmp_path):
    recs = [{"uri": "http://ex.com/ok",
             "date": "2026-01-01T00:00:00Z", "html": "<p>fine</p>"}]
    good = W.encode_warc(recs, gzip_members=True)
    (tmp_path / "t.warc.gz").write_bytes(good + b"\x1f\x8btrunc")
    rows = W.read_warc(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0]["target_uri"] == "http://ex.com/ok"


def test_parse_robots_sections_and_comments(spark):
    """Section tracking (rules bind to the governing User-agent
    group), comment stripping, empty-Disallow (allow-all) dropping,
    and prefix path semantics in the filter."""
    robots = spark.createDataFrame(
        [("h1", "User-agent: bot\nDisallow: /\n\n"
                "User-agent: *\n# note\nDisallow: /a  # inline\n"
                "Disallow:\nDisallow: /b/c\n"),
         ("h2", "User-agent: *\nDisallow: /x\n"),
         ("h3", "User-agent: bot\nDisallow: /\n")],
        ["host", "robots_txt"])
    rules = {(r["host"], r["rule"], r["prefix"])
             for r in W.parse_robots(robots).collect()}
    assert rules == {("h1", "disallow", "/a"),
                     ("h1", "disallow", "/b/c"),
                     ("h2", "disallow", "/x")}

    urls = spark.createDataFrame(
        [(1, "http://h1/a/page"), (2, "http://h1/ab"),
         (3, "http://h1/b/c"), (4, "http://h1/b/x"),
         (5, "http://h2/x"), (6, "http://h2/y"),
         (7, "http://h3/anything"), (8, "http://h9/else")],
        ["id", "url"])
    kept = {r["id"] for r in
            W.robots_filter(urls, W.parse_robots(robots)).collect()}
    # /ab IS blocked by prefix /a (startswith semantics); h3 blocks
    # only 'bot' (for '*' no group matches); unknown hosts pass
    assert kept == {4, 6, 7, 8}


def test_robots_rfc9309_allow_longest_match(spark):
    """RFC 9309 §2.2.2: the most specific (longest) matching rule
    wins; an Allow/Disallow tie goes to Allow."""
    robots = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /a\nAllow: /a/ok\n"
                "Disallow: /a/ok/sub\n"
                # tie: equal-length allow+disallow -> allow
                "Allow: /t/1\nDisallow: /t/1\n")],
        ["host", "robots_txt"])
    urls = spark.createDataFrame(
        [(1, "http://h1/a/x"),        # blocked by /a
         (2, "http://h1/a/ok"),       # allow /a/ok (5) > /a (2)
         (3, "http://h1/a/ok/deep"),  # still allowed
         (4, "http://h1/a/ok/sub/x"), # disallow (9) > allow (5)
         (5, "http://h1/t/1"),        # tie -> allow
         (6, "http://h1/zzz")],       # no rule matches -> allowed
        ["id", "url"])
    kept = {r["id"] for r in
            W.robots_filter(urls, W.parse_robots(robots)).collect()}
    assert kept == {2, 3, 5, 6}


def test_robots_rfc9309_group_selection_and_merge(spark):
    """Exact product-token match beats '*' (case-insensitive); '*'
    is only a fallback; adjacent User-agent lines share one group;
    same-token groups merge."""
    txt = ("User-agent: GoodBot\nUser-agent: other\nDisallow: /g\n\n"
           "User-agent: *\nDisallow: /s\n\n"
           "User-agent: goodbot\nDisallow: /g2\n")
    robots = spark.createDataFrame([("h1", txt)],
                                   ["host", "robots_txt"])
    got = {(r["rule"], r["prefix"]) for r in
           W.parse_robots(robots, user_agent="goodbot").collect()}
    # both goodbot groups merge; the '*' group is IGNORED (exact
    # match exists); the multi-UA group binds /g to goodbot too
    assert got == {("disallow", "/g"), ("disallow", "/g2")}
    other = {(r["rule"], r["prefix"]) for r in
             W.parse_robots(robots, user_agent="OTHER").collect()}
    assert other == {("disallow", "/g")}
    star = {(r["rule"], r["prefix"]) for r in
            W.parse_robots(robots).collect()}
    assert star == {("disallow", "/s")}
    none = {(r["rule"], r["prefix"]) for r in
            W.parse_robots(robots, user_agent="strangerbot").collect()}
    assert none == {("disallow", "/s")}  # falls back to '*'


def test_robots_rfc9309_wildcards_and_anchor(spark):
    """RFC 9309 §2.2.3: '*' matches any character sequence, a
    trailing '$' anchors the end of the path; regex metacharacters
    in rules stay literal."""
    robots = spark.createDataFrame(
        [("h1", "User-agent: *\nDisallow: /img*.png$\n"
                "Disallow: /tmp*\nDisallow: /lit+x\n")],
        ["host", "robots_txt"])
    urls = spark.createDataFrame(
        [(1, "http://h1/img123.png"),    # wildcard + anchor hit
         (2, "http://h1/img123.png/x"),  # anchor fails -> allowed
         (3, "http://h1/img.png"),       # '*' matches empty
         (4, "http://h1/tmp/a/b"),       # trailing '*' = prefix
         (5, "http://h1/lit+x/y"),       # '+' literal
         (6, "http://h1/litttx")],       # would match if '+' regex
        ["id", "url"])
    kept = {r["id"] for r in
            W.robots_filter(urls, W.parse_robots(robots)).collect()}
    assert kept == {2, 6}


def test_canonicalize_url_rfc3986(spark):
    """RFC 3986 §6 normalization: case, default ports, unreserved
    percent-escapes, escape-hex uppercasing, dot segments (incl. the
    trailing directory slash), empty path, opaque malformed escapes
    left alone."""
    cases = [
        ("HtTp://WwW.ExAmple.COM:80/a/./b/../C%6fde/x%2fy?q=%41#f",
         "http://www.example.com/a/Code/x%2Fy?q=A"),
        ("https://Host.Example:443/", "https://host.example/"),
        ("https://Host.Example:8443/p", "https://host.example:8443/p"),
        ("http://h", "http://h/"),
        ("http://h?x=1", "http://h/?x=1"),
        ("http://h/a/b/.", "http://h/a/b/"),
        ("http://h/a/b/..", "http://h/a/"),
        ("http://h/../x", "http://h/x"),
        ("http://h/%7Euser/%2d/%2F", "http://h/~user/-/%2F"),
        ("HTTP://h:80/a%3f b", "http://h/a%3F b"),
        ("http://h/a//b", "http://h/a//b"),   # empty segments kept
        ("http://h/%zz/x", "http://h/%zz/x"),  # malformed escape
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], ["u"])
    got = [r["c"] for r in
           df.select(W.canonicalize_url(F.col("u")).alias("c"))
           .collect()]
    assert got == [e for _, e in cases]


def _robots_model(groups, agent, path):
    """Pure-Python RFC 9309 reference: groups = [(tokens, rules)]
    with rules = [(kind, value)]; returns True if path is allowed."""
    import re as _re
    agent = agent.lower()
    sel = [r for toks, r in groups if agent in toks]
    if not sel:
        sel = [r for toks, r in groups if "*" in toks]
    best_a = best_d = -1
    for rules in sel:
        for kind, val in rules:
            if not val:
                continue
            anchored = val.endswith("$")
            body = val[:-1] if anchored else val
            pat = "^" + ".*".join(_re.escape(p)
                                  for p in body.split("*"))
            if anchored:
                pat += "$"
            if _re.match(pat, path):
                if kind == "allow":
                    best_a = max(best_a, len(val))
                else:
                    best_d = max(best_d, len(val))
    return not (best_d > best_a)


def test_robots_rfc9309_property(spark):
    """Deterministic pseudo-random rule files vs the pure-Python
    RFC 9309 model: group selection, merge, longest-match, ties,
    wildcards and anchors all at once."""
    import random
    rng = random.Random(9309)
    segs = ["/a", "/b", "/a/b", "/ab", "/img", "/x*", "/a*/c",
            "/a/b$", "/*.png$", "/"]
    agents = ["*", "bot", "crawler"]
    hosts, model_groups = [], {}
    for h in range(12):
        host = f"h{h}"
        lines, groups = [], []
        for _ in range(rng.randint(1, 3)):
            toks = rng.sample(agents, rng.randint(1, 2))
            rules = [(rng.choice(["allow", "disallow"]),
                      rng.choice(segs))
                     for _ in range(rng.randint(1, 4))]
            for t in toks:
                lines.append(f"User-agent: {t}")
            for kind, val in rules:
                lines.append(f"{kind.capitalize()}: {val}")
            lines.append("")
            groups.append(([t.lower() for t in toks], rules))
        hosts.append((host, "\n".join(lines)))
        model_groups[host] = groups
    robots = spark.createDataFrame(hosts, ["host", "robots_txt"])

    paths = ["/a", "/a/b", "/a/bb", "/ab", "/abc", "/img9.png",
             "/x7/c", "/axx/c", "/", "/zz"]
    urls = [(i, f"http://h{i % 12}{p}")
            for i, p in enumerate(paths * 12)]
    urls_df = spark.createDataFrame(urls, ["id", "url"])

    for agent in ["*", "bot"]:
        kept = {r["id"] for r in W.robots_filter(
            urls_df, W.parse_robots(robots, user_agent=agent))
            .collect()}
        expect = {i for i, u in urls
                  if _robots_model(
                      model_groups[u.split("/")[2]], agent,
                      "/" + u.split("/", 3)[3] if u.count("/") > 2
                      else "/")}
        assert kept == expect, (agent, kept ^ expect)


def test_parse_sitemap_optional_fields(spark):
    xml = ("<?xml version=\"1.0\"?><urlset>"
           "<url><loc> http://a/1 </loc>"
           "<lastmod>2026-01-02</lastmod>"
           "<priority>0.8</priority></url>"
           "<url><loc>http://a/2</loc></url>"
           "<url><lastmod>2026-01-03</lastmod></url>"  # no loc: drop
           "</urlset>")
    df = spark.createDataFrame([(1, xml)], ["doc_id", "sitemap_xml"])
    got = [(r["url_pos"], r["loc"], r["lastmod"], r["priority"])
           for r in W.parse_sitemap(df)
           .orderBy("url_pos").collect()]
    assert got == [(0, "http://a/1", "2026-01-02", 0.8),
                   (1, "http://a/2", None, None)]
