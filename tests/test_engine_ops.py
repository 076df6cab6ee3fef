"""Engine operational surface: cursors (FETCH/CLOSE), compaction,
bulk insert, uint64 ingest policy, error robustness."""

from __future__ import annotations

import pytest

from nowdb_spark.engine import Engine
from nowdb_spark.results import ReportResult, RowResult
from nowdb_spark.sources.compact import context_file_stats


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(spark, tmp_path_factory.mktemp("ops_wh"))
    e.rexecute("create scope ops")
    e.rexecute("use ops")
    e.rexecute("create type item (k uint pk, name text, v float)")
    e.rexecute("create type tick (k uint pk, stamp time timestamp, "
               "v float)")
    return e


def test_bulk_insert_and_select(eng):
    r = eng.insert_rows("item", [(i, f"n{i}", float(i) / 2) for i in range(50)])
    assert isinstance(r, ReportResult) and r.affected == 50
    assert eng.one_value("select count(*) from item") == 50


def test_fetch_close_cursors(eng):
    cur = eng.rexecute("select k, name from item order by k")
    cid = cur.cursor_id
    batch = eng.rexecute(f"fetch {cid} limit 10")
    assert isinstance(batch, RowResult)
    assert batch.count() == 10
    assert batch._rows[0][0] == 0
    batch2 = eng.rexecute(f"fetch {cid} limit 10")
    assert batch2._rows[0][0] == 10  # cursor advanced
    assert eng.rexecute(f"close {cid}").ok()
    r = eng.execute(f"fetch {cid}")
    assert not r.ok() and "no such cursor" in r.details()


def test_uint_guard_insert(eng):
    r = eng.execute("insert into item (k, name) values (-1, 'neg')")
    assert not r.ok() and "uint" in r.details()
    big = 2**63  # > i64 max
    r = eng.execute(f"insert into item (k, name) values ({big}, 'big')")
    assert not r.ok() and "range" in r.details()


def test_uint_guard_load(eng, tmp_path):
    csv = tmp_path / "items.csv"
    csv.write_text("60;ok;1.5\n-5;neg;2.5\n61;ok2;3.5\n")
    r = eng.rexecute(f"load '{csv}' into item as item")
    assert r.affected == 2
    assert r.errors == 1
    assert eng.one_value(
        "select count(*) from item where k < 0") == 0


def test_compaction(eng):
    # row-at-a-time inserts → many small files (pending-file analogue)
    for i in range(12):  # 12 tiny files across 2 day-buckets
        ns = 1_514_764_800_000_000_000 + i * 4 * 3_600_000_000_000
        eng.rexecute(f"insert into tick values ({i}, {ns}, {float(i)})")
    ctx = eng.scope.context_dir("tick")
    n_before, _ = context_file_stats(ctx)
    assert n_before >= 12
    report = eng.compact("tick")
    assert report["files_after"] < report["files_before"]
    # data survives byte-identically
    got = sorted(tuple(r.row()) for r in
                 eng.rexecute("select k, stamp, v from tick"))
    assert len(got) == 12
    assert got[0][0] == 0 and got[11][0] == 11
    # period pruning still works after compaction (first day = 6 rows)
    cnt = eng.one_value(
        "select count(*) from tick where stamp >= '2018-01-01' "
        "and stamp < '2018-01-02'")
    assert cnt == 6


def test_update(eng):
    eng.rexecute("create type acct (k uint pk, bal float, tag text)")
    eng.insert_rows("acct", [(i, float(i * 10), "old") for i in range(10)])
    r = eng.rexecute("update acct set bal = bal * 2.0, tag = 'boosted' "
                     "where k >= 5")
    assert r.affected == 5
    got = {r0.row()[0]: (r0.row()[1], r0.row()[2]) for r0 in
           eng.rexecute("select k, bal, tag from acct")}
    for k in range(10):
        if k >= 5:
            assert got[k] == (k * 20.0, "boosted")
        else:
            assert got[k] == (k * 10.0, "old")


def test_delete(eng):
    r = eng.rexecute("delete from acct where tag = 'boosted'")
    assert r.affected == 5
    assert eng.one_value("select count(*) from acct") == 5
    r = eng.rexecute("delete from acct")
    assert r.affected == 5
    assert eng.one_value("select count(*) from acct") == 0


def test_update_unknown_field(eng):
    eng.insert_rows("acct", [(1, 1.0, "x")])
    r = eng.execute("update acct set nope = 1 where k = 1")
    assert not r.ok() and "unknown field" in r.details()


def test_multi_format_mounts(eng, tmp_path):
    (tmp_path / "j").mkdir()
    (tmp_path / "j" / "d.json").write_text(
        '{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    eng.scope.mount("jt", str(tmp_path / "j"), fmt="json")
    assert eng.one_value("select count(*) from jt") == 2
    assert eng.one_value("select b from jt where a = 2") == "y"

    (tmp_path / "c").mkdir()
    (tmp_path / "c" / "d.csv").write_text("a,b\n5,p\n6,q\n")
    eng.scope.mount("ct", str(tmp_path / "c"), fmt="csv",
                    options={"header": "true", "inferSchema": "true"})
    got = sorted(tuple(r.row()) for r in
                 eng.rexecute("select a, b from ct"))
    assert got == [(5, "p"), (6, "q")]


def test_explain_statement(eng):
    r = eng.rexecute("explain select k, bal from acct where k > 2")
    assert isinstance(r, RowResult)
    plan = "\n".join(row[0] for row in r._rows)
    assert "Physical Plan" in plan
    assert "PushedFilters" in plan and "k" in plan


def test_storage_compression_zstd(eng):
    eng.rexecute("create storage zs set compression = 'zstd'")
    eng.rexecute("create type zrow (k uint pk, v text) storage = zs")
    eng.rexecute("insert into zrow values (1, 'hello zstd world')")
    ctx = eng.scope.context_dir("zrow")
    files = list(ctx.rglob("*.parquet"))
    assert files and all(".zstd." in f.name for f in files), files
    assert eng.one_value("select v from zrow where k = 1") \
        == "hello zstd world"


def test_spark_error_is_nok_not_raise(eng):
    # binder passes but Spark rejects at analysis time → ErrorResult
    r = eng.execute("select no_such_column from item")
    assert not r.ok()
    assert r.code() in (1, 2)


def test_strict_flag_not_contagious(eng):
    # non-strict engine accepts general select lists with group by
    r = eng.execute("select count(*), name from item group by name")
    assert r.ok(), r.details()


def test_multirow_insert(spark, tmp_path_factory):
    from nowdb_spark.engine import Engine
    from nowdb_spark.results import ReportResult
    e = Engine(spark, tmp_path_factory.mktemp("multirow"))
    assert e.execute("create scope mr").ok()
    assert e.execute("use mr").ok()
    assert e.execute(
        "create type seqd (sid uint pk inc, label text, v float)").ok()
    r = e.execute(
        "insert into seqd (label, v) values ('a', 1.5), ('b', 2.5), "
        "('c', 3.5)")
    assert isinstance(r, ReportResult), r.details()
    assert r.affected == 3
    got = sorted(tuple(x.row()) for x in e.rexecute(
        "select sid, label, v from seqd"))
    # INC assigns a dense block across the tuples
    assert got == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]
    # single-row path still fine, sequence continues
    assert e.execute("insert into seqd (label, v) values ('d', 4.5)").ok()
    assert e.one_value("select count(*) from seqd") == 4
    assert e.one_value(
        "select sid from seqd where label = 'd'") == 4
    # mismatched tuple arity is rejected
    r = e.execute("insert into seqd (label, v) values ('x', 1.0), ('y')")
    assert not r.ok() and "mismatch" in r.details()


# --- builtin pipeline procedures (procs.py) -------------------------

def test_builtin_pipeline_procs(spark, tmp_path):
    from nowdb_spark.engine import Engine
    from nowdb_spark.results import CursorResult

    e = Engine(spark, tmp_path / "wh")
    assert e.execute("create scope pipes").ok()
    assert e.execute("use pipes").ok()
    assert e.execute("create type docs (doc_id uint pk, text text, "
                     "lang text)").ok()
    rows = [(0, "alpha beta gamma", "en"), (1, "alpha beta gamma", "en"),
            (2, "delta epsilon zeta", "fr"), (3, "alpha beta delta", "en")]
    for did, txt, lg in rows:
        assert e.execute(
            f"insert into docs (doc_id, text, lang) "
            f"values ({did}, '{txt}', '{lg}')").ok()

    r = e.rexecute("exec pipe.exact_dedup('docs')")
    assert isinstance(r, CursorResult)
    got = {t[0]: t[3] for t in r.fetch(100)}       # id -> is_dup
    assert got[1] is True and got[0] is False and got[2] is False

    r = e.rexecute("exec pipe.dsir_weights('docs', 'lang', 'en', 64)")
    scores = {t[0]: t[1] for t in r.fetch(100)}
    assert len(scores) == 4
    assert min(scores[0], scores[1], scores[3]) > scores[2]

    r = e.rexecute("exec pipe.bpe_tokenize('docs', 4)")
    toks = {t[0]: t[1] for t in r.fetch(100)}
    assert len(toks) == 4 and all(len(v) >= 1 for v in toks.values())

    r = e.rexecute("exec pipe.text_stats('docs')")
    assert len(r.fetch(100)) == 4

    r = e.rexecute("exec pipe.profile('docs')")
    prof = {t[0]: t for t in r.fetch(100)}
    assert prof["doc_id"][1] == 4 and prof["doc_id"][3] == 4
    assert prof["lang"][3] == 2          # en, fr

    r = e.rexecute("exec pipe.line_dedup('docs')")
    ld = {t[0]: (t[1], t[2], t[3]) for t in r.fetch(100)}
    assert ld[1] == ("", 0, 1)            # exact clone of doc 0: emptied
    assert ld[0][0] == "alpha beta gamma" and ld[0][1] == 1

    r = e.rexecute("exec pipe.domain_mix('docs', 'lang', 3, 0.5, 13)")
    dm = [t for t in r.fetch(100)]
    by_lang = {}
    for t in dm:
        by_lang[t[1]] = by_lang.get(t[1], 0) + 1
    # weights sqrt(3):sqrt(1) -> quotas floor(3*.634)=1, floor(3*.366)=1
    assert by_lang == {"en": 1, "fr": 1}

    # sketch / fuzzy procedures (round 7)
    r = e.rexecute("exec pipe.hll_distinct('docs', 'text')")
    est = r.fetch(10)[0]
    assert abs(est[2] - 3) < 0.5                   # 3 distinct texts
    r = e.rexecute("exec pipe.heavy_hitters('docs', 'lang', 3)")
    hh = {t[0]: t[1] for t in r.fetch(10)}
    assert hh == {"en": 3}
    r = e.rexecute("exec pipe.quantiles('docs', 'doc_id', 100)")
    qs = {t[0]: t[1] for t in r.fetch(20)}
    assert qs[0.5] == 1.0                          # median of 0..3
    r = e.rexecute("exec pipe.fuzzy_pairs('docs', 'text', 2)")
    fz = {(t[0], t[1]) for t in r.fetch(10)}
    # 'alpha beta gamma' vs 'alpha beta delta': distance 4 — excluded;
    # no pair of the three distinct texts is within 2 edits
    assert fz == set()


def test_like_between_predicates(eng, spark):
    """LIKE / NOT LIKE / BETWEEN / NOT BETWEEN (dialect extensions —
    the reference grammar stubs them out, nowdbsql.y:846); strict
    mode rejects both."""
    from nowdb_spark.engine import Engine

    total = eng.one_value("select count(*) from item")
    got = [r[0] for r in eng.rexecute(
        "select k from item where name like 'n1%' order by k").fetch()]
    assert [k for k in got if k < 50] == [1] + list(range(10, 20))
    n = eng.one_value(
        "select count(*) from item where name not like 'n1%'")
    assert n == total - len(got)
    rows = eng.rexecute(
        "select k from item where k between 5 and 8 order by k").fetch()
    assert [r[0] for r in rows] == [5, 6, 7, 8]
    n = eng.one_value(
        "select count(*) from item where k not between 5 and 8")
    assert n == total - 4
    # composes with other conjuncts and expressions
    n = eng.one_value("select count(*) from item "
                      "where k between 5 and 8 and name like 'n%'")
    assert n == 4
    strict = Engine(spark, eng.base, strict=True)
    assert strict.execute("use ops").ok()
    r = strict.execute("select count(*) from item where k between 1 and 2")
    assert not r.ok() and "strict" in r.details()
    r = strict.execute("select count(*) from item where name like 'n%'")
    assert not r.ok() and "strict" in r.details()


def test_storage_sizing_presets(eng):
    """CREATE <sizing> STORAGE (nowdbsql.y:409, storage.c:261-302):
    TINY maps to COMP_FLAT (uncompressed parquet), the bigger presets
    default to zstd; explicit compression overrides; sizing drives
    the compaction target file size."""
    eng.rexecute("create tiny storage tinyst")
    eng.rexecute("create type trow (k uint pk, v text) storage = tinyst")
    eng.rexecute("insert into trow values (1, 'flat bytes')")
    files = list(eng.scope.context_dir("trow").rglob("*.parquet"))
    assert files and not any(".zstd." in f.name for f in files), files

    eng.rexecute("create medium storage medst")
    eng.rexecute("create type mrow (k uint pk, v text) storage = medst")
    eng.rexecute("insert into mrow values (1, 'zstd default')")
    files = list(eng.scope.context_dir("mrow").rglob("*.parquet"))
    assert files and all(".zstd." in f.name for f in files), files

    # explicit compression beats the preset default
    eng.rexecute("create huge storage hugest set compression = 'snappy'")
    eng.rexecute("create type hrow (k uint pk, v text) storage = hugest")
    eng.rexecute("insert into hrow values (1, 'snappy wins')")
    files = list(eng.scope.context_dir("hrow").rglob("*.parquet"))
    assert files and all(".snappy." in f.name for f in files), files

    # SET size = <preset> spelling reaches the same table
    eng.rexecute("create storage szopt set size = tiny")
    assert eng.scope.meta.storages["szopt"]["size"] == "tiny"

    # sizing prefix parses on INDEX (metadata-only; no B-trees here)
    assert eng.execute(
        "create small index idx_sz on item (name)").ok()
    # ... and rejects other objects
    r = eng.execute("create big scope nope")
    assert not r.ok()


def test_bloom_index_procs(spark, tmp_path):
    """EXECUTE pipe.bloom_index builds the per-file sidecar for a
    stored context; pipe.bloom_lookup answers a point lookup through
    it with exactly the full-filter rows."""
    from nowdb_spark.engine import Engine
    from nowdb_spark.results import CursorResult

    e = Engine(spark, tmp_path / "wh")
    assert e.execute("create scope bidx").ok()
    assert e.execute("use bidx").ok()
    assert e.execute("create type kv (k uint pk, v float)").ok()
    vals = ", ".join(f"({i}, {i * 1.5})" for i in range(200))
    assert e.execute(f"insert into kv (k, v) values {vals}").ok()

    r = e.rexecute("exec pipe.bloom_index('kv', 'k')")
    assert isinstance(r, CursorResult)
    files_indexed, bits_set = r.fetch(1)[0]
    assert files_indexed >= 1 and bits_set > 0

    r = e.rexecute("exec pipe.bloom_lookup('kv', 'k', 117)")
    got = r.fetch(10)
    assert len(got) == 1 and got[0][0] == 117 and got[0][1] == 175.5

    r = e.rexecute("exec pipe.bloom_lookup('kv', 'k', 100000)")
    assert r.fetch(10) == []
