"""Z-order layout: the clustering must preserve content exactly and
must make row-group statistics prune on EVERY curve column — the
property a 1-D sort cannot deliver."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from nowdb_spark.operators import layout
from nowdb_spark.workload import table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def li(spark):
    return table(spark, SF_DIR, "lineitem")


def test_zkey_deterministic_and_bounded(spark, li):
    z = layout.zorder_key(li, ["l_partkey", "l_suppkey"], bits=16)
    row = z.agg(F.min("__zkey"), F.max("__zkey")).first()
    assert row[0] >= 0 and row[1] < (1 << 32)
    a = sorted(r["__zkey"] for r in z.select("__zkey").collect())
    b = sorted(r["__zkey"] for r in
               layout.zorder_key(li, ["l_partkey", "l_suppkey"],
                                 bits=16).select("__zkey").collect())
    assert a == b


def test_zkey_locality(spark):
    """Points adjacent in (x, y) land near each other on the curve:
    the max key gap inside any 2x2 cell block is far below the key
    span of a random pairing."""
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, ["x", "y"])
    z = layout.zorder_key(df, ["x", "y"], bits=5,
                          ranges={"x": (0, 31), "y": (0, 31)})
    keys = {(r["x"], r["y"]): r["__zkey"] for r in z.collect()}
    # canonical Morton property: key(x,y) == interleave bits exactly
    def morton(x, y):
        k = 0
        for i in range(5):
            k |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return k
    assert all(keys[(x, y)] == morton(x, y) for x, y in pts)


def test_roundtrip_preserves_content(spark, li, tmp_path):
    out = str(tmp_path / "zli")
    layout.write_zordered(li, out, ["l_partkey", "l_suppkey"],
                          n_files=8)
    back = spark.read.parquet(out)
    assert "__zkey" not in back.columns
    assert back.count() == li.count()
    a = li.select("l_orderkey", "l_linenumber").orderBy(
        "l_orderkey", "l_linenumber").collect()
    b = back.select("l_orderkey", "l_linenumber").orderBy(
        "l_orderkey", "l_linenumber").collect()
    assert a == b


def test_zorder_prunes_both_dims(spark, li, tmp_path):
    """The scale claim: a partkey-sorted layout prunes partkey
    predicates perfectly but leaves suppkey predicates unprunable;
    the Z-ordered layout prunes BOTH."""
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    layout.write_zordered(li, zdir, ["l_partkey", "l_suppkey"],
                          n_files=16)
    (li.repartitionByRange(16, "l_partkey")
       .sortWithinPartitions("l_partkey")
       .write.mode("overwrite").parquet(ldir))

    smin, smax = li.agg(F.min("l_suppkey"),
                        F.max("l_suppkey")).first()
    pmin, pmax = li.agg(F.min("l_partkey"),
                        F.max("l_partkey")).first()
    # narrow box on each dimension (~10% of the range)
    sbox = (smin, smin + max(1, (smax - smin) // 10))
    pbox = (pmin, pmin + max(1, (pmax - pmin) // 10))

    z_supp = layout.pruning_fraction(zdir, {"l_suppkey": sbox})
    l_supp = layout.pruning_fraction(ldir, {"l_suppkey": sbox})
    z_part = layout.pruning_fraction(zdir, {"l_partkey": pbox})
    l_part = layout.pruning_fraction(ldir, {"l_partkey": pbox})

    # linear layout: suppkey predicates prune (almost) nothing
    assert l_supp <= 0.10, l_supp
    # z-order: both dimensions prune substantially
    assert z_supp >= 0.40, z_supp
    assert z_part >= 0.40, z_part
    # the 1-D layout stays the optimum for ITS column — z-order trades
    # a bit of that for pruning on every curve column
    assert l_part >= z_part


def test_zorder_scan_correctness(spark, li, tmp_path):
    """Pruned scans return exactly the unclustered answer."""
    out = str(tmp_path / "zq")
    layout.write_zordered(li, out, ["l_partkey", "l_suppkey"],
                          n_files=8)
    back = spark.read.parquet(out)
    pred = (F.col("l_partkey") <= 20) & (F.col("l_suppkey") <= 3)
    want = li.where(pred).count()
    got = back.where(pred).count()
    assert got == want


def test_too_many_bits_rejected(spark, li):
    with pytest.raises(ValueError):
        layout.zorder_key(li, ["l_partkey", "l_suppkey", "l_orderkey",
                               "l_linenumber"], bits=16)


# --- asof_join (operators/timeseries.py) -----------------------------
# housed here to avoid a new module for two small operator batteries

def _aj():
    from nowdb_spark.operators.timeseries import asof_join
    return asof_join


def test_asof_backward_and_ties(spark):
    asof_join = _aj()
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c")],
        ["k", "ts", "lbl"])
    right = spark.createDataFrame(
        [(1, 100, 9.0), (1, 40, 7.0), (2, 11, 5.0)],
        ["k", "ts", "v"])
    out = {r["lbl"]: (r["ts_r"], r["v"]) for r in
           asof_join(left, right, ["k"], "ts").collect()}
    assert out["a"] == (100, 9.0)       # equal stamp matches (inclusive)
    assert out["b"] == (40, 7.0)
    assert out["c"] == (None, None)     # nothing at or before 10


def test_asof_forward(spark):
    asof_join = _aj()
    left = spark.createDataFrame([(1, 50, "b")], ["k", "ts", "lbl"])
    right = spark.createDataFrame(
        [(1, 40, 7.0), (1, 60, 8.0), (1, 90, 9.0)], ["k", "ts", "v"])
    r = asof_join(left, right, ["k"], "ts",
                  direction="forward").collect()[0]
    assert (r["ts_r"], r["v"]) == (60, 8.0)


def test_asof_tolerance(spark):
    asof_join = _aj()
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 500, "far")], ["k", "ts", "lbl"])
    right = spark.createDataFrame([(1, 90, 7.0)], ["k", "ts", "v"])
    out = {r["lbl"]: r["v"] for r in
           asof_join(left, right, ["k"], "ts",
                     tolerance_ns=50).collect()}
    assert out["a"] == 7.0
    assert out["far"] is None           # 410 > 50: match voided


def test_asof_single_shuffle_plan(spark):
    """The merge is ONE Exchange (key partition for the window) plus
    the union — never a range join / nested loop."""
    asof_join = _aj()
    left = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("ts"))
    right = spark.range(500).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 2).alias("ts"),
        F.col("id").cast("double").alias("v"))
    plan = asof_join(left, right, ["k"], "ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # union sides coalesce into one
                                        # hashpartitioning on k


def test_zorder_all_null_and_empty(spark):
    """Degenerate inputs: all-NULL curve column and empty frames get
    key 0 instead of crashing on None ranges."""
    df = spark.createDataFrame([(None, 1), (None, 2)], "a int, b int")
    z = layout.zorder_key(df, ["a", "b"])
    assert z.count() == 2 and all(r["__zkey"] is not None
                                  for r in z.collect())
    empty = spark.createDataFrame([], "a int, b int")
    assert layout.zorder_key(empty, ["a", "b"]).count() == 0


def test_asof_null_payload_keeps_row_integrity(spark):
    """The matched right ROW travels as one struct: a NULL payload
    value must stay NULL, not resurrect a staler row's value."""
    asof_join = _aj()
    left = spark.createDataFrame([(1, 3)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 1, 5.0, 7.0), (1, 2, None, 9.0)],
        "k long, ts long, x double, y double")
    r = asof_join(left, right, ["k"], "ts").collect()[0]
    assert (r["ts_r"], r["x"], r["y"]) == (2, None, 9.0)


def test_asof_null_keys_never_match(spark):
    """SQL equality: NULL keys match nothing on either side."""
    asof_join = _aj()
    left = spark.createDataFrame([(None, 5), (1, 5)], "k int, ts long")
    right = spark.createDataFrame([(None, 4, 1.0), (1, 4, 2.0)],
                                  "k int, ts long, v double")
    out = {r["k"]: r["v"] for r in
           asof_join(left, right, ["k"], "ts").collect()}
    assert out[1] == 2.0
    assert out[None] is None


def test_asof_null_timestamps_never_match(spark):
    """DuckDB-native-ASOF semantics: ts >= NULL is never true. A right
    row with a NULL timestamp must not leak payload (it would sort
    NULLS FIRST into the carry window), and a left row with a NULL
    timestamp matches nothing — in BOTH directions."""
    asof_join = _aj()
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, None, "null_ts")], "k int, ts long, lbl string")
    right = spark.createDataFrame(
        [(1, None, 42.0), (1, 3, 7.0)], "k int, ts long, v double")
    for direction, want_a in (("backward", (3, 7.0)),
                              ("forward", (None, None))):
        out = {r["lbl"]: (r["ts_r"], r["v"]) for r in
               asof_join(left, right, ["k"], "ts",
                         direction=direction).collect()}
        assert out["a"] == want_a, direction
        assert out["null_ts"] == (None, None), direction
    # NULL-ts right rows alone → every left row unmatched
    right2 = spark.createDataFrame([(1, None, 42.0)],
                                   "k int, ts long, v double")
    r = asof_join(left.where("ts is not null"), right2,
                  ["k"], "ts").collect()[0]
    assert (r["ts_r"], r["v"]) == (None, None)


# --- bloom file index (operators/layout.py) ---------------------------

def test_bloom_file_index_lossless_and_prunes(spark, tmp_path):
    """Point lookups through the per-file Bloom sidecar return exactly
    the full-scan result while touching a fraction of the files."""
    data, idx = str(tmp_path / "data"), str(tmp_path / "idx")
    df = spark.range(16_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    df.repartitionByRange(16, "k").write.parquet(data)
    layout.write_bloom_index(spark, data, "k", idx)

    files = layout.bloom_prune_files(spark, idx, "k", [12_345])
    n_files = len(list(Path(data).glob("*.parquet")))
    assert n_files >= 12
    assert 1 <= len(files) <= 3, files        # lossless, tiny FP tail

    got = sorted(tuple(r) for r in layout.indexed_point_lookup(
        spark, data, idx, "k", [12_345, 7]).collect())
    want = sorted(tuple(r) for r in
                  spark.read.parquet(data)
                  .where(F.col("k").isin([12_345, 7])).collect())
    assert got == want and len(got) == 2

    # absent key: no false negatives possible; result stays empty even
    # if a false-positive file is scanned
    assert layout.indexed_point_lookup(
        spark, data, idx, "k", [999_999]).count() == 0


def test_bloom_file_index_probe_type_coercion(spark, tmp_path):
    """Probe values whose Python type renders differently from the
    indexed column's (int 1 vs double '1.0', str vs int) must still
    hit: the sidecar stores the column dtype and probes are cast to it
    before hashing — otherwise every hash misses silently (a false
    negative, contradicting the lossless guarantee)."""
    data, idx = str(tmp_path / "data"), str(tmp_path / "idx")
    df = spark.range(4_000).select(
        (F.col("id").cast("double")).alias("k"),
        (F.col("id") * 3).alias("v"))
    df.repartitionByRange(8, "k").write.parquet(data)
    layout.write_bloom_index(spark, data, "k", idx)
    assert spark.read.parquet(idx).select("dtype").first()["dtype"] \
        == "double"

    # int probe against the double column: '123' vs '123.0'
    got = layout.indexed_point_lookup(
        spark, data, idx, "k", [123, 2000]).count()
    assert got == 2
    # string probe renders differently again
    assert layout.indexed_point_lookup(
        spark, data, idx, "k", ["123"]).count() == 1
    # unrepresentable probe casts to NULL -> dropped, empty result
    assert layout.indexed_point_lookup(
        spark, data, idx, "k", ["not-a-number"]).count() == 0

    # and the symmetric case: int column, string probe
    data2, idx2 = str(tmp_path / "d2"), str(tmp_path / "i2")
    (spark.range(2_000).select(F.col("id").alias("k"))
     .repartitionByRange(4, "k").write.parquet(data2))
    layout.write_bloom_index(spark, data2, "k", idx2)
    assert layout.indexed_point_lookup(
        spark, data2, idx2, "k", ["777"]).count() == 1


def test_bloom_file_index_autosizes_past_saturation(spark, tmp_path):
    """50k distinct keys per file would saturate a fixed 65536-bit
    filter (FP -> 1, pruning 0 — exactly what the bench's 10M-row
    probe measured); the auto-sized width keeps pruning sharp."""
    data, idx = str(tmp_path / "data"), str(tmp_path / "idx")
    (spark.range(200_000).select(F.col("id").alias("k"))
     .repartitionByRange(4, "k").write.parquet(data))
    layout.write_bloom_index(spark, data, "k", idx)

    sidecar = spark.read.parquet(idx)
    assert sidecar.select("bits").first()["bits"] >= (1 << 19)
    files = layout.bloom_prune_files(spark, idx, "k", [123_456])
    assert len(files) == 1
