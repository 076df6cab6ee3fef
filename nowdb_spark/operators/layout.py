"""Multi-dimensional data layout: Z-order (Morton) clustering for
scan pruning on more than one predicate column.

The reference keeps each store stamp-sorted so time ranges read
sequential file spans (store/storewrk.c sorter, io/file.h:59-60
[from,to) periods) — a ONE-dimensional layout.  Parquet generalizes
this: every row group carries min/max stats per column, and Spark
prunes row groups whose stats exclude the predicate.  Sorting by one
column makes that column's stats tight and every other column's
useless; interleaving the bits of several columns (the Z-order curve)
makes every participating column's ranges *locally* tight, so
predicates on ANY subset of the curve columns prune.

Shape at 100 TB: one agg pass for per-column [min,max] (bounded: two
values per column on the driver), one map pass to emit the 48-bit
Morton key (pure Column bitwise ops, whole-stage codegen), one
repartitionByRange+sortWithinPartitions shuffle to cluster — the same
cost as the 1-D sort the reference's background sorter already pays.
`rowgroup_bounds`/`pruning_fraction` read footer statistics only (no
data pages) to quantify the effect.

No counterpart in the reference beyond the 1-D stamp sort; extension
component (the data-layout story for multi-key workloads).
"""

from __future__ import annotations

from functools import reduce
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS_DEFAULT = 16


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Rank col linearly onto [0, 2^bits): integer grid cell of the
    value inside its observed [lo, hi] range. Degenerate ranges map
    to 0."""
    top = (1 << bits) - 1
    # degenerate range: constant column, all-NULL column (agg min/max
    # come back None) or an empty frame — everything maps to cell 0
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    c = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)
         * F.lit(float(top)))
    cell = F.least(F.greatest(F.floor(c).cast("long"), F.lit(0)),
                   F.lit(top))
    # NULL values sort to cell 0 rather than poisoning the whole key
    return F.coalesce(cell, F.lit(0))


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave n scaled columns: output bit (i*n + j) is
    input j's bit i. n*bits must stay < 63."""
    n = len(scaled)
    terms = []
    for j, c in enumerate(scaled):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * n + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key(df: DataFrame, cols: list[str],
               bits: int = ZBITS_DEFAULT,
               ranges: dict[str, tuple[float, float]] | None = None
               ) -> DataFrame:
    """Attach ``__zkey``: the Morton code of ``cols`` (each linearly
    scaled to ``bits`` bits over its observed or supplied range).

    One agg pass for the ranges (skipped entirely when ``ranges`` is
    given — at 100 TB pass the catalog's known bounds), one codegen'd
    map pass for the key.
    """
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds int64")
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
                     F.max(F.col(c).cast("double")).alias(f"{c}__hi")]
        row = df.agg(*aggs).first()
        ranges = {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in cols}
    scaled = [_scaled(F.col(c), *ranges[c], bits) for c in cols]
    return df.withColumn("__zkey", _interleave(scaled, bits))


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int, bits: int = ZBITS_DEFAULT,
                   ranges: dict[str, tuple[float, float]] | None = None
                   ) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of ``cols``.  The key is dropped before writing — the
    pruning benefit lives in the per-column row-group statistics the
    clustering induces, not in the key itself."""
    z = zorder_key(df, cols, bits=bits, ranges=ranges)
    (z.repartitionByRange(n_files, "__zkey")
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path))


def rowgroup_bounds(path: str, cols: list[str]) -> list[dict]:
    """Per-row-group [min,max] for ``cols`` from parquet FOOTERS only
    (no data pages touched) — the same statistics Spark's scan uses
    to skip row groups."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).rglob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            rec = {"file": f.name, "rg": g}
            for c in cols:
                st = rg.column(names[c]).statistics
                rec[c] = (st.min, st.max) if st is not None else None
            out.append(rec)
    return out


def write_bloom_index(spark, data_path: str, col: str,
                      index_path: str, bits: int | None = None) -> None:
    """Per-FILE Bloom filter over ``col``, packed as 64-bit words —
    the point-lookup analogue of the Z-order clustering above, and
    with it the full scale-true image of the reference's CREATE INDEX
    (engine.py:252 keeps index DDL as metadata; the reference's btree
    serves range scans, which parquet stats + clustering already
    cover — what stats CANNOT serve is "which of 100k files might
    contain key X" on a non-clustered column, which is exactly a
    per-file Bloom).

    ``bits`` auto-sizes to ~10 bits per key per file (FP ~1% at 5
    hashes) from one column-pruned approx-distinct pass, so the
    filter never saturates as files grow — a fixed width would hit
    FP=1 at ~10k keys/file. The chosen width is stored IN the sidecar
    (``bits`` column), making probes self-describing. Build is one
    scan + one partial-aggregated groupBy(file, word) whose output is
    bounded by files x bits/64 rows; the sidecar is parquet like any
    sketch. Same md5 arithmetic as operators/sketches.py bloom_build,
    so false positives are deterministic and membership never false-
    negative: pruning is LOSSLESS for equality lookups."""
    from nowdb_spark.operators.sketches import (BLOOM_HASHES,
                                                _bloom_pos_sql)

    src = (spark.read.parquet(data_path)
           .select(F.col(col), F.input_file_name().alias("file"))
           .where(F.col(col).isNotNull()))
    if bits is None:
        est = src.agg(
            F.approx_count_distinct(col).alias("d"),
            F.countDistinct("file").alias("nf")).collect()[0]
        per_file = max(int(est["d"]) // max(int(est["nf"]), 1), 1)
        bits = 1 << max(16, (10 * per_file - 1).bit_length())
    # 28 uniform hash bits (see _bloom_pos_sql) bound the width
    bits = min(bits, 1 << 28)
    poss = ", ".join(_bloom_pos_sql(col, j, bits=bits)
                     for j in range(BLOOM_HASHES))
    # record the indexed column's Spark type: probes must be CAST to
    # it before hashing, else the string rendering diverges (a double
    # column renders 1.0 but an int probe renders 1 — every hash would
    # miss, a silent false NEGATIVE breaking the lossless guarantee)
    dtype = src.schema[col].dataType.simpleString()
    (src.select("file",
                F.explode(F.expr(f"array({poss})")).alias("pos"))
        .groupBy("file", F.expr("pos div 64").alias("word"))
        .agg(F.expr("bit_or(shiftleft(1L, int(pos % 64)))")
             .alias("mask"))
        .withColumn("bits", F.lit(bits))
        .withColumn("dtype", F.lit(dtype))
        .write.mode("overwrite").parquet(index_path))


def bloom_prune_files(spark, index_path: str, col: str,
                      values: list) -> list[str]:
    """Files that MAY contain any of ``values`` in ``col`` per the
    sidecar index — every file actually containing a probed value is
    returned (no false negatives); false positives only add files.
    The probe broadcasts len(values) x k (word, bit) probes against
    the packed index (bounded by files x bits/64 rows)."""
    from nowdb_spark.operators.sketches import (BLOOM_HASHES,
                                                _bloom_pos_sql)

    idx = spark.read.parquet(index_path)
    head = idx.select("bits", *(
        ["dtype"] if "dtype" in idx.columns else [])).first()
    if head is None:          # empty index: no file can match
        return []
    bits = head["bits"]
    probe = spark.createDataFrame([(v,) for v in values], [col])
    # cast probes to the INDEXED column's type so CAST(... AS STRING)
    # renders identically to the build side (int probe 1 vs double
    # column '1.0' would otherwise miss every hash — false negative).
    # A probe that casts to NULL cannot exist in a column of that
    # type, so dropping it is lossless.
    if "dtype" in idx.columns:
        probe = (probe.select(
                    F.col(col).try_cast(head["dtype"]).alias(col))
                      .where(F.col(col).isNotNull()))
    poss = ", ".join(
        f"named_struct('j', {j}, 'pos', "
        f"{_bloom_pos_sql(col, j, bits=bits)})"
        for j in range(BLOOM_HASHES))
    pv = (probe.select(F.col(col),
                       F.explode(F.expr(f"array({poss})")).alias("u"))
               .select(col, F.col("u.j").alias("j"),
                       F.expr("u.pos div 64").alias("word"),
                       F.expr("shiftleft(1L, int(u.pos % 64))")
                       .alias("bit")))
    hits = (idx.join(F.broadcast(pv), "word")
               .where(F.expr("(mask & bit) != 0"))
               .groupBy("file", col)
               .agg(F.countDistinct("j").alias("__hits"))
               .where(F.col("__hits") == BLOOM_HASHES)
               .select("file").distinct())
    return [r["file"] for r in hits.collect()]


def indexed_point_lookup(spark, data_path: str, index_path: str,
                         col: str, values: list):
    """Point lookup through the Bloom file index: prune the file list
    first, scan only surviving files. Result is identical to the full
    scan-and-filter; at 100k files a hot-key lookup touches the
    handful of files the index admits."""
    files = bloom_prune_files(spark, index_path, col, values)
    base = spark.read.parquet(data_path)
    # probes are compared after try_cast to the column's type (ANSI
    # mode would otherwise abort the whole query on one malformed
    # probe; a probe that casts to NULL simply matches nothing)
    dt = base.schema[col].dataType.simpleString()
    cond = reduce(
        lambda a, b: a | b,
        [F.col(col) == F.lit(v).try_cast(dt) for v in values])
    if not files:
        return base.limit(0).where(cond)
    return spark.read.parquet(*files).where(cond)


def pruning_fraction(path: str, predicates: dict[str, tuple]) -> float:
    """Fraction of row groups a stats-pruning scan SKIPS for the
    conjunctive box ``{col: (lo, hi)}`` — 0.0 means every row group
    intersects the box (no pruning), 1.0 means none does."""
    bounds = rowgroup_bounds(path, list(predicates))
    if not bounds:
        return 0.0
    hit = 0
    for rec in bounds:
        ok = True
        for c, (lo, hi) in predicates.items():
            if rec[c] is None:
                continue  # no stats -> cannot skip
            mn, mx = rec[c]
            if mx < lo or mn > hi:
                ok = False
                break
        hit += 1 if ok else 0
    return 1.0 - hit / len(bounds)
