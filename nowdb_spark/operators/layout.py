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
