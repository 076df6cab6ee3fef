"""Fuzzy string matching: edit-distance pairs/joins with a lossless
length-band prefilter.

The reference has no approximate string matching (its text dictionary
is exact, text/text.h); training-data curation needs it constantly —
near-identical titles, OCR'd names, URL variants.  Levenshtein is a
built-in on BOTH engines (Spark `levenshtein`, DuckDB `levenshtein`,
identical unit-cost semantics), so the gate row is value-exact against
a brute-force oracle while the Spark side runs the banded plan.

Banding: |len(a) - len(b)| <= d is NECESSARY for edit distance <= d,
so each value joins only the 2d+1 length buckets around its own — an
equality join on length, never a crossJoin.  Each candidate pair is
generated exactly once (the probe side explodes its own length ±d and
the build side keys by exact length).  At 100 TB the next tightening
is PassJoin-style segment banding (split into d+1 segments; two
strings within distance d must share one exact segment — pigeonhole);
the length band already removes the quadratic blowup for corpora with
spread-out lengths, and skew.salt_join handles a hot length bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(df: DataFrame, col: str, max_dist: int = 2) -> DataFrame:
    """Unordered pairs of DISTINCT non-null values of ``col`` within
    ``max_dist`` edits: (v1, v2, dist) with v1 < v2.

    One equality-join on string length (candidates = 2d+1 buckets per
    value), one levenshtein filter — no crossJoin, no O(n²) candidate
    set unless every string has the same length.
    """
    names = (df.select(F.col(col).cast("string").alias("v"))
               .where(F.col("v").isNotNull()).distinct())
    build = names.select(F.col("v").alias("v2"),
                         F.length("v").alias("__n2"))
    probe = names.select(
        F.col("v").alias("v1"),
        F.explode(F.sequence(F.length("v") - max_dist,
                             F.length("v") + max_dist)).alias("__n2"))
    # each unordered pair joins exactly once: (v1, v2) meets only in
    # the bucket len(v2), and the v1 < v2 filter keeps one of the two
    # orders — no distinct (and its shuffle) needed
    return (probe.join(build, "__n2")
                 .where(F.col("v1") < F.col("v2"))
                 .withColumn("dist", F.levenshtein("v1", "v2"))
                 .where(F.col("dist") <= max_dist)
                 .select("v1", "v2", "dist"))


def fuzzy_join(left: DataFrame, right: DataFrame, left_col: str,
               right_col: str, max_dist: int = 2) -> DataFrame:
    """All (left row, right row) combinations whose strings are within
    ``max_dist`` edits, plus a ``dist`` column — the length-banded
    equality join, with every non-key column of both sides carried
    through (right-side name collisions suffixed ``_r``, escalating to
    ``_r2``, ``_r3``, … when the suffixed name is itself taken)."""
    lcols = set(left.columns)
    taken = set(lcols)

    def free(name):
        # guaranteed-unique rename: never collide with a left column,
        # an already-assigned right column, or the dist/band temps
        cand, i = f"{name}_r", 2
        while cand in taken:
            cand, i = f"{name}_r{i}", i + 1
        return cand

    # two passes: non-colliding right names keep their name and are
    # reserved FIRST, so a later rename can't steal a name the right
    # side already owns (e.g. right has both c and c_r)
    rename = {c: c for c in right.columns if c not in lcols}
    taken |= set(rename.values())
    for c in right.columns:
        if c in lcols:
            rename[c] = free(c)
            taken.add(rename[c])
    band = "__n2"
    while band in taken or band in {"dist"}:
        band += "_"
    if "dist" in taken or "dist" in rename.values():
        raise ValueError(
            "fuzzy_join emits a 'dist' column; rename the existing "
            "'dist' column on either input first")
    r2 = right.select(*[F.col(c).alias(rename[c]) for c in right.columns])
    rkey = rename[right_col]
    probe = left.withColumn(
        band, F.explode(F.sequence(
            F.length(F.col(left_col).cast("string")) - max_dist,
            F.length(F.col(left_col).cast("string")) + max_dist)))
    build = r2.withColumn(band,
                          F.length(F.col(rkey).cast("string")))
    return (probe.join(build, band)
                 .withColumn("dist", F.levenshtein(
                     F.col(left_col).cast("string"),
                     F.col(rkey).cast("string")))
                 .where(F.col("dist") <= max_dist)
                 .drop(band))
