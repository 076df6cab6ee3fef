"""Fuzzy string matching: edit-distance pairs/joins with a lossless
PassJoin segment-index prefilter (both the single-frame pairs and the
two-frame join).

The reference has no approximate string matching (its text dictionary
is exact, text/text.h); training-data curation needs it constantly —
near-identical titles, OCR'd names, URL variants.  Levenshtein is a
built-in on BOTH engines (Spark `levenshtein`, DuckDB `levenshtein`,
identical unit-cost semantics), so the gate row is value-exact against
a brute-force oracle while the Spark side runs the banded plan.

Candidate generation is PassJoin segment banding (Li/Deng/Feng 2011,
"PASS-JOIN: a partition-based method for similarity joins"): each
indexed string splits into d+1 segments; by pigeonhole, two strings
within edit distance d share at least one segment VERBATIM, at a
position that can shift by at most d — so candidates join on
(build length, segment index, segment text) equality, never a
crossJoin, and a fixed-length corpus no longer collapses to all-pairs
the way pure length banding does (the length band |l1-l2| <= d is
still implied: probes only enumerate build lengths in [l1-d, l1]).
Candidates per probe string are bounded by (d+1)^2 (2d+1) regardless
of corpus shape; a hot segment bucket (adversarial low-entropy text)
is a skew.salt_join candidate like any other equality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_len(l2: str, i: str, k: int) -> str:
    """SQL: length of segment ``i`` when a length-``l2`` string splits
    into ``k`` segments — first (l2 % k) segments get the extra char."""
    return f"(({l2} div {k}) + if({i} < {l2} % {k}, 1, 0))"


def _seg_start(l2: str, i: str, k: int) -> str:
    """SQL: 0-based start of segment ``i`` in the k-way partition."""
    return f"({i} * ({l2} div {k}) + least({i}, {l2} % {k}))"


def fuzzy_pairs(df: DataFrame, col: str, max_dist: int = 2) -> DataFrame:
    """Unordered pairs of DISTINCT non-null values of ``col`` within
    ``max_dist`` edits: (v1, v2, dist) with v1 < v2.

    PassJoin: the build side indexes each string's d+1 segments keyed
    (length, segment index, segment text); the probe side (the longer
    string of any candidate pair) enumerates, for every build length
    l2 in [l1-d, l1] and every segment, the substrings of itself with
    that segment's length whose start lies within ±d of the segment's
    position — the pigeonhole windows.  An equality join on the
    triple, a distinct on the (bounded) candidate pairs, one
    levenshtein filter.  No crossJoin, no O(n²) candidate set even
    when every string has the same length.
    """
    names = (df.select(F.col(col).cast("string").alias("v"))
               .where(F.col("v").isNotNull()).distinct())
    cand = _passjoin_candidates(names, int(max_dist))
    return (cand.withColumn("dist", F.levenshtein("v1", "v2"))
                .where(F.col("dist") <= int(max_dist))
                .select(F.least("v1", "v2").alias("v1"),
                        F.greatest("v1", "v2").alias("v2"), "dist"))


def _seg_index(names: DataFrame, d: int) -> DataFrame:
    """Build side of PassJoin: every string of the one-column frame
    ``names`` (column ``v``) split into d+1 segments, keyed
    (l2 = length, i = segment index, seg = segment text)."""
    k = d + 1
    seg_expr = f"""
      transform(sequence(0, {d}), i -> named_struct(
        'i', i,
        'seg', substring(v2, {_seg_start('l2', 'i', k)} + 1,
                         {_seg_len('l2', 'i', k)})))"""
    return (names.select(F.col("v").alias("v2"),
                         F.length("v").alias("l2"))
            .select("v2", "l2", F.explode(F.expr(seg_expr)).alias("u"))
            .select("v2", "l2", F.col("u.i").alias("i"),
                    F.col("u.seg").alias("seg")))


def _probe_windows(names: DataFrame, d: int) -> DataFrame:
    """Probe side of PassJoin: for every build length l2 in [l1-d, l1]
    and segment i, the substrings of v1 with that segment's length
    whose start lies within ±d of the segment's position.

    An untouched segment's position shifts by at most the net indels
    before it, |shift| <= d.  start stays inside [0, l1 - seg_len] by
    construction (seg_start <= l2 - seg_len <= l1 - seg_len when
    l2 <= l1), so the sequence is never reversed — which is why probes
    only enumerate SHORTER-or-equal build lengths; the longer-build
    direction is covered by probing from the other side."""
    k = d + 1
    ln, st = _seg_len("l2", "i", k), _seg_start("l2", "i", k)
    probe_expr = f"""
      flatten(transform(sequence(greatest(0, l1 - {d}), l1), l2 ->
        flatten(transform(sequence(0, {d}), i ->
          transform(
            sequence(greatest(0, {st} - {d}),
                     least(l1 - {ln}, {st} + {d})),
            p -> named_struct('l2', l2, 'i', i,
                              'seg', substring(v1, p + 1, {ln})))))))"""
    return (names.select(F.col("v").alias("v1"),
                         F.length("v").alias("l1"))
            .select("v1", "l1",
                    F.explode(F.expr(probe_expr)).alias("u"))
            .select("v1", "l1", F.col("u.l2").alias("l2"),
                    F.col("u.i").alias("i"),
                    F.col("u.seg").alias("seg")))


def _passjoin_candidates(names: DataFrame, d: int) -> DataFrame:
    """Distinct candidate pairs (v1, v2) from the PassJoin segment
    index over the one-column frame ``names`` (column ``v``).

    Orientation: the longer string always probes; equal lengths keep
    one order. A pair can match on several segments/windows — the
    distinct() is over candidate PAIRS (bounded), before levenshtein.
    """
    return (_probe_windows(names, d).join(_seg_index(names, d),
                                          ["l2", "i", "seg"])
            .where((F.col("l2") < F.col("l1"))
                   | ((F.col("l2") == F.col("l1"))
                      & (F.col("v2") < F.col("v1"))))
            .select("v1", "v2").distinct())


def _passjoin_value_pairs(lnames: DataFrame, rnames: DataFrame,
                          d: int) -> DataFrame:
    """Distinct candidate (lv, rv) pairs ACROSS two one-column frames
    (column ``v`` each) from the shared PassJoin segment machinery.

    Each side probes the other's shorter-or-equal strings (probe
    windows only enumerate build lengths <= the probe length, which
    keeps the window sequence well-formed): pass A covers candidates
    with len(rv) <= len(lv), pass B strictly len(lv) < len(rv) — every
    qualifying pair is generated by exactly one pass, so a fixed-
    length two-frame corpus stays segment-bucketed, never per-length
    all-pairs."""
    a = (_probe_windows(lnames, d)
         .join(_seg_index(rnames, d), ["l2", "i", "seg"])
         .select(F.col("v1").alias("lv"), F.col("v2").alias("rv")))
    b = (_probe_windows(rnames, d)
         .join(_seg_index(lnames, d), ["l2", "i", "seg"])
         .where(F.col("l2") < F.col("l1"))
         .select(F.col("v2").alias("lv"), F.col("v1").alias("rv")))
    return a.unionByName(b).distinct()


def fuzzy_join(left: DataFrame, right: DataFrame, left_col: str,
               right_col: str, max_dist: int = 2) -> DataFrame:
    """All (left row, right row) combinations whose strings are within
    ``max_dist`` edits, plus a ``dist`` column, with every non-key
    column of both sides carried through (right-side name collisions
    suffixed ``_r``, escalating to ``_r2``, ``_r3``, … when the
    suffixed name is itself taken).

    Matching runs at the DISTINCT-VALUE level through the two-frame
    PassJoin segment index (_passjoin_value_pairs), then the matched
    (lv, rv, dist) triples join back to the carrying rows by plain
    equality. A fixed-length corpus on both sides therefore stays
    segment-bucketed — the former length-band-only plan collapsed to
    per-length all-pairs there, a scale-killer the single-frame path
    already avoided."""
    lcols = set(left.columns)
    taken = set(lcols)

    def free(name):
        # guaranteed-unique rename: never collide with a left column,
        # an already-assigned right column, or the match-key temps
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
    if "dist" in taken or "dist" in rename.values():
        raise ValueError(
            "fuzzy_join emits a 'dist' column; rename the existing "
            "'dist' column on either input first")
    lv, rv = "__lv", "__rv"
    while lv in taken:
        lv += "_"
    taken.add(lv)
    while rv in taken:
        rv += "_"
    r2 = right.select(*[F.col(c).alias(rename[c]) for c in right.columns])
    rkey = rename[right_col]

    lnames = (left.select(F.col(left_col).cast("string").alias("v"))
                  .where(F.col("v").isNotNull()).distinct())
    rnames = (r2.select(F.col(rkey).cast("string").alias("v"))
                .where(F.col("v").isNotNull()).distinct())
    matches = (_passjoin_value_pairs(lnames, rnames, int(max_dist))
               .withColumn("dist", F.levenshtein("lv", "rv"))
               .where(F.col("dist") <= int(max_dist))
               .select(F.col("lv").alias(lv), F.col("rv").alias(rv),
                       "dist"))
    return (left
            .join(matches,
                  F.col(left_col).cast("string") == F.col(lv))
            .join(r2, F.col(rv) == F.col(rkey).cast("string"))
            .drop(lv, rv))
