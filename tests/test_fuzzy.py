"""Fuzzy matching: the banded plan must be LOSSLESS vs brute force,
never a crossJoin, and the two-frame join must carry payload through."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from nowdb_spark.operators.fuzzy import fuzzy_join, fuzzy_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = ["kitten", "sitting", "kitchen", "mitten", "bitten", "written",
         "flaw", "lawn", "flan", "plan", "plant", "sit", "fit", "fits",
         "a", "ab", "abc", ""]


def test_pairs_match_bruteforce(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], ["w"])
    got = {(r["v1"], r["v2"], r["dist"])
           for r in fuzzy_pairs(df, "w", max_dist=2).collect()}
    want = {(a, b, _lev(a, b)) if a < b else (b, a, _lev(a, b))
            for a, b in itertools.combinations(sorted(set(WORDS)), 2)
            if _lev(a, b) <= 2}
    assert got == want


def test_pairs_emit_each_pair_once(spark):
    df = spark.createDataFrame([("aa",), ("ab",), ("aa",)], ["w"])
    rows = fuzzy_pairs(df, "w", max_dist=1).collect()
    assert [tuple(r) for r in rows] == [("aa", "ab", 1)]


def test_pairs_no_crossjoin_plan(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], ["w"])
    plan = fuzzy_pairs(df, "w", max_dist=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_fuzzy_join_carries_payload(spark):
    left = spark.createDataFrame(
        [(1, "kitten"), (2, "zzz")], ["id", "name"])
    right = spark.createDataFrame(
        [(10, "mitten"), (11, "kitten"), (12, "unrelated")],
        ["id", "name"])
    out = fuzzy_join(left, right, "name", "name", max_dist=1)
    got = {(r["id"], r["id_r"], r["dist"]) for r in out.collect()}
    assert got == {(1, 10, 1), (1, 11, 0)}


def test_pairs_lossless_on_random_corpora(spark):
    """Property check: the length band must lose NOTHING vs brute
    force on adversarial-ish random corpora (clustered lengths, empty
    strings, repeats, unicode)."""
    import random
    rng = random.Random(99)
    alpha = "abcx "
    for trial in range(3):
        words = list({"".join(rng.choice(alpha)
                               for _ in range(rng.randrange(0, 9)))
                      for _ in range(60)})
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        d = trial + 1
        got = {(r["v1"], r["v2"], r["dist"])
               for r in fuzzy_pairs(df, "w", max_dist=d).collect()}
        want = {(a, b, _lev(a, b))
                for a, b in itertools.combinations(sorted(words), 2)
                if _lev(a, b) <= d}
        assert got == want, (trial, got ^ want)


def test_fuzzy_join_suffix_collision_safe(spark):
    """Right side carrying both c and c_r (with c also on the left)
    must produce unique output names, not an ambiguous duplicate."""
    from nowdb_spark.operators import fuzzy as FZ
    left = spark.createDataFrame([("abc", 1)], ["name", "c"])
    right = spark.createDataFrame([("abd", 2, 3)], ["name", "c", "c_r"])
    out = FZ.fuzzy_join(left, right, "name", "name", max_dist=1)
    assert len(out.columns) == len(set(out.columns))
    r = out.collect()[0]
    assert r["c"] == 1 and r["c_r"] == 3 and r["dist"] == 1
    # the renamed right-side c landed on a fresh name
    fresh = [c for c in out.columns
             if c not in {"name", "name_r", "c", "c_r", "dist"}]
    assert fresh and r[fresh[0]] == 2


def test_fuzzy_join_dist_collision_raises(spark):
    from nowdb_spark.operators import fuzzy as FZ
    import pytest
    left = spark.createDataFrame([("abc", 1)], ["name", "dist"])
    right = spark.createDataFrame([("abd",)], ["name"])
    with pytest.raises(ValueError):
        FZ.fuzzy_join(left, right, "name", "name")


def test_passjoin_fixed_length_candidates_subquadratic(spark):
    """A fixed-length corpus is exactly where pure length banding
    collapses to all n^2/2 pairs; the PassJoin segment index must keep
    candidates a small fraction of that while staying lossless."""
    import random

    from nowdb_spark.operators.fuzzy import (_passjoin_candidates,
                                             fuzzy_pairs)

    rng = random.Random(81)
    n = 600
    words = {"".join(rng.choice("abcdefgh") for _ in range(12))
             for _ in range(n)}
    df = spark.createDataFrame([(w,) for w in words], ["v"])
    n = len(words)
    cand = _passjoin_candidates(df, 2).count()
    assert cand < 0.10 * (n * (n - 1) / 2), (cand, n)
    # lossless vs brute force on the same corpus
    got = {(r["v1"], r["v2"]) for r in
           fuzzy_pairs(df, "v", max_dist=2).collect()}
    want = {(min(a, b), max(a, b))
            for a in words for b in words
            if a < b and _lev(a, b) <= 2}
    assert got == want


def test_passjoin_two_frame_candidates_subquadratic(spark):
    """Two-frame twin of the fixed-length degeneracy test: fuzzy_join
    on two fixed-length corpora must keep candidates segment-bucketed
    (a small fraction of n*m), not per-length all-pairs — and stay
    lossless vs brute force."""
    import random

    from nowdb_spark.operators.fuzzy import _passjoin_value_pairs

    rng = random.Random(82)
    lw = {"".join(rng.choice("abcdefgh") for _ in range(12))
          for _ in range(400)}
    rw = {"".join(rng.choice("abcdefgh") for _ in range(12))
          for _ in range(400)}
    ldf = spark.createDataFrame([(w,) for w in lw], ["v"])
    rdf = spark.createDataFrame([(w,) for w in rw], ["v"])
    cand = _passjoin_value_pairs(ldf, rdf, 2).count()
    assert cand < 0.10 * (len(lw) * len(rw)), (cand, len(lw), len(rw))

    # lossless: the joined result equals brute force over the values
    left = spark.createDataFrame([(w,) for w in lw], ["name"])
    right = spark.createDataFrame([(w,) for w in rw], ["name"])
    got = {(r["name"], r["name_r"], r["dist"]) for r in
           fuzzy_join(left, right, "name", "name", max_dist=2)
           .collect()}
    want = {(a, b, _lev(a, b)) for a in lw for b in rw
            if _lev(a, b) <= 2}
    assert got == want


def test_fuzzy_join_lossless_mixed_lengths(spark):
    """Cross-frame pairs where either side is longer (and empty/short
    strings) must all survive the two-pass orientation split."""
    import random
    rng = random.Random(7)
    alpha = "abx "
    lw = list({"".join(rng.choice(alpha) for _ in range(rng.randrange(0, 7)))
               for _ in range(40)})
    rw = list({"".join(rng.choice(alpha) for _ in range(rng.randrange(0, 7)))
               for _ in range(40)})
    left = spark.createDataFrame([(w,) for w in lw], ["name"])
    right = spark.createDataFrame([(w,) for w in rw], ["name"])
    for d in (1, 2):
        got = {(r["name"], r["name_r"], r["dist"]) for r in
               fuzzy_join(left, right, "name", "name", max_dist=d)
               .collect()}
        want = {(a, b, _lev(a, b)) for a in lw for b in rw
                if _lev(a, b) <= d}
        assert got == want, (d, got ^ want)


def test_fuzzy_join_plan_is_equality_join(spark):
    left = spark.createDataFrame([(f"word{i:04d}", i)
                                  for i in range(300)], ["name", "id"])
    right = spark.createDataFrame([(f"ward{i:04d}", i)
                                   for i in range(300)], ["name", "id"])
    plan = fuzzy_join(left, right, "name", "name", max_dist=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_passjoin_plan_is_equality_join(spark):
    """The candidate join must stay a hash/sort-merge equality join —
    never a nested-loop or cartesian product."""
    from nowdb_spark.operators.fuzzy import fuzzy_pairs
    df = spark.createDataFrame([(f"word{i:04d}",) for i in range(500)],
                               ["v"])
    plan = fuzzy_pairs(df, "v", max_dist=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
