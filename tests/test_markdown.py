"""markdown_to_text: the markdown twin of html_to_text (all JVM)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.operators.textops import markdown_to_text


def test_markdown_strip_cases(spark):
    cases = [
        ("# Title\n**bold** and *ital* text",
         "Title bold and ital text"),
        ("see [docs](http://x/y) and ![pic](u.png)!",
         "see docs and pic!"),
        ("```py\ncode body\n```\nafter `inline` done",
         "after inline done"),
        ("> quoted\n> lines\n\n---\n\nplain",
         "quoted lines plain"),
        # intraword underscores are NOT emphasis (CommonMark §6.2)
        ("__strong__ _em_ but mid_word_stays",
         "strong em but mid_word_stays"),
        ("###### h6\nno #hash mid-line", "h6 no #hash mid-line"),
        ("", ""),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], ["md"])
    got = [r["t"] for r in
           df.select(markdown_to_text(F.col("md")).alias("t"))
             .collect()]
    assert got == [w for _, w in cases]


def test_split_sentences_cases(spark):
    """Boundary rules: .!? + whitespace + opener; abbreviation guard
    (Dr./Mr./e.g./et al.); decimals untouched; no trailing split."""
    from pyspark.sql import functions as F

    from nowdb_spark.operators.textops import split_sentences

    cases = [
        ("One sentence.", ["One sentence."]),
        ("First one. Second one! Third? Yes.",
         ["First one.", "Second one!", "Third?", "Yes."]),
        ("Dr. Who went home. He slept.",
         ["Dr. Who went home.", "He slept."]),
        ("See Smith et al. 2020 for proof. Next.",
         ["See Smith et al. 2020 for proof.", "Next."]),
        ("Use e.g. APIs here. Fine.", ["Use e.g. APIs here.", "Fine."]),
        ("A value 3.14 is pi. New one.",
         ["A value 3.14 is pi.", "New one."]),
        ("Quote end. \"Start\" here.",
         ["Quote end.", "\"Start\" here."]),
        ("lowercase next. not split", ["lowercase next. not split"]),
        ("Ends mid sentence", ["Ends mid sentence"]),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], ["t"])
    got = [r["s"] for r in
           df.select(split_sentences(F.col("t")).alias("s")).collect()]
    assert got == [e for _, e in cases]


def test_chunk_overlap_windows(spark):
    from nowdb_spark.operators.textops import chunk_overlap

    toks40 = " ".join(f"t{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, toks40),                       # 40 tokens → starts 0,16,32
         (2, "a b c"),                      # shorter than one window
         (3, ""),                           # empty → no chunks
         (4, "  x   y  ")],                 # ragged whitespace
        "doc_id long, text string")
    got = {(r.doc_id, r.chunk_idx): r
           for r in chunk_overlap(df, size=24, overlap=8).collect()}
    assert sorted(got) == [(1, 0), (1, 1), (1, 2), (2, 0), (4, 0)]
    assert got[(1, 0)].n_tokens == 24
    assert got[(1, 0)].chunk.split(" ") == [f"t{i}" for i in range(24)]
    # overlap: second window starts at 16
    assert got[(1, 1)].chunk.split(" ")[0] == "t16"
    assert got[(1, 1)].n_tokens == 24
    assert got[(1, 2)].n_tokens == 8        # 40 - 32
    assert got[(2, 0)].n_tokens == 3 and got[(2, 0)].chunk == "a b c"
    assert got[(4, 0)].chunk == "x y"
    # invalid config
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_overlap(df, size=8, overlap=8)


def test_chunk_overlap_plan_is_python_free(spark):
    from nowdb_spark.operators.textops import chunk_overlap

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_overlap(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
