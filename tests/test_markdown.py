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
