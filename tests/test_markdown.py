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
