"""Subtitle parsing (SRT / WebVTT) — the video-text modality.

Multimodal training pipelines pair video with its caption track;
SubRip (.srt) and WebVTT (.vtt) are line-oriented text formats, so
the whole parse stays JVM-side (split + posexplode + regexp_extract
— zero Python, whole-stage codegen). One row per cue with integer
millisecond timestamps.

Format notes (public conventions):
  SRT    cue = [index]\\n HH:MM:SS,mmm --> HH:MM:SS,mmm\\n text…
         blocks separated by blank lines; index line optional in the
         wild.
  WebVTT file starts with 'WEBVTT'; timestamps use '.' for millis
         and may omit the hour field; cues may carry an identifier
         line and '-->' settings after the times (both tolerated).

Reference parity note: the reference engine has no media handling;
this module belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family), not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# HH:MM:SS,mmm --> HH:MM:SS,mmm  (',' SRT / '.' VTT; optional hours
# for VTT's MM:SS.mmm short form handled by a second pattern)
_TS = r"(?:(\d+):)?(\d+):(\d+)[,.](\d{1,3})"
_CUE_RE = rf"(?s){_TS}[ \t]*-->[ \t]*{_TS}[^\n]*\n?(.*)$"


def _ms(h: Column, m: Column, s: Column, ms: Column) -> Column:
    # try_cast: the optional-hours group extracts as '' (NULL ms for
    # non-cue blocks), and ANSI mode would abort on a plain cast
    hh = F.coalesce(h.try_cast("long"), F.lit(0))
    return (hh * 3600000 + m.try_cast("long") * 60000
            + s.try_cast("long") * 1000
            + F.rpad(ms, 3, "0").try_cast("long"))


def parse_subtitles(df: DataFrame, text_col: str = "subs",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, subtitle text) → one row per cue: (id, cue_idx, start_ms,
    end_ms, text). Cue text keeps its internal lines joined by a
    single space; cue ordering is file order (cue_idx is 0-based
    position among PARSED cues, so stray header/NOTE blocks don't
    shift it). Handles SRT and WebVTT in one pass."""
    blocks = (df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.regexp_replace(F.col(text_col), "\r\n?", "\n"),
                    r"\n[ \t]*\n+"))
        .alias("pos", "block")))
    g = [F.regexp_extract("block", _CUE_RE, i) for i in range(1, 10)]
    cues = (blocks
            .where(F.col("block").rlike(_TS + r"[ \t]*-->"))
            .select(
                id_col, "pos",
                _ms(*g[0:4]).alias("start_ms"),
                _ms(*g[4:8]).alias("end_ms"),
                F.trim(F.regexp_replace(g[8], r"\s*\n\s*", " "))
                .alias("text")))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy("pos")
    return (cues.withColumn(
                "cue_idx", (F.row_number().over(w) - 1).cast("long"))
            .select(id_col, "cue_idx", "start_ms", "end_ms", "text"))
