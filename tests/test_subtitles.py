"""Subtitle parser (SRT/WebVTT): JVM regex pipeline edge cases."""

from __future__ import annotations

from nowdb_spark.operators.subtitles import parse_subtitles


def test_srt_and_vtt_edge_cases(spark):
    srt = ("1\r\n00:00:01,000 --> 00:00:04,500\r\nHello\r\nworld\r\n"
           "\r\n2\r\n01:02:03,007 --> 01:02:04,000\r\nsecond\r\n")
    vtt = ("WEBVTT\n\nNOTE a comment block\nspanning lines\n\n"
           "intro-cue\n00:05.250 --> 00:07.000 align:start\n"
           "short-hours cue\n\n"
           "00:00:09.1 --> 00:00:10.25\npadded millis\n")
    df = spark.createDataFrame([(1, srt), (2, vtt)],
                               ["doc_id", "subs"])
    got = {(r["doc_id"], r["cue_idx"]):
           (r["start_ms"], r["end_ms"], r["text"])
           for r in parse_subtitles(df).collect()}
    assert got == {
        # CRLF + multi-line cue text joined by a space
        (1, 0): (1000, 4500, "Hello world"),
        (1, 1): (3723007, 3724000, "second"),
        # VTT: NOTE block skipped (no -->); the identifier line
        # precedes the timestamps so the unanchored cue regex starts
        # matching AT the timestamp line and the id is dropped
        (2, 0): (5250, 7000, "short-hours cue"),
        # 1-digit / 2-digit millis right-pad to 100/250
        (2, 1): (9100, 10250, "padded millis"),
    }


def test_subtitles_no_cues_yields_empty(spark):
    df = spark.createDataFrame(
        [(1, "WEBVTT\n\nNOTE nothing else\n"), (2, "just prose")],
        ["doc_id", "subs"])
    assert parse_subtitles(df).count() == 0
