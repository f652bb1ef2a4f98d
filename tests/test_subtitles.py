"""SRT parsing (operators/subtitles.py): pure-column cue extraction,
timecode math, malformed-cue quarantine.  srt_transcripts is
oracle-gated in test_oracle."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.subtitles import (
    srt_cues,
    srt_transcript,
)

SRT = """1
00:00:01,250 --> 00:00:03,500
Hello there
second line

2
00:01:02,000 --> 01:00:00,001
Single line

garbage block
no timecode here

3
00:00:10,000 --> 00:00:11,000
Tail cue
"""


def test_cues_and_timecodes(spark):
    df = spark.createDataFrame([(1, SRT)], "doc_id long, srt string")
    rows = {
        r["cue_index"]: r
        for r in srt_cues(df, "doc_id", "srt").collect()
    }
    assert rows[1]["start_ms"] == 1250 and rows[1]["end_ms"] == 3500
    assert rows[1]["cue_text"] == "Hello there second line"
    assert rows[2]["start_ms"] == 62_000
    assert rows[2]["end_ms"] == 3_600_000 + 1  # hour rollover + 1 ms
    assert rows[3]["cue_text"] == "Tail cue"
    # the garbage block quarantines: NULL times, empty text
    bad = [r for r in rows.values() if r["start_ms"] is None]
    assert len(bad) == 1 and bad[0]["cue_text"] == ""


def test_transcript_orders_by_start(spark):
    df = spark.createDataFrame([(1, SRT)], "doc_id long, srt string")
    out = srt_transcript(srt_cues(df, "doc_id", "srt")).collect()[0]
    assert out["n_cues"] == 4
    # cue 3 (10s) sorts before cue 2 (62s) in the transcript
    assert out["transcript"].index("Tail cue") < out["transcript"].index(
        "Single line"
    )


def test_plan_is_scan_local(spark):
    df = spark.createDataFrame([(1, SRT)], "doc_id long, srt string")
    plan = (
        srt_cues(df, "doc_id", "srt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan  # explode is scan-local


def test_webvtt_timecode_first_cues(spark):
    """WebVTT: header block quarantines (no timecode), cues may start
    with the timecode directly, '.' millisecond separator accepted."""
    vtt = """WEBVTT

00:00:01.250 --> 00:00:03.500
Hello vtt

named-cue-id
00:00:05.000 --> 00:00:06.000
Second cue
"""
    df = spark.createDataFrame([(1, vtt)], "doc_id long, srt string")
    rows = sorted(
        srt_cues(df, "doc_id", "srt").collect(),
        key=lambda r: (r["start_ms"] is None, r["start_ms"]),
    )
    assert rows[0]["start_ms"] == 1250 and rows[0]["cue_text"] == "Hello vtt"
    assert rows[0]["cue_index"] is None  # timecode-first cue has no index
    assert rows[1]["start_ms"] == 5000 and rows[1]["cue_text"] == "Second cue"
    assert rows[2]["start_ms"] is None  # the WEBVTT header block


def test_webvtt_hour_optional_and_cue_settings(spark):
    """ADVICE r6: hour-optional MM:SS.mmm timecodes and trailing cue
    settings (position/align) are very common in real VTT and must
    parse, not quarantine."""
    vtt = """WEBVTT

00:01.250 --> 00:03.500 position:50% align:start
Short timecode with settings

01:02.000 --> 01:05.750
Minute-second cue

00:00:07.000  -->\t00:00:08.000
Tab-and-double-space arrow
"""
    df = spark.createDataFrame([(1, vtt)], "doc_id long, srt string")
    rows = sorted(
        srt_cues(df, "doc_id", "srt").collect(),
        key=lambda r: (r["start_ms"] is None, r["start_ms"]),
    )
    assert rows[0]["start_ms"] == 1250 and rows[0]["end_ms"] == 3500
    assert rows[0]["cue_text"] == "Short timecode with settings"
    assert rows[1]["start_ms"] == 7000  # flexible whitespace around -->
    assert rows[2]["start_ms"] == 62_000 and rows[2]["end_ms"] == 65_750
    assert all(r["start_ms"] is not None for r in rows[:3])


def test_webvtt_note_and_style_blocks_quarantine(spark):
    """NOTE/STYLE metadata blocks carry no timecode: they must land as
    quarantine rows (NULL times, empty text), never crash the parse or
    leak into cue text."""
    vtt = """WEBVTT

NOTE this file was machine translated

STYLE
::cue { color: lime }

00:00:01.000 --> 00:00:02.000
Real cue
"""
    df = spark.createDataFrame([(1, vtt)], "doc_id long, srt string")
    rows = srt_cues(df, "doc_id", "srt").collect()
    good = [r for r in rows if r["start_ms"] is not None]
    assert len(good) == 1 and good[0]["cue_text"] == "Real cue"
    quarantined = [r for r in rows if r["start_ms"] is None]
    assert len(quarantined) == 3  # header, NOTE, STYLE
    assert all(r["cue_text"] == "" for r in quarantined)
