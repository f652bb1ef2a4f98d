"""SRT/WebVTT subtitle parsing — video-transcript ingestion as pure
column expressions.

Subtitle files are how video corpora yield TEXT: cue blocks separated
by blank lines, each ``index\\ntimecode --> timecode\\nlines…``, with
``HH:MM:SS,mmm`` timestamps.  The whole parse is split/transform/
regexp expressions (scan-local, no UDF, codegen): cues explode to one
row each with exact-integer millisecond times, and the transcript is
the cue texts rejoined — the shape a 100 TB caption dump needs (the
parse IS the scan).

Malformed cue handling: blocks whose second line does not match the
timecode grammar yield NULL times and empty text rather than failing
the task (quarantine-by-row; a caption dump always has garbage).

WebVTT streams parse through the same expressions: the timecode
grammar accepts the '.' millisecond separator AND hour-optional
``MM:SS.mmm`` timecodes, trailing cue settings (``position:50%``,
``align:start``) after the end timecode are consumed as metadata,
cues may lead with the timecode directly (no index line), and the
WEBVTT header block quarantines like any timecode-less block.

Public knowledge: the SubRip (.srt) de-facto format; W3C WebVTT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Timecode: hours are OPTIONAL (WebVTT allows MM:SS.mmm; ADVICE r6 —
# the HH-mandatory grammar quarantined very common real-world VTT).
_TC = r"(?:(\d{1,2}):)?(\d{2}):(\d{2})[,.](\d{3})"
# Arrow may be padded by any run of spaces/tabs, and WebVTT cue
# settings (``position:50%``, ``align:start``, …) may trail the end
# timecode — they are layout metadata, not text, so the grammar eats
# them without capturing.
_LINE = rf"^\s*{_TC}[ \t]+-->[ \t]+{_TC}(?:[ \t]+\S.*)?[ \t]*$"


def _tc_ms(line: Column, base: int) -> Column:
    """Milliseconds of the timecode at capture-group offset ``base``
    (1 = start, 5 = end) of the ``-->`` line; NULL when unmatched.
    The hours group is optional — when absent, regexp_extract yields
    '' and the hour term is 0 (the empty-string guard keeps the cast
    ANSI-safe)."""
    def _g(i: int) -> Column:
        s = F.regexp_extract(line, _LINE, base + i)
        return F.when(s == "", F.lit(0)).otherwise(s.cast("long"))

    ms = (
        _g(0) * 3_600_000 + _g(1) * 60_000 + _g(2) * 1000 + _g(3)
    )
    return F.when(line.rlike(_LINE), ms).otherwise(F.lit(None).cast("long"))


def srt_cues(df: DataFrame, id_col: str, srt_col: str) -> DataFrame:
    """One row per cue: ``(doc_id, cue_index, start_ms, end_ms,
    cue_text)`` — cue_text joins the block's text lines with a space."""
    blocks = F.filter(
        F.split(F.col(srt_col), r"\r?\n\r?\n+"),
        lambda b: F.trim(b) != "",
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(blocks).alias("cue_pos", "block"),
    )
    lines = F.filter(
        F.split(F.col("block"), r"\r?\n"), lambda ln: F.trim(ln) != ""
    )
    # WebVTT cues may start with the timecode directly (no index line,
    # and the WEBVTT header block has no timecode at all): the timecode
    # is whichever of the first two lines matches the grammar, and the
    # text starts right after it
    # F.get is NULL-safe out of bounds (a one-line WEBVTT header block
    # would make ANSI-mode element_at fail the whole task)
    l1 = F.get(lines, 0)
    tc_first = l1.rlike(_LINE)
    tc_line = F.when(tc_first, l1).otherwise(F.get(lines, 1))
    text_from = F.when(tc_first, F.lit(2)).otherwise(F.lit(3))
    idx_line = l1
    return exploded.select(
        "doc_id",
        # digit-guarded cast: ANSI mode would fail the task on a garbage
        # block's non-numeric first line — quarantine wants NULL instead
        # (timecode-first VTT cues have no index either)
        F.when(
            ~tc_first & idx_line.rlike(r"^\s*\d+\s*$"),
            F.trim(idx_line).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("cue_index"),
        _tc_ms(tc_line, 1).alias("start_ms"),
        _tc_ms(tc_line, 5).alias("end_ms"),
        F.when(
            tc_line.rlike(_LINE),
            F.array_join(F.slice(lines, text_from, 10_000), " "),
        )
        .otherwise(F.lit(""))
        .alias("cue_text"),
    )


def srt_transcript(cues: DataFrame) -> DataFrame:
    """Per doc: cue count, covered milliseconds, and the transcript
    (cue texts in cue order, space-joined)."""
    return (
        cues.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cues"),
            F.sum(F.col("end_ms") - F.col("start_ms"))
            .cast("long")
            .alias("covered_ms"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("start_ms", "cue_index", "cue_text")
                        )
                    ),
                    lambda s: s["cue_text"],
                ),
                " ",
            ).alias("transcript"),
        )
    )
