"""Structured Streaming event path (SURVEY.md §2.10 T1–T6).

The reference's online loop (`guessLike_u_like.py:179-226`) is a blocking
Redis pub/sub listener that recomputes one user's recommendations per
message against state snapshotted at startup.  Here that becomes one
streaming job: ``readStream`` → payload parse (``from_json`` replaces the
reference's ``eval``) → stream-static joins against the batch-built model
tables → ``foreachBatch`` KV sink with the reference's fallback defaults.

The reference has no event-time semantics at all (arrival-order only) —
watermarked tumbling/sliding/session windows are the M6 extension surface
the driver's ``events`` table anticipates (SURVEY.md §2.10 last row).
"""
