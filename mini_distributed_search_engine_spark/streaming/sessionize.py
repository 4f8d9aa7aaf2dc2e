"""Custom stateful streaming operator: conversation sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with window functions
(`operators/analytics.py:sessionize_events`); a stream cannot — the gap
rule needs memory of the last seen timestamp per key across micro-batches.
This is the canonical "custom stateful operator" shape: group the stream
by key, keep a tiny fixed-size state row per key (open-session aggregate),
fold each micro-batch's Arrow batches into it, and emit updated session
rows. State is O(keys), never O(events); Spark checkpoints it with the
query, so the operator resumes exactly like the rest of the pipeline.

Emission contract (output mode "update"): every session TOUCHED by a
micro-batch is emitted with its aggregates as of that batch; a later batch
that extends a still-open session re-emits it. Downstream consumers keep
the latest row per ``(conv_id, t_start)`` — the session's DURABLE key.
``session_seq`` numbers sessions only within one state lifetime: after
the idle-eviction timeout drops a conversation's state, a resumed
conversation restarts numbering at 1 (the eviction that bounds state to
open sessions necessarily forgets the counter), so ``(conv_id,
session_seq)`` pairs can recur across evictions while ``t_start`` — a
strictly increasing event time under the ordering discipline below —
cannot. The parity test keys on (conv_id, session_seq) deliberately: it
runs without evictions, where the two keys coincide and the batch
window-function result must match.

Ordering discipline: turns must arrive in non-decreasing event time per
conversation across batches (the same append-only discipline the
streaming indexer states). Within a batch any order is fine (sorted
here); cross-batch reordering would need a watermark + buffer stage in
front, which transcript ingestion pipelines (file drops of closed
conversations) don't exhibit.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 1800

OUT_SCHEMA = ("conv_id string, session_seq int, n_turns long, "
              "t_start double, t_end double")
STATE_SCHEMA = "session_seq int, n_turns long, t_start double, t_end double"


def _fold(key, pdfs: Iterable, state, gap_seconds: float):
    """The per-key fold — module-level so the timeout-eviction path is
    unit-testable with a fake GroupState (tests/test_streaming_sessionize)."""
    import pandas as pd
    (conv_id,) = key
    if state.hasTimedOut:
        # conversation idle well past the gap: emit the final closed
        # session one last time (an idempotent update for a sink keyed
        # on (conv_id, t_start)) and DROP the state, so long-running
        # state scales with OPEN sessions, not total key cardinality.
        # session_seq dies with the state — see module docstring for why
        # t_start, not seq, is the durable session identity.
        seq, n, t0, t1 = state.get
        state.remove()
        yield pd.DataFrame([(conv_id, seq, n, t0, t1)],
                           columns=["conv_id", "session_seq", "n_turns",
                                    "t_start", "t_end"])
        return
    seq, n, t0, t1 = state.get if state.exists else (0, 0, 0.0, 0.0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["tsec", "turn_idx"])
    out = []
    for ts in rows["tsec"].to_numpy():
        ts = float(ts)
        if seq == 0:
            seq, n, t0, t1 = 1, 1, ts, ts
        elif ts - t1 > gap_seconds:
            out.append((conv_id, seq, n, t0, t1))   # close previous
            seq, n, t0, t1 = seq + 1, 1, ts, ts
        else:
            n += 1
            t1 = ts
    out.append((conv_id, seq, n, t0, t1))           # open-session snapshot
    state.update((int(seq), int(n), float(t0), float(t1)))
    # evict state for conversations idle 2x the session gap (processing
    # time: by then the gap rule guarantees the session is closed)
    state.setTimeoutDuration(int(gap_seconds * 2 * 1000))
    yield pd.DataFrame(out, columns=["conv_id", "session_seq",
                                     "n_turns", "t_start", "t_end"])


def sessionize_stream(turns: DataFrame,
                      gap_seconds: float = GAP_SECONDS) -> DataFrame:
    """Streaming (conv_id, session_seq, n_turns, t_start, t_end) rows from
    a transcript turn stream; a new session starts when the gap to the
    previous turn exceeds ``gap_seconds`` (same rule as the batch
    sessionizer)."""

    def fold(key, pdfs: Iterable, state: GroupState):
        yield from _fold(key, pdfs, state, gap_seconds)

    # drop null event times JVM-side: a null would reach pandas as NaN,
    # where every gap comparison is False — the row would silently glue
    # onto the open session and poison its end timestamp. Rows without an
    # event time have no place on the time axis.
    keyed = turns.select(
        "conv_id", "turn_idx",
        F.col("ts").cast("timestamp").cast("double").alias("tsec")) \
        .where(F.col("tsec").isNotNull())
    return keyed.groupBy("conv_id").applyInPandasWithState(
        fold, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.ProcessingTimeTimeout)
