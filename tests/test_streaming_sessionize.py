"""Stateful streaming sessionization: cross-batch state carries open
sessions, emissions fold to exactly the batch window-function result."""

from __future__ import annotations

import shutil
from datetime import datetime, timezone

import pytest

from mini_distributed_search_engine_spark.streaming.sessionize import (
    sessionize_stream)

GAP = 1800


def _ts(epoch: float) -> datetime:
    return datetime.fromtimestamp(epoch, timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_sess")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_streaming_sessionize_parity(spark, roots):
    # conv a: session 1 spans BOTH batches (state must carry it), then a
    # >GAP gap inside batch 2 opens session 2. conv b: one session, also
    # split across batches. conv c: appears only in batch 2.
    batch1 = [("a", 0, 0.0), ("a", 1, 60.0),
              ("b", 0, 10.0), ("b", 1, 20.0)]
    batch2 = [("a", 2, 120.0), ("a", 3, 120.0 + GAP + 1), ("a", 4, 3000.0),
              ("b", 2, 30.0),
              ("c", 0, 7.0)]
    src = roots / "in"
    src.mkdir()
    for i, rows in enumerate((batch1, batch2)):
        pdf = [(c, t, _ts(e)) for c, t, e in rows]
        (spark.createDataFrame(pdf, "conv_id string, turn_idx int, ts timestamp")
         .coalesce(1).write.parquet(str(src / f"p{i}.parquet")))

    stream = (spark.readStream
              .schema("conv_id string, turn_idx int, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    emitted: list[tuple] = []
    q = (sessionize_stream(stream, gap_seconds=GAP)
         .writeStream
         .foreachBatch(lambda df, bid: emitted.extend(
             (bid, *r) for r in df.collect()))
         .option("checkpointLocation", str(roots / "cp"))
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    # fold like a downstream consumer: latest emission per (conv, session)
    final = {}
    for bid, conv, seq, n, t0, t1 in sorted(emitted):
        final[(conv, seq)] = (n, t0, t1)
    assert final == {
        ("a", 1): (3, 0.0, 120.0),                   # extended across batches
        ("a", 2): (2, 120.0 + GAP + 1, 3000.0),      # split by the gap
        ("b", 1): (3, 10.0, 30.0),
        ("c", 1): (1, 7.0, 7.0),
    }
    # batch 1 must have emitted the then-open snapshots (update semantics)
    b1 = {(c, s): (n, t0, t1) for bid, c, s, n, t0, t1 in emitted if bid == 0}
    assert b1 == {("a", 1): (2, 0.0, 60.0), ("b", 1): (2, 10.0, 20.0)}


class _FakeState:
    """Minimal GroupState stand-in driving _fold's two entry modes."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("state empty")
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_fold_timeout_emits_final_session_and_drops_state():
    import pandas as pd
    from mini_distributed_search_engine_spark.streaming.sessionize import (
        _fold)
    st = _FakeState(value=(2, 5, 100.0, 900.0), timed_out=True)
    out = pd.concat(_fold(("conv9",), iter([]), st, GAP), ignore_index=True)
    # the closed session is re-emitted once (idempotent for an
    # update-keyed sink), then the key's state is gone
    assert out.values.tolist() == [["conv9", 2, 5, 100.0, 900.0]]
    assert st.removed and not st.exists


def test_fold_normal_batch_arms_eviction_timer():
    import pandas as pd
    from mini_distributed_search_engine_spark.streaming.sessionize import (
        _fold)
    st = _FakeState()
    pdf = pd.DataFrame({"conv_id": ["x"] * 2, "turn_idx": [0, 1],
                        "tsec": [0.0, 10.0]})
    list(_fold(("x",), iter([pdf]), st, GAP))
    assert st.get == (1, 2, 0.0, 10.0)
    # idle eviction armed at 2x the gap -> state is O(open sessions)
    assert st.timeout_ms == int(GAP * 2 * 1000)
