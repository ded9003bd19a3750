"""Custom stateful streaming operator: sessionization via
``applyInPandasWithState``.

The batch twin is ``operators.sessionize`` (lag + running sum over one
window). In a stream the same semantics need per-key state: the open
session (start, last-event time, count, value sum) lives in the state
store, sessions closed by an in-batch gap emit immediately, and the
trailing open session emits when the event-time watermark passes
``last + gap`` (EventTimeTimeout) — so results are identical to the
batch operator once the watermark has flushed everything.

Scale notes (100 TB / 1000 executors): state is one fixed-size tuple
per active entity (no per-event buffering), keys shuffle once to their
state-store partition, and the watermark bounds both state size and
result lateness. This is the shape the reference's REALTIME
update-frequency metadata implies but never implements (SURVEY §2.11).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# the documented default (long-entity) output shape; sessionize_stream
# derives entity_id's actual type from the input column at call time
SESSION_SCHEMA = (
    "entity_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_sum double"
)
_STATE_SCHEMA = "start long, last long, n long, s double"


def sessionize_stream(
    events: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: one output row per CLOSED session.

    A session closes when the gap to the next event exceeds
    ``gap_seconds`` (emitted in the micro-batch that observes the gap)
    or when the watermark passes ``last_event + gap`` (state timeout).

    The output ``entity_id`` column carries the INPUT entity column's
    type (review r10: the schema used to hardcode ``long`` and coerce
    ``int(key)``, so a string entity column crashed in the executor on
    the first emitted session instead of working or failing fast).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ent_type = events.schema[entity_col].dataType.simpleString()
    out_schema = (
        f"entity_id {ent_type}, session_start timestamp, "
        "session_end timestamp, n_events long, value_sum double"
    )

    # state clock in MICROSECONDS: exact integer arithmetic against the
    # parquet/SQL µs timeline (ms would truncate sub-ms gaps and drift
    # from an exact-SQL oracle); only the Spark timeout API needs ms
    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def emit(rows: list[tuple[int, int, int, float]]) -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "entity_id": [key[0]] * len(rows),
                    "session_start": pd.to_datetime([r[0] for r in rows], unit="us"),
                    "session_end": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "n_events": [r[2] for r in rows],
                    "value_sum": [r[3] for r in rows],
                }
            )

        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield emit([(start, last, n, s)])
            return

        batch = pd.concat(list(pdfs)).sort_values(time_col, kind="mergesort")
        ts_us = batch[time_col].astype("int64") // 1_000
        vals = batch[value_col].astype(float)

        start = last = n = s = None
        if state.exists:
            start, last, n, s = state.get
        closed: list[tuple[int, int, int, float]] = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if start is None:
                start, last, n, s = t, t, 1, float(v)
            elif t - last > gap_us:
                closed.append((start, last, n, s))
                start, last, n, s = t, t, 1, float(v)
            else:
                # CLAMP, never assign: a late-but-within-watermark
                # event from a later micro-batch has t < last (the
                # in-batch sort can't order across batches) —
                # assigning last = t would rewind the session end,
                # emit a wrong session_end, fire the timeout early,
                # and let the next on-time event falsely split the
                # session. min/max keeps the span identical to the
                # batch twin's global sort. (An event more than
                # ``gap`` before ``start`` still merges rather than
                # reopening a separate earlier session — single-tuple
                # state cannot re-split; keep the watermark tighter
                # than the gap if that distinction matters.)
                start, last, n, s = (
                    min(start, t),
                    max(last, t),
                    n + 1,
                    s + float(v),
                )
        state.update((int(start), int(last), int(n), float(s)))
        state.setTimeoutTimestamp(int(last) // 1000 + int(gap_seconds) * 1000)
        if closed:
            yield emit(closed)

    return (
        events.withWatermark(time_col, watermark)
        .groupBy(entity_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
