"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no event-time state at all (SURVEY.md §2.6) — its
daemon inputs process arrival order and its only cross-record state is
the unbounded Dedup set. These operators show the engine's pattern for
arbitrary keyed state with timeout-based eviction, the building block
for anything the built-in streaming aggregations can't express.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _sql_type(df: DataFrame, col: str) -> str:
    """The column's actual SQL type string — output schemas must echo
    the INPUT's key/ts types. Hard-coding ``string`` broke every
    non-string key at Arrow conversion time (the update fn emits the
    raw key value) and silently retyped columns for downstream
    consumers."""
    return df.schema[col].dataType.simpleString()


def running_counter(
    df: DataFrame,
    key_col: str,
    value_col: str | None = None,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running count (+ optional running sum) maintained across
    micro-batches — the stateful generalization of CountAndTag
    (/root/reference/filter/count_and_tag.go publishes per-tag counters;
    this keeps them exact across a stream's lifetime).

    State per key: (count, total). Emits one row per key per batch with
    the updated running values.
    """

    out_schema = (
        f"{key_col} {_sql_type(df, key_col)}, "
        "batch_rows long, running_count long, running_sum double"
    )
    state_schema = "count long, total double"

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count, total = state.get if state.exists else (0, 0.0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            count += len(pdf)
            if value_col is not None:
                total += float(pdf[value_col].astype(float).sum())
        state.update((count, total))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "batch_rows": [batch_rows],
                "running_count": [count],
                "running_sum": [total],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout, GroupStateTimeout.NoTimeout),
    )


def session_aggregator(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    use_timeout: bool = False,
) -> DataFrame:
    """Custom session windows: a session closes (and emits) once a later
    event for its key arrives more than the gap after the previous one.
    This is the streaming twin of the batch ``q_session_windows`` query.

    State per key: (session_start, last_seen, n_events) as epoch seconds.
    Emits closed sessions only (append semantics). With
    ``use_timeout=True`` idle sessions also close on a processing-time
    timeout — use only with a real periodic trigger: a timeout keeps
    scheduling batches, so ``processAllAvailable``-style test harnesses
    would never see the stream go idle.
    """

    out_schema = (
        f"{key_col} {_sql_type(df, key_col)}, "
        "session_start long, session_end long, n_events long"
    )
    state_schema = "start long, last long, n long"

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows: list[dict[str, Any]] = []
        if state.hasTimedOut:
            start, last, n = state.get
            rows.append(
                {key_col: key[0], "session_start": start, "session_end": last, "n_events": n}
            )
            state.remove()
        else:
            ts = []
            for pdf in pdfs:
                ts.extend(int(x) for x in pdf[ts_col])
            ts.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts[0], ts[0], 0
            for t in ts:
                if t - last > gap_seconds:
                    rows.append(
                        {
                            key_col: key[0],
                            "session_start": start,
                            "session_end": last,
                            "n_events": n,
                        }
                    )
                    start, last, n = t, t, 0
                else:
                    # a cross-batch late event may precede the stored
                    # window: extend start backward, never rewind last —
                    # a plain `last = t` emitted sessions with
                    # session_end < session_start
                    start = min(start, t)
                    last = max(last, t)
                n += 1
            state.update((start, last, n))
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)
        if rows:  # never yield empty object-dtype frames
            yield pd.DataFrame(
                rows,
                columns=[key_col, "session_start", "session_end", "n_events"],
            )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def ttl_dedup(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    ttl_seconds: int = 3600,
) -> DataFrame:
    """Streaming Dedup with an explicit event-time TTL on state.

    The reference's Dedup keeps every key forever and OOMs by design
    (/root/reference/filter/dedup.go:14-21); the watermark variant
    (streaming.daemon.StreamingDedup) bounds state but ties eviction to
    the watermark delay. This operator gives the third policy real
    pipelines want: a key suppresses duplicates only for ``ttl_seconds``
    of EVENT time — a re-occurrence later than the TTL is treated as
    fresh (the "re-crawl after 30 days is new content" semantic).

    State per key: last emitted event-time (epoch seconds). A batch's
    rows for one key are processed in event-time order; a row passes iff
    no emission for the key happened within the trailing TTL window.
    Emits passing rows (append semantics).
    """

    out_schema = f"{key_col} {_sql_type(df, key_col)}, {ts_col} {_sql_type(df, ts_col)}"
    state_schema = "last_emit long"

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(x) for x in pdf[ts_col])
        ts.sort()
        (last_emit,) = state.get if state.exists else (None,)
        out: list[int] = []
        for t in ts:
            if last_emit is None or t - last_emit >= ttl_seconds:
                out.append(t)
                last_emit = t
        if last_emit is not None:
            state.update((last_emit,))
        if out:
            yield pd.DataFrame({key_col: [key[0]] * len(out), ts_col: out})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
