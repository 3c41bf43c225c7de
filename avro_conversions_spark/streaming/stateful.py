"""Custom stateful streaming operator: online per-conversation sequence
validation via applyInPandasWithState.

The batch engine's SequenceConstraint needs the whole conversation in one
window; a live stream can't wait for conversations to finish. This
operator keeps per-conversation state (highest turn_idx seen, last ts) and
emits violations INCREMENTALLY as turns arrive:

- NONCONTIGUOUS_TURN_IDX: a turn arrives whose idx != state.next_expected
  (out-of-order or gapped delivery);
- TS_REGRESSION: ts earlier than the last seen ts;
- DUPLICATE_TURN: an idx at or below the highest seen.

State is (max_idx, last_ts_epoch_us, n_turns) per conv_id — O(1) per
conversation, bounded by a processing-time timeout that expires idle
conversations (state store stays proportional to ACTIVE conversations,
not historical ones — the property that lets this run forever at
10^12-turn scale).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("reason", T.StringType()),
        T.StructField("observed", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_idx", T.IntegerType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_turns", T.LongType()),
    ]
)


def _validate_conversation(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int | None = 3600 * 1000,
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]
    if state.hasTimedOut:
        state.remove()
        return
    max_idx, last_ts_us, n_turns = state.get if state.exists else (-1, -1, 0)
    out: list[tuple[str, int, str, str]] = []
    # A group's rows arrive as MULTIPLE Arrow chunks whenever the
    # conversation straddles a batch boundary (maxRecordsPerBatch).
    # Sorting per-chunk made the emitted violations depend on physical
    # batching — concat the group's chunks and sort ONCE so results are
    # batch-size-invariant (round-4 bug: a session with a small media
    # batch cap produced 1976 rows where the default produced 251).
    # Memory is bounded by max conversation length, same as the batch
    # engine's window.
    chunks = [pdf for pdf in pdfs]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["turn_idx"])
        for idx, ts in zip(pdf["turn_idx"], pdf["ts"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            idx = int(idx)
            if idx <= max_idx:
                out.append((conv_id, idx, "DUPLICATE_TURN", f"max_seen={max_idx}"))
            elif idx != max_idx + 1:
                out.append(
                    (conv_id, idx, "NONCONTIGUOUS_TURN_IDX", f"{idx}!={max_idx + 1}")
                )
            if last_ts_us >= 0 and ts_us < last_ts_us:
                out.append((conv_id, idx, "TS_REGRESSION", str(ts)))
            max_idx = max(max_idx, idx)
            last_ts_us = max(last_ts_us, ts_us)
            n_turns += 1
    state.update((max_idx, last_ts_us, n_turns))
    if idle_timeout_ms is not None:
        # idle conversations expire after the timeout → bounded state
        state.setTimeoutDuration(idle_timeout_ms)
    if out:
        yield pd.DataFrame(out, columns=["conv_id", "turn_idx", "reason", "observed"])


def stateful_sequence_violations(
    stream: DataFrame, idle_timeout_ms: int | None = 3600 * 1000
) -> DataFrame:
    """Apply the per-conversation stateful validator to a streaming
    DataFrame with (conv_id, turn_idx, ts).

    ``idle_timeout_ms=None`` disables state expiry — REQUIRED for bounded
    availableNow replays: with a processing-time timeout registered, Spark
    keeps scheduling micro-batches until every state entry expires, so the
    'finite' run never terminates. Live (continuous) streams keep the
    timeout so the state store tracks only active conversations."""

    def fn(key, pdfs, state):
        return _validate_conversation(key, pdfs, state, idle_timeout_ms)

    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
