"""Custom stateful streaming operator (ST5): cross-batch candle
continuity via ``applyInPandasWithState``.

The reference carries ``lastCloseByPool`` in process memory
(core/ohlcv.js:5-7,122-154) so each new candle opens at the previous
candle's close — state that survives across micro-batches. In batch
recompute we use ``lag()`` (operators/ohlcv.with_carried_open); in a
true stream this operator keeps the per-pool last close in Spark's
state store, giving the same answer incrementally.

Scale: state is one float per pool (dimension-sized); the stream
shuffles on pool_id once, and the state store checkpoints with the
query — restart-safe like every other part of the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CARRIED_SCHEMA = T.StructType(
    [
        T.StructField("pool_id", T.LongType()),
        T.StructField("bucket_start", T.TimestampType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume_zig", T.DoubleType()),
        T.StructField("trade_count", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_close", T.DoubleType())])


def _carry_open(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per pool: order this batch's candles by bucket, seed the first
    open from stored state, carry closes forward, store the final
    close. Defined at module top level but shipped by value is not
    needed — session.ship_package covers workers for streaming runs."""
    (pool_id,) = key
    last_close = state.get[0] if state.exists else None
    for pdf in batches:
        pdf = pdf.sort_values("bucket_start").reset_index(drop=True)
        opens = []
        for _, row in pdf.iterrows():
            opens.append(last_close if last_close is not None else row["open"])
            last_close = row["close"]
        pdf["open"] = opens
        pdf["pool_id"] = pool_id
        yield pdf[[f.name for f in CARRIED_SCHEMA.fields]]
    if last_close is not None:
        state.update((float(last_close),))


def carried_open_stream(bars_stream: DataFrame) -> DataFrame:
    """Apply ST5 continuity to a streaming 1m-bars DataFrame (e.g. the
    output of a windowed aggregation). Candle opens may legally escape
    [low, high] — reference semantics preserved (core/ohlcv.js:142-144).
    """
    return bars_stream.groupBy("pool_id").applyInPandasWithState(
        _carry_open,
        outputStructType=CARRIED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming sequence detection: the incremental form of
# operators/seqmatch.sequence_count — the per-user greedy chain
# automaton (stage, count) lives in the state store and survives
# micro-batch boundaries and restarts. State is three scalars per user
# (dimension-sized); the stream shuffles on the user key once.
#
# Ordering contract: events are folded in (ts, event_id) order WITHIN
# each micro-batch; across batches the fold follows arrival order
# (micro-batch sequence), the same contract the reference's in-memory
# state carries (and ClickHouse's sequenceCount applied per block).
# For strict global ordering, run the batch operator over the settled
# table — this operator is the low-latency incremental view.
# ---------------------------------------------------------------------------

SEQ_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_matches", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SEQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _make_seq_counter(step_types: list[str], ts_col: str, type_col: str, tiebreak: str):
    k = len(step_types)

    def fn(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        stage, cnt, n_events = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            pdf = pdf.sort_values([ts_col, tiebreak])
            for typ in pdf[type_col]:
                n_events += 1
                if typ == step_types[stage]:
                    stage += 1
                    if stage == k:
                        cnt += 1
                        stage = 0
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_matches": [int(cnt)],
                "n_events": [int(n_events)],
            }
        )
        state.update((int(stage), int(cnt), int(n_events)))

    return fn


def sequence_count_stream(
    events_stream: DataFrame,
    step_types: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Streaming ``sequence_count``: one updated (key, n_matches,
    n_events) row per key per micro-batch that touched it."""
    if not step_types:
        raise ValueError("sequence_count_stream needs at least one step type")
    return events_stream.groupBy(key).applyInPandasWithState(
        _make_seq_counter(step_types, ts_col, type_col, tiebreak),
        outputStructType=SEQ_OUT_SCHEMA,
        stateStructType=SEQ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
