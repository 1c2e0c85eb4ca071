"""Custom stateful streaming operator via ``applyInPandasWithState``:
the balance-crossing fraud rule (alert the first time a user's cumulative
value crosses a threshold).

This is the operator class Spark's built-in windowed aggregations cannot
express: the alert depends on an *ordered running reduction* per key, not
a windowed fold -- the reference's "monitoring" ambition made concrete.

State design (scale contract):
* One row of state per user (the running total): O(keys), not O(events).
* State lives in the state store (checkpointed, partitioned by key);
  each micro-batch touches only the keys present in that batch.
* Rows within a batch are sorted by (event time, event_id) in the worker
  -- the event_id tiebreak keeps the fold deterministic under tied
  timestamps; cross-batch order is the source's responsibility (in-order
  per key, e.g. Kafka partition-by-user).  ``batch_twins.q_stream_state``
  is the batch-mode ground truth the streaming form is tested against.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, ts timestamp, total double"
STATE_SCHEMA = "total double"
DEFAULT_THRESHOLD = 1000.0


def _crossings(threshold: float):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0.0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, v in zip(pdf["ts"], pdf["value"]):
                prev = total
                total = total + float(v)
                if prev < threshold <= total:
                    rows.append((key[0], ts, total))
        state.update((total,))
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "ts", "total"])

    return fn


def balance_alerts_stateful(events: DataFrame,
                            threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Streaming: emit (user_id, ts, total) at the first event where the
    user's cumulative value reaches ``threshold``."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _crossings(threshold), OUT_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout,
        )
    )


def balance_alerts_tws(events: DataFrame,
                       threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """The same crossing rule on ``transformWithStateInPandas`` (Spark
    4's successor stateful API: typed state variables on a processor
    object, composable state per key, timers).  Semantics identical to
    ``balance_alerts_stateful`` -- tested against the same batch twin.

    Environment note: this API needs the ``protobuf`` package in the
    Python workers (its state protocol is proto-serialized).  Where
    protobuf is absent the test skips, like the Kafka/JDBC connectors;
    ``balance_alerts_stateful`` is the dependency-free form.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _CrossingProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", STATE_SCHEMA)

        def handleInputRows(self, key: tuple, rows: Iterator[pd.DataFrame],
                            timerValues) -> Iterator[pd.DataFrame]:
            total = self._total.get()[0] if self._total.exists() else 0.0
            out = []
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for ts, v in zip(pdf["ts"], pdf["value"]):
                    prev = total
                    total = total + float(v)
                    if prev < threshold <= total:
                        out.append((key[0], ts, total))
            self._total.update((total,))
            if out:
                yield pd.DataFrame(out, columns=["user_id", "ts", "total"])

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_CrossingProcessor(),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
