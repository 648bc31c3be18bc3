"""Arbitrary stateful streaming via the transformWithState v2 API
(Spark 4): typed per-key state handles (ValueState here), explicit
processor lifecycle, timers — the successor to
``applyInPandasWithState`` (which ``windows.running_user_stats``
keeps for parity).

N/A in the reference (SURVEY.md §2.10 — dislib has no streaming
layer); part of this engine's streaming north star. State lives in
the state store per key — O(keys) memory across the cluster, rows
stream through in Arrow batches.

Environment gate: the transformWithState state-server protocol needs
``google.protobuf``, absent from this container (the driver worker
crashes with an ImportError otherwise) — ``running_user_stats_v2``
raises a clear error up front when protobuf is missing, and
``windows.running_user_stats`` (applyInPandasWithState, no protobuf
dependency) remains the always-available stateful operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


class _RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, sum, max) with a single ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "stats", "cnt long, total double, vmax double"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._state.exists():
            cnt, total, mx = self._state.get()
        else:
            cnt, total, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._state.update((cnt, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [cnt],
                "total": [total],
                "vmax": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats_v2(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Per-user running (count, sum, max) on the transformWithState
    API — same semantics as ``windows.running_user_stats`` (the
    applyInPandasWithState form); tests assert the two agree.
    Streaming only."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithState requires google.protobuf (state-server "
            "protocol); not available in this environment — use "
            "dislib_spark.streaming.windows.running_user_stats "
            "(applyInPandasWithState) instead"
        ) from exc

    from dislib_spark.streaming.windows import _watermarked

    return (
        _watermarked(events, ts_col, "2 hours")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningStatsProcessor(),
            outputStructType="user_id long, n long, total double, vmax double",
            outputMode="Update",
            timeMode="None",
        )
    )
