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
``google.protobuf``. ``ensure_protobuf`` prefers an installed
runtime and falls back to the repo-vendored pure-python copy
(``vendor/google/protobuf``, see vendor/README.md) — added to the
driver's ``sys.path`` and shipped to executor python workers via
``sc.addPyFile`` (a zip of the vendor tree), so the state server
runs even in containers without the protobuf wheel.
``windows.running_user_stats`` (applyInPandasWithState, no protobuf
dependency) remains the zero-dependency stateful operator.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

_VENDOR = Path(__file__).resolve().parents[2] / "vendor"
_vendor_zip: str | None = None


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable on the driver AND on Spark
    python workers; True on success. Installed wheel wins; otherwise
    the vendored runtime is path-injected (driver) and shipped as a
    zip through ``addPyFile`` (workers — runtime-safe, unlike
    PYTHONPATH, which an already-running JVM would never see)."""
    global _vendor_zip
    try:
        import google.protobuf

        # A REAL install is assumed cluster-wide → nothing to ship.
        # But if the import only succeeded because a previous call
        # path-injected the VENDORED copy on this driver, executors
        # still need the zip — fall through to addPyFile (the early
        # return here used to strand non-local executors without
        # protobuf while reporting success).
        pb_file = getattr(google.protobuf, "__file__", "") or ""
        if not pb_file.startswith(str(_VENDOR)):
            return True
    except ImportError:
        if not (_VENDOR / "google" / "protobuf").is_dir():
            return False
        if str(_VENDOR) not in sys.path:
            sys.path.insert(0, str(_VENDOR))
        # also cover python workers spawned by future JVMs in this
        # process
        os.environ["PYTHONPATH"] = (
            str(_VENDOR) + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
    if spark is not None:
        if _vendor_zip is None:
            import shutil
            import tempfile

            base = os.path.join(
                tempfile.mkdtemp(prefix="dislib_vendor_"), "pb_vendor"
            )
            _vendor_zip = shutil.make_archive(base, "zip", str(_VENDOR))
        spark.sparkContext.addPyFile(_vendor_zip)
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


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
    if not ensure_protobuf(events.sparkSession):
        raise ImportError(
            "transformWithState requires google.protobuf (state-server "
            "protocol); neither an installed wheel nor the vendored "
            "runtime (vendor/google/protobuf) is available — use "
            "dislib_spark.streaming.windows.running_user_stats "
            "(applyInPandasWithState) instead"
        )

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


class _SessionProcessor(StatefulProcessor):
    """Per-user timeout sessionization with EVENT-TIME TIMERS,
    ARRIVAL-ORDER INDEPENDENT: state is the LIST of open candidate
    sessions (start_s, last_s, n); every input row is merged into
    that set (a late row — earlier event time, still inside the
    watermark — can extend a buffered session backward or BRIDGE two
    previously-separate sessions, exactly as the batch
    gaps-and-islands replay would), and sessions are emitted ONLY
    from expired event-time timers, once the watermark passes
    last_s+gap and no in-watermark row can still change them. Nothing
    is emitted eagerly on a gap seen inside a micro-batch — eager
    emission would bake the arrival order into the output (a later
    bridging row could have merged the halves). State per key is the
    open-session list, bounded by (watermark horizon / gap)."""

    def __init__(self, gap_s: int) -> None:
        self._gap = gap_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._h = handle
        self._sessions = handle.getListState(
            "sessions", "start_s long, last_s long, n long"
        )

    def _load(self) -> list[tuple[int, int, int]]:
        if not self._sessions.exists():
            return []
        return [
            (int(s[0]), int(s[1]), int(s[2]))
            for s in self._sessions.get()
        ]

    def _arm_timer(self, sessions) -> None:
        for tmr in self._h.listTimers():
            self._h.deleteTimer(tmr)
        if sessions:
            horizon = min(last for _, last, _ in sessions) + self._gap
            self._h.registerTimer(horizon * 1000)

    def _emit(self, key, start, last, n):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "start_s": [start],
                "end_s": [last],
                "n_events": [n],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        ts: list[int] = []
        for pdf in rows:
            ts.extend(int(x) for x in pdf["t"])
        if ts:
            sessions = self._load()
            sessions.extend((t, t, 1) for t in ts)
            sessions.sort()
            merged: list[tuple[int, int, int]] = []
            for s in sessions:
                if merged and s[0] - merged[-1][1] <= self._gap:
                    m = merged[-1]
                    merged[-1] = (m[0], max(m[1], s[1]), m[2] + s[2])
                else:
                    merged.append(s)
            self._sessions.put(merged)
            self._arm_timer(merged)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # close every session the watermark has passed (the expired
        # timer's own horizon is the floor; the watermark may have
        # jumped past several sessions at once)
        wm = timerValues.getCurrentWatermarkInMs()
        horizon = max(wm, expiredTimerInfo.getExpiryTimeInMs())
        sessions = self._load()
        keep = []
        for start, last, n in sessions:
            if (last + self._gap) * 1000 <= horizon:
                yield self._emit(key, start, last, n)
            else:
                keep.append((start, last, n))
        if keep:
            self._sessions.put(keep)
        else:
            self._sessions.clear()
        self._arm_timer(keep)

    def close(self) -> None:
        pass


def stream_sessions(
    events: DataFrame,
    gap: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Timeout-based sessionization returning ONE ROW PER CLOSED
    SESSION (key, start_s, end_s, n_events): streaming inputs run the
    transformWithState processor above (timeMode=EventTime — EVERY
    session closes via per-key timers once the watermark passes
    last+gap, never eagerly, so the output is independent of arrival
    order for any event inside the watermark); batch inputs replay
    the identical gaps-and-islands semantics through
    ``temporal.sessionize`` so batch ≡ streaming is testable (pinned
    in tests/test_io_streaming_multimodal.py, including a
    deliberately DISORDERED feed).
    Epoch-second session bounds keep the output timezone-free."""
    from dislib_spark.temporal import _epoch_seconds, sessionize

    units = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    num, unit = gap.split()
    gap_s = int(num) * units[unit.rstrip("s")]
    if not events.isStreaming:
        sess = sessionize(
            events, key_col, ts_col, gap=gap, tiebreak=None
        )
        sec = _epoch_seconds(sess, ts_col)
        return sess.groupBy(key_col, "session_id").agg(
            F.min(sec).alias("start_s"),
            F.max(sec).alias("end_s"),
            F.count(F.lit(1)).alias("n_events"),
        ).drop("session_id")
    if not ensure_protobuf(events.sparkSession):
        raise ImportError(
            "transformWithState requires google.protobuf; the vendored "
            "runtime (vendor/google/protobuf) is unavailable"
        )
    from dislib_spark.streaming.windows import _watermarked

    src = _watermarked(events, ts_col, watermark).select(
        F.col(key_col),
        F.col(ts_col),
        F.col(ts_col).cast("long").alias("t"),
    )
    return (
        src.groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(gap_s),
            outputStructType=(
                f"{key_col} long, start_s long, end_s long, "
                "n_events long"
            ),
            outputMode="Append",
            timeMode="EventTime",
        )
    )
