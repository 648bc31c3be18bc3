from dislib_spark.streaming.windows import (
    dedup_within_watermark, running_user_stats, session_windows, sliding_avg, tumbling_counts,
)


def await_drain(query, timeout_sec: int, label: str = "stream") -> None:
    """``awaitTermination`` with the return value ENFORCED: an
    availableNow drain that outlives ``timeout_sec`` is stopped and
    raised as a TimeoutError instead of silently returning with a
    partial sink — a partial memory table / half-applied foreachBatch
    erase would otherwise surface only as a confusing downstream
    value mismatch with no error pointing at the stream."""
    finished = query.awaitTermination(timeout_sec)
    if not finished:
        query.stop()
        raise TimeoutError(
            f"{label}: availableNow stream did not finish within "
            f"{timeout_sec} s — sink state is partial"
        )


__all__ = [
    "await_drain", "dedup_within_watermark", "running_user_stats",
    "session_windows", "sliding_avg", "tumbling_counts",
]
