from dislib_spark.streaming.windows import (
    dedup_within_watermark, running_user_stats, session_windows, sliding_avg, tumbling_counts,
)

__all__ = [
    "dedup_within_watermark", "running_user_stats", "session_windows",
    "sliding_avg", "tumbling_counts",
]
