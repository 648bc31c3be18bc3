"""Zero-cost pipeline metrics via the Observation API.

A curation pipeline wants per-stage accounting (rows in, rows kept,
mass filtered) — but a separate ``count()``/``agg()`` per stage
re-scans the data. ``Observation`` attaches accumulator-backed
metrics to the EXISTING action: one scan, metrics for free. This is
the 100 TB way to answer "how many docs did the quality gate drop"
without doubling the job.

N/A in the reference (PyCOMPSs has no accumulator surface);
Spark-native engine utility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, "object"]:
    """Attach named metrics to ``df``; returns (df, observation).

    Read ``observation.get`` AFTER an action on the returned frame
    (metrics are collected during that action — no extra scan).

    Example::

        kept, obs = observed(
            docs.where(quality > 0.6), "gate",
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
        kept.write.parquet(out)      # one scan
        stats = obs.get              # {'n_kept': ..., 'chars_kept': ...}
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def funnel_metrics(
    stages: list[tuple[str, DataFrame]]
) -> tuple[list[DataFrame], list]:
    """Attach a row-count observation to every (name, df) stage of a
    filter funnel. Returns (observed frames, observations) — drive ONE
    action over the last frame (stages normally chain) and read every
    stage's count without re-scanning."""
    out_frames, out_obs = [], []
    for name, df in stages:
        f, o = observed(df, name, F.count(F.lit(1)).alias("n"))
        out_frames.append(f)
        out_obs.append(o)
    return out_frames, out_obs
