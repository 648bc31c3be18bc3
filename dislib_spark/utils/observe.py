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
    df: DataFrame, stages: list[tuple[str, Column]]
) -> tuple[DataFrame, list]:
    """Build a filter funnel with a row-count observation BETWEEN
    every stage: ``stages`` is an ordered list of (name, predicate).
    Returns (final df, observations) — one action on the final frame
    populates every observation (each observed node is in the
    executed plan's lineage because the chain is built here).

    The chain MUST be built through the observed frames — observing a
    frame returns a NEW DataFrame, and an observation on a frame the
    executed plan never references blocks forever on ``.get``. This
    helper exists so callers can't fall into that trap."""
    obs_list = []
    cur, o = observed(df, "funnel_in", F.count(F.lit(1)).alias("n"))
    obs_list.append(o)
    for name, pred in stages:
        cur, o = observed(
            cur.where(pred), name, F.count(F.lit(1)).alias("n")
        )
        obs_list.append(o)
    return cur, obs_list
