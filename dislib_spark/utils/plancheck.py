"""Physical-plan audit: structured facts from ``explain("formatted")``.

The scale-readiness checks this repo's own regression tests enforce
(no cartesian products, no row-at-a-time Python UDFs, filters pushed
to the scan, bounded exchange count), packaged as a user-facing
utility — run it on YOUR query before pointing it at 100 TB:

    from dislib_spark.utils.plancheck import plan_facts, assert_scale_safe
    facts = plan_facts(df)
    assert_scale_safe(df)            # raises with the offending plan

N/A in the reference (PyCOMPSs task graphs have no optimizer to
audit); this is Spark-native engine surface.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanFacts:
    """Structured summary of a physical plan."""

    has_cartesian: bool
    has_bnlj: bool
    has_python_row_udf: bool
    has_arrow_python: bool
    n_exchanges: int
    n_broadcast_exchanges: int
    n_scans: int
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    join_kinds: list[str] = field(default_factory=list)
    raw: str = ""


def plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_facts(df: DataFrame) -> PlanFacts:
    plan = plan_text(df)
    pushed: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            pushed.extend(p.strip() for p in m.group(1).split(","))
    schemas = [
        m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)
    ]
    joins = sorted(
        set(
            m.group(1)
            for m in re.finditer(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                plan,
            )
        )
    )
    # count NODE HEADERS ("(4) Exchange") only: explain("formatted")
    # prints every node twice (tree line + detail section), so a raw
    # substring count would double every figure
    n_bx = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
    n_ex = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    return PlanFacts(
        has_cartesian="CartesianProduct" in plan,
        has_bnlj="BroadcastNestedLoopJoin" in plan,
        has_python_row_udf="BatchEvalPython" in plan,
        has_arrow_python=(
            "ArrowEvalPython" in plan
            or "FlatMapGroupsInPandas" in plan
            or "MapInPandas" in plan
            or "MapInArrow" in plan
        ),
        n_exchanges=n_ex,
        n_broadcast_exchanges=n_bx,
        n_scans=len(
            re.findall(
                r"^\(\d+\) Scan (?:parquet|ExistingRDD)", plan, re.M
            )
        ),
        pushed_filters=pushed,
        read_schemas=schemas,
        join_kinds=joins,
        raw=plan,
    )


def assert_scale_safe(
    df: DataFrame,
    allow_bnlj: bool = False,
    allow_python_row_udf: bool = False,
    max_exchanges: int | None = None,
) -> PlanFacts:
    """Raise AssertionError (with the plan attached) if the query has
    a shape that dies at scale: a cartesian product, an unexpected
    BroadcastNestedLoopJoin, a row-at-a-time Python UDF, or more
    shuffle exchanges than ``max_exchanges``. Returns the facts on
    success so callers can make further checks."""
    f = plan_facts(df)
    problems = []
    if f.has_cartesian:
        problems.append("CartesianProduct (O(n^2) at any scale)")
    if f.has_bnlj and not allow_bnlj:
        problems.append(
            "BroadcastNestedLoopJoin (pass allow_bnlj=True only for an "
            "intentional broadcast-small-side fan-out)"
        )
    if f.has_python_row_udf and not allow_python_row_udf:
        problems.append(
            "BatchEvalPython (row-at-a-time Python UDF — use built-in "
            "functions or an Arrow-batched pandas UDF)"
        )
    if max_exchanges is not None and f.n_exchanges > max_exchanges:
        problems.append(
            f"{f.n_exchanges} shuffle exchanges > max {max_exchanges}"
        )
    if problems:
        raise AssertionError(
            "plan is not scale-safe: " + "; ".join(problems) + "\n" + f.raw
        )
    return f
