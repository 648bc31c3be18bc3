"""Random projection (Johnson-Lindenstrauss) for embedding columns:
reduce ``array<float>`` vectors to a lower dimension while roughly
preserving norms/distances — the cheap first stage before clustering
or ANN at 100 TB (project once, run the expensive op in 8-16 dims).

Scale design: the plane matrix is tiny (out_dim × in_dim doubles) and
is embedded as LITERAL arrays in the plan — broadcast by value to
every task, zero shuffle, whole-stage codegen per output dim. For
large out_dim (≥64) the expression tree gets wide; that regime should
use the DsArray matmul path (``array/linalg.py``) instead — this
module is the low-out_dim fast path.

Planes are rounded to 6 decimals so the SAME literals can be replayed
in any engine (the v05 oracle embeds them in DuckDB SQL) — the
projection is a pure deterministic function of (seed, dims).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def projection_planes(
    in_dim: int, out_dim: int, seed: int = 7
) -> list[list[float]]:
    """Gaussian plane matrix scaled by 1/sqrt(out_dim) (so projected
    norms are unbiased estimates of original norms), rounded to 6
    decimals for cross-engine literal replay."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)
    return [[round(float(v), 6) for v in row] for row in planes]


def project(vec: Column, planes: list[list[float]]) -> Column:
    """Project an array column onto each plane row: returns
    ``array<double>`` of length ``len(planes)``. One JVM
    zip_with+aggregate fold per output dim."""
    dots = [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in row]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for row in planes
    ]
    return F.array(*dots)


def random_project(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    seed: int = 7,
    out_col: str = "proj",
) -> DataFrame:
    """Add ``out_col`` with the projected vector. ``in_dim`` is
    inferred from the first row (a stale caller-supplied dim would
    silently truncate the zip_with)."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot infer dim from an empty DataFrame")
    planes = projection_planes(int(first["d"]), out_dim, seed)
    return df.withColumn(out_col, project(F.col(vec_col), planes))
