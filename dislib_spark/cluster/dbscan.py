"""DBSCAN density clustering.

Reference: ``dislib/cluster/dbscan/base.py:68-183`` + ``classes.py``
— grid-partition feature space into n_regions^d cells, run a local
DBSCAN per region, then merge labels across neighboring regions via
equivalence lists + BFS connected components on the driver
(``base.py:435-465``).

Spark-first redesign (standard parallel grid DBSCAN, cell side=eps):

1. grid keys as JVM expressions (narrow map); each point replicated
   to its 3^d neighbor cells (halo) so every home cell sees the full
   eps-ball of its own points;
2. pass 1 — exact core flags: per-cell neighbor counts for HOME
   points only (their eps-ball is fully inside cell+halo);
3. pass 2 — per-cell BFS clustering from known-global core flags
   (pure numpy, no sklearn);
4. merge — two provisional labels merge iff they share a core point:
   distributed min-label propagation to fixpoint (replaces the
   reference's driver-side BFS, scales with boundary points only).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


def _core_counts(
    X: np.ndarray, home: np.ndarray, eps: float, block: int = 2048
) -> np.ndarray:
    """Exact eps-neighbor counts for the home points of one cell.
    Blocked over home points so memory stays O(block·n) for dense
    cells (the reference bounds the same blow-up with max_samples,
    dbscan/base.py:20-67)."""
    Xh = X[home]
    out = np.empty(len(Xh), dtype=np.int64)
    for s in range(0, len(Xh), block):
        blk = Xh[s : s + block]
        d2 = ((blk[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
        out[s : s + block] = (d2 <= eps * eps).sum(axis=1)
    return out


def _bfs_cluster(
    X: np.ndarray, is_core: np.ndarray, eps: float, block: int = 2048
) -> np.ndarray:
    """BFS over core connectivity with GLOBAL core flags (replaces
    per-region sklearn DBSCAN, reference dbscan/classes.py:33-67).
    Border points attach to the first reaching cluster. Adjacency is
    built blocked (lists, not an n×n mask) to bound memory on dense
    cells."""
    n = len(X)
    neigh: list[np.ndarray] = []
    for s in range(0, n, block):
        d2 = ((X[s : s + block, None, :] - X[None, :, :]) ** 2).sum(axis=2)
        mask = d2 <= eps * eps
        neigh.extend(np.nonzero(row)[0] for row in mask)
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not is_core[i]:
            continue
        labels[i] = cluster
        stack = [i]
        while stack:
            p = stack.pop()
            for q in neigh[p]:
                if labels[q] == -1:
                    labels[q] = cluster
                    if is_core[q]:
                        stack.append(q)
        cluster += 1
    return labels


def build_halo(x: DsArray, eps: float, cache: bool = True):
    """Grid keys + 3^d halo replication (reference dbscan/base.py
    region grid): each point is emitted to its home cell and every
    neighbor cell, so a home cell sees the full eps-ball of its own
    points. Returns a DataFrame (row_id, feat, cell struct, is_home),
    cached by default for ``fit_predict``'s two passes; single-pass
    callers (core-flag-only queries) pass ``cache=False`` — storing a
    3^d-replicated table that is read once is pure memory-store
    write cost."""
    n, d = x.shape
    spark = x.spark
    mins_row = x.df.agg(
        *[
            F.min(F.element_at(F.col(_FEAT), j + 1)).alias(f"m{j}")
            for j in range(d)
        ]
    ).collect()[0]
    mins = [float(mins_row[f"m{j}"]) for j in range(d)]

    cell_cols = [
        F.floor(
            (F.element_at(F.col(_FEAT), j + 1) - F.lit(mins[j]))
            / F.lit(eps)
        ).cast("long").alias(f"c{j}")
        for j in range(d)
    ]
    pts = x.df.select(_ROW, _FEAT, *cell_cols)

    offsets = _neighbor_offsets(d)
    off_df = spark.createDataFrame(
        [(i, list(o)) for i, o in enumerate(offsets)],
        "off_id int, off array<long>",
    )
    halo = pts.crossJoin(F.broadcast(off_df)).select(
        _ROW,
        _FEAT,
        F.struct(
            *[
                (F.col(f"c{j}") + F.element_at("off", j + 1)).alias(f"h{j}")
                for j in range(d)
            ]
        ).alias("cell"),
        (F.col("off_id") == 0).alias("is_home"),
    )
    return halo.cache() if cache else halo


def core_flags(halo, eps: float, min_samples: int):
    """Pass 1 — exact core flags per home point (its eps-ball is fully
    inside cell+halo). Returns (row_id, is_core).

    Implemented as ONE batched ``mapInPandas`` over cell-sorted
    partitions instead of per-cell ``applyInPandas``: a grid has
    thousands of small cells, and per-group invocation paid an Arrow/
    pandas conversion plus Python call per cell (the dominant cost —
    the numpy distance work itself is milliseconds). Here each task
    converts its whole batch once and walks cells as contiguous numpy
    slices; per-point counts use the identical blocked
    ``(a-b)**2 <= eps**2`` arithmetic per cell, so flags are
    bit-identical. A cell can span Arrow batch boundaries within a
    partition, so an unfinished trailing cell is carried into the
    next batch before being flushed."""
    import pandas as pd

    cell_fields = [
        f"cell.{f.name}" for f in halo.schema["cell"].dataType.fields
    ]
    d = len(cell_fields)

    def count_partition(batches):
        carry: pd.DataFrame | None = None

        def flush(pdf: pd.DataFrame, tail_open: bool):
            nonlocal carry
            C = np.column_stack(
                [pdf[f"_k{j}"].to_numpy() for j in range(d)]
            )
            if len(C) == 0:
                return None
            # boundaries where any grid coordinate changes (input is
            # sorted by the cell key within the partition)
            chg = np.nonzero((C[1:] != C[:-1]).any(axis=1))[0] + 1
            starts = np.concatenate(([0], chg))
            ends = np.concatenate((chg, [len(C)]))
            if tail_open:
                # last group may continue in the next batch
                carry = pdf.iloc[starts[-1] :]
                starts, ends = starts[:-1], ends[:-1]
            else:
                carry = None
            if len(starts) == 0:
                return None
            X_all = np.array(pdf[_FEAT].tolist(), dtype=np.float64)
            home_all = pdf["is_home"].to_numpy()
            rows_all = pdf[_ROW].to_numpy()
            out_rows, out_core = [], []
            for s, e in zip(starts, ends):
                home = home_all[s:e]
                if not home.any():
                    continue
                cnt = _core_counts(X_all[s:e], home, eps)
                out_rows.append(rows_all[s:e][home])
                out_core.append(cnt >= min_samples)
            if not out_rows:
                return None
            return pd.DataFrame(
                {
                    "row_id": np.concatenate(out_rows),
                    "is_core": np.concatenate(out_core),
                }
            )

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            res = flush(pdf, tail_open=True)
            if res is not None:
                yield res
        if carry is not None:
            res = flush(carry, tail_open=False)
            if res is not None:
                yield res

    # explicit user-numbered repartition on the grouping key: the
    # halo table is small in bytes, so AQE would coalesce the
    # exchange to 1-2 tasks and serialize every eps-ball count
    # through one Python worker; the numbered repartition keeps
    # cluster parallelism, and the within-partition sort groups each
    # cell contiguously for the batch walker. Only the columns the
    # kernel needs cross the Python boundary (guide §4.1).
    dp = halo.sparkSession.sparkContext.defaultParallelism
    flat = halo.select(
        _ROW,
        _FEAT,
        "is_home",
        *[F.col(c).alias(f"_k{j}") for j, c in enumerate(cell_fields)],
    )
    return (
        flat.repartition(dp, *[f"_k{j}" for j in range(d)])
        .sortWithinPartitions(*[f"_k{j}" for j in range(d)])
        .mapInPandas(count_partition, "row_id long, is_core boolean")
    )


class DBSCAN:
    """sklearn-style facade (reference cluster/dbscan/base.py:20-67;
    the reference's n_regions grid becomes an eps-derived grid)."""

    def __init__(self, eps: float = 0.5, min_samples: int = 5):
        self.eps = eps
        self.min_samples = min_samples
        self.n_clusters_: int | None = None

    def fit_predict(self, x: DsArray) -> DsArray:
        import pandas as pd

        eps, min_samples = self.eps, self.min_samples
        n, d = x.shape

        halo = build_halo(x, eps)
        try:
            # ---- pass 1: exact core flags --------------------------
            flags = core_flags(halo, eps, min_samples)

            # ---- pass 2: per-cell BFS with global core flags -------
            halo_flag = halo.join(
                flags.withColumnRenamed("row_id", _ROW), _ROW
            )

            def cell_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
                X = np.array(pdf[_FEAT].tolist(), dtype=np.float64)
                is_core = pdf["is_core"].to_numpy()
                labels = _bfs_cluster(X, is_core, eps)
                # provisional label = MIN CORE row_id of the local
                # cluster: globally collision-free by construction —
                # if two cells emit the same label they share that
                # core point, which is exactly the legitimate merge
                # condition. (A truncated hash(cell) key could collide
                # between unrelated cells and fuse their clusters.)
                # Every local cluster has ≥1 core (BFS seeds on cores).
                rows = pdf[_ROW].to_numpy()
                glob = np.full(len(labels), -1, dtype=np.int64)
                for l in np.unique(labels[labels >= 0]):
                    m = labels == l
                    glob[m] = rows[m & is_core].min()
                return pd.DataFrame(
                    {
                        "row_id": rows,
                        "is_home": pdf["is_home"],
                        "label": glob,
                        "is_core": is_core,
                    }
                )

            local = halo_flag.groupBy("cell").applyInPandas(
                cell_cluster,
                "row_id long, is_home boolean, label long, is_core boolean",
            ).cache()

            # ---- merge: min-label propagation to fixpoint ----------
            core_memb = local.where(
                (F.col("label") >= 0) & F.col("is_core")
            ).select("row_id", "label").cache()
            assign = core_memb.groupBy("row_id").agg(
                F.min("label").alias("comp")
            )
            for _ in range(50):
                label_comp = (
                    core_memb.join(assign, "row_id")
                    .groupBy("label")
                    .agg(F.min("comp").alias("lcomp"))
                )
                new_assign = (
                    core_memb.join(label_comp, "label")
                    .groupBy("row_id")
                    .agg(F.min("lcomp").alias("comp"))
                )
                changed = (
                    new_assign.join(
                        assign.withColumnRenamed("comp", "old"), "row_id"
                    )
                    .where(F.col("comp") != F.col("old"))
                    .limit(1)
                    .count()
                )
                assign = new_assign
                if changed == 0:
                    break

            # border points: adopt their home-cell label's component
            label_comp = (
                core_memb.join(assign, "row_id")
                .groupBy("label")
                .agg(F.min("comp").alias("lcomp"))
            )
            border = local.where(
                F.col("is_home") & (F.col("label") >= 0) & ~F.col("is_core")
            ).select("row_id", "label")
            border_assign = (
                border.join(label_comp, "label")
                .groupBy("row_id")
                .agg(F.min("lcomp").alias("comp"))
            )
            full = assign.unionAll(border_assign).groupBy("row_id").agg(
                F.min("comp").alias("comp")
            )

            # dense cluster ids (distinct comps are few — driver map)
            comps = [
                r["comp"]
                for r in full.select("comp").distinct().orderBy("comp").collect()
            ]
            self.n_clusters_ = len(comps)
            if comps:
                mapping = F.create_map(
                    *[
                        F.lit(v)
                        for kv in ((c, i) for i, c in enumerate(comps))
                        for v in kv
                    ]
                )
                labeled = full.select(
                    F.col("row_id").alias("_lid"),
                    mapping[F.col("comp")].cast("long").alias("cluster"),
                )
            else:
                labeled = full.select(
                    F.col("row_id").alias("_lid"),
                    F.lit(-1).cast("long").alias("cluster"),
                )
            out = (
                x.df.select(_ROW)
                .join(labeled, F.col(_ROW) == F.col("_lid"), "left")
                .select(
                    F.col(_ROW),
                    F.array(
                        F.coalesce(F.col("cluster"), F.lit(-1)).cast("double")
                    ).alias(_FEAT),
                )
            )
            return DsArray(out, (n, 1))
        finally:
            halo.unpersist()


def _neighbor_offsets(d: int):
    """3^d offsets, zero offset first (off_id 0 = home cell)."""
    from itertools import product

    return sorted(
        product([-1, 0, 1], repeat=d),
        key=lambda o: (o != tuple([0] * d), o),
    )
