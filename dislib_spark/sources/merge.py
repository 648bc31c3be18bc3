"""MERGE INTO (upsert) for parquet-backed tables.

The lakehouse write primitive (Delta/Iceberg MERGE shape) expressed
as plain DataFrame ops: WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED
THEN INSERT, optional WHEN MATCHED AND <cond> THEN DELETE. N/A in the
reference (no mutable table layer); extension surface next to the
x43 CDC read-side compaction.

Scale design: ONE full-outer equi-join on the key — shuffled hash /
sort-merge, linear in |target| + |updates|; per-column COALESCE keeps
everything in whole-stage codegen. ``merge_into_path`` is the
copy-on-write form: at 100 TB you'd partition the target and rewrite
only the partitions the updates touch (join the updates' distinct
partition keys first — partition pruning bounds the rewrite); the
full-rewrite here is the sf-scale simplification of that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_condition: Column | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` on ``keys``.

    Matched rows take ALL non-key columns from ``updates``; unmatched
    target rows pass through; unmatched update rows are inserted.
    ``delete_condition`` (evaluated on the update side's columns,
    pre-join) drops matched target rows instead of updating them —
    the WHEN MATCHED ... THEN DELETE arm.

    Both inputs must share the target's schema (names and types).
    Returns the merged table with the target's column order.
    """
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            "merge_into requires identical schemas: "
            f"{sorted(target.columns)} vs {sorted(updates.columns)}"
        )
    if delete_condition is not None:
        deletes = updates.where(delete_condition).select(*keys)
        updates = updates.where(~delete_condition)
        target = target.join(deletes, keys, "left_anti")
    # prefix the update side so every column stays unambiguously
    # addressable after the full-outer join (a USING-style join would
    # coalesce the key columns away)
    u = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in updates.columns]
    )
    cond = None
    for k in keys:
        c = target[k] == u[f"__u_{k}"]
        cond = c if cond is None else (cond & c)
    merged = target.join(u, cond, "full_outer")
    from_update = F.col(f"__u_{keys[0]}").isNotNull()
    cols = []
    for c in target.columns:
        # update wins when the key matched or the row is new; a
        # matched update with NULL in a column still wins (MERGE
        # semantics: the WHEN MATCHED arm replaces the row), so pick
        # by key presence, not per-column coalesce.
        cols.append(
            F.when(from_update, F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
        )
    return merged.select(*cols)


def merge_into_path(
    spark,
    path: str,
    updates: DataFrame,
    keys: list[str],
    delete_condition: Column | None = None,
) -> None:
    """Copy-on-write MERGE against a parquet table at ``path``.

    Crash-safe single-writer protocol: the merged result is written to
    a temp sibling directory first, then swapped in with two directory
    renames (old → ``.__old__``, tmp → ``path``). A crash before the
    first rename leaves the target untouched; a crash between the two
    renames leaves the committed result in ``.__tmp__`` and the prior
    table in ``.__old__`` — nothing is ever deleted before the new
    data is fully durable. Recovery on entry FIRST checks whether the
    target is missing (the mid-swap crash state) and completes the
    swap from ``.__tmp__`` (preferred: it holds the fully-written
    merged result) or rolls back from ``.__old__``; only when the
    target exists are leftovers stale debris safe to clear.
    Partition-scoped rewrite is the at-scale form — see module
    docstring.
    """
    import os
    import shutil

    tmp = path.rstrip("/") + ".__tmp__"
    old = path.rstrip("/") + ".__old__"
    if not os.path.isdir(path):
        # mid-swap crash: the rename of path → old succeeded but
        # tmp → path did not. NEVER delete the survivors here — they
        # are the only copies. Prefer tmp (the durable merged result,
        # written in full before the first rename), else roll back.
        if os.path.isdir(tmp):
            os.rename(tmp, path)
        elif os.path.isdir(old):
            os.rename(old, path)
        else:
            raise FileNotFoundError(
                f"merge target {path!r} missing and no "
                f".__tmp__/.__old__ survivor to recover from"
            )
    for leftover in (tmp, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    target = spark.read.parquet(path)
    merged = merge_into(target, updates, keys, delete_condition)
    # write the full result to the sibling BEFORE touching the target:
    # the plan reads the files being replaced, and the target must
    # survive any failure up to the final rename
    merged.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def erase_keys_path(
    spark,
    path: str,
    keys: DataFrame,
    key_col: str,
    partition_col: str,
) -> int:
    """Right-to-be-forgotten DELETE against a parquet table
    partitioned by ``partition_col``: every row whose ``key_col``
    appears in ``keys`` is removed, rewriting ONLY the partitions
    that actually hold such rows (dynamic partition overwrite — the
    GDPR-erasure shape at 100 TB: cost proportional to the erased
    keys' partition fan-out, never the table). A partition left
    empty has its directory removed (dynamic overwrite cannot emit
    an empty partition). Returns the number of partitions rewritten
    or removed.

    Same copy-on-write contract as ``vector.search.ivf_index_maintain``
    / ``pq_index_maintain``; the :func:`merge_into_path` swap protocol
    is the whole-table alternative when the table has no partition
    column to scope by."""
    import os
    import shutil

    stored = spark.read.parquet(path)
    k = F.broadcast(keys.select(F.col(key_col).alias("__k")).distinct())
    affected = (
        stored.join(k, stored[key_col] == F.col("__k"), "left_semi")
        .select(partition_col)
        .distinct()
    )
    parts = [r[partition_col] for r in affected.collect()]
    if not parts:
        return 0
    kept = stored.where(F.col(partition_col).isin(parts)).join(
        k, stored[key_col] == F.col("__k"), "left_anti"
    )
    kept = kept.localCheckpoint(eager=True)
    out_parts = {
        r[partition_col]
        for r in kept.select(partition_col).distinct().collect()
    }
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    for p in parts:
        if p not in out_parts:
            d = os.path.join(path, f"{partition_col}={p}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    return len(parts)
