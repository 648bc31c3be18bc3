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


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _partition_value_str(v) -> str:
    """The decoded string form a partition value takes in an on-disk
    ``col=value`` directory name (dates/ints/strings; NULL maps to
    Hive's sentinel directory)."""
    return _HIVE_NULL if v is None else str(v)


def _partition_dirs(root: str, partition_col: str) -> dict[str, str]:
    """Map DECODED partition value -> on-disk directory name under
    ``root``. Spark percent-escapes special characters (space, colon,
    slash, …) when writing ``col=value`` directories, so matching must
    decode the on-disk name rather than string-assemble ``col=value``
    — a value containing a space would otherwise never match."""
    import os
    from urllib.parse import unquote

    prefix = partition_col + "="
    out: dict[str, str] = {}
    if os.path.isdir(root):
        for name in os.listdir(root):
            if name.startswith(prefix) and os.path.isdir(
                os.path.join(root, name)
            ):
                out[unquote(name[len(prefix):])] = name
    return out


def _apply_swap_manifest(path: str, tmp: str, old: str) -> None:
    """Execute (or idempotently re-execute) the rename plan journaled
    in ``old/_MANIFEST.json``: per entry, move the original partition
    directory out to ``old`` (skipped if already moved), then move
    the replacement in from ``tmp`` (skipped if already landed or the
    partition was emptied). Every rename is guarded by existence
    checks and each rename is atomic, so replaying after a crash at
    ANY point completes the same end state.

    Removing the manifest is the COMMIT point: it happens here,
    immediately after the last rename and before any caller deletes
    ``tmp``/``old``. A ``.__pold__`` that still holds a manifest is
    therefore always an IN-PROGRESS swap (safe to replay); one without
    a manifest is a COMPLETED swap's leftover (safe to sweep). Without
    this ordering, a crash midway through deleting ``old`` could
    remove some ``old/<part>`` dirs while the manifest survived, and
    a replay would then rename the already-landed replacement back
    out — losing the partition's surviving rows."""
    import json
    import os

    with open(os.path.join(old, _MANIFEST)) as fh:
        plan = json.load(fh)
    for e in plan:
        s, t, dest = e["src"], e["tmp"], e["dest"]
        if s is not None:
            sp = os.path.join(path, s)
            op = os.path.join(old, s)
            if os.path.isdir(sp) and not os.path.isdir(op):
                os.rename(sp, op)
        if t is not None:
            tp = os.path.join(tmp, t)
            dp = os.path.join(path, dest)
            if os.path.isdir(tp) and not os.path.isdir(dp):
                os.rename(tp, dp)
    # commit: once the manifest is gone, .__pold__/.__ptmp__ are inert
    # leftovers and any later crash in their cleanup cannot trigger a
    # destructive replay
    os.remove(os.path.join(old, _MANIFEST))


_MANIFEST = "_MANIFEST.json"


def _recover_partition_swap(path: str, partition_col: str) -> None:
    """Complete (forward) an interrupted :func:`replace_partitions_path`
    swap. ``.__pold__`` containing a manifest means the swap phase
    began — replay the journaled rename plan to completion (always
    safe: the ``.__ptmp__`` sibling is written in full before the
    manifest, and the manifest before any rename). ``.__pold__``
    without a manifest, or a bare ``.__ptmp__``, means no table
    directory was ever touched — plain leftovers, delete them."""
    import os
    import shutil

    tmp = path.rstrip("/") + ".__ptmp__"
    old = path.rstrip("/") + ".__pold__"
    if os.path.isfile(os.path.join(old, _MANIFEST)):
        _apply_swap_manifest(path, tmp, old)
    for leftover in (tmp, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)


def replace_partitions_path(
    path: str,
    partition_col: str,
    values: list,
    frame: DataFrame,
) -> int:
    """Crash-safe copy-on-write replacement of the ``values``
    partitions of the parquet table at ``path`` with ``frame``'s rows
    (which must contain only those partition values; a value absent
    from ``frame`` removes the partition — the emptied-partition case
    dynamic overwrite cannot express — and a value with no existing
    directory creates a brand-new partition).

    Protocol (the partition-scoped form of :func:`merge_into_path`'s
    swap): the replacement rows are written IN FULL to a ``.__ptmp__``
    sibling; the rename plan is journaled to
    ``.__pold__/_MANIFEST.json``; then each affected partition
    directory is renamed out to ``.__pold__`` and its replacement
    renamed in. A crash before the manifest lands leaves the table
    untouched (leftovers are swept); a crash after is rolled FORWARD
    by :func:`_recover_partition_swap` replaying the manifest — the
    in-place dynamic-overwrite alternative can be half-rewritten with
    the survivors lost, unacceptable for a GDPR-erasure primitive.

    On-disk directories are matched by DECODING their names (Spark
    percent-escapes special characters in partition values), never by
    assembling ``col=value`` strings — a value containing a space
    would otherwise never match. Returns the number of partitions
    replaced, removed, or created."""
    import json
    import os
    import shutil

    if not values:
        return 0
    # complete any interrupted prior swap FIRST (callers like
    # erase_keys_path also recover on entry, but a direct caller —
    # e.g. an incremental-rollup repair — must be safe on its own:
    # a crashed swap's survivors live in .__pold__ until replayed)
    _recover_partition_swap(path, partition_col)
    tmp = path.rstrip("/") + ".__ptmp__"
    old = path.rstrip("/") + ".__pold__"
    frame.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    want = {_partition_value_str(v) for v in values}
    src = _partition_dirs(path, partition_col)
    tmp_dirs = _partition_dirs(tmp, partition_col)
    orphan = want - set(src) - set(tmp_dirs)
    if orphan:
        raise FileNotFoundError(
            f"partitions {sorted(orphan)} neither exist on disk under "
            f"{path!r} nor appear in the replacement frame (decoded "
            f"{partition_col}= directory names)"
        )
    plan = []
    for val in sorted(want):
        s = src.get(val)
        t = tmp_dirs.get(val)
        # keep the table's original directory name when replacing so
        # a reader mid-recovery sees a stable layout; new partitions
        # take Spark's canonical escaped name from tmp
        plan.append({"src": s, "tmp": t, "dest": s if s else t})
    os.makedirs(old, exist_ok=True)
    # the manifest must appear ATOMICALLY: a crash mid-write must not
    # leave truncated JSON under the final name (recovery would then
    # raise on every entry, wedging the erase/maintain path), so write
    # to a temp name, fsync, and rename into place — a manifest that
    # exists is always parseable and complete
    mtmp = os.path.join(old, _MANIFEST + ".tmp")
    with open(mtmp, "w") as fh:
        json.dump(plan, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(mtmp, os.path.join(old, _MANIFEST))
    _apply_swap_manifest(path, tmp, old)
    shutil.rmtree(tmp)
    shutil.rmtree(old)
    return len(want)


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
    that actually hold such rows (copy-on-write via
    :func:`replace_partitions_path` — the GDPR-erasure shape at
    100 TB: cost proportional to the erased keys' partition fan-out,
    never the table; crash-safe tmp+rename swap, so a failed erase
    never corrupts untouched data). A partition left empty has its
    directory removed. Returns the number of partitions rewritten or
    removed.

    Same copy-on-write contract as ``vector.search.ivf_index_maintain``
    / ``pq_index_maintain``; the :func:`merge_into_path` swap protocol
    is the whole-table alternative when the table has no partition
    column to scope by."""
    _recover_partition_swap(path, partition_col)
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
    # isin() never matches NULL — select a NULL partition explicitly
    # or its kept rows would be dropped from the rewrite
    non_null = [p for p in parts if p is not None]
    cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if len(non_null) != len(parts):
        cond = cond | F.col(partition_col).isNull()
    kept = stored.where(cond).join(
        k, stored[key_col] == F.col("__k"), "left_anti"
    )
    return replace_partitions_path(path, partition_col, parts, kept)


def enforce_retention_path(
    spark,
    path: str,
    partition_col: str,
    ttl_days,
    as_of: str,
) -> tuple[int, int]:
    """Retention-policy (TTL) ENFORCEMENT against a parquet table
    partitioned by a day-string ``partition_col`` — the execution of
    the x107 plan, and the TTL twin of :func:`erase_keys_path`: rows
    whose partition day is more than ``ttl_days`` (a per-row Column,
    e.g. a per-event-type CASE) days older than ``as_of`` are
    expired. Days where EVERYTHING expired are dropped (directory
    removed, zero rows read); days where nothing expired are never
    touched; mixed days are rewritten copy-on-write — all through the
    same journaled crash-safe :func:`replace_partitions_path` swap,
    so a failed enforcement never corrupts surviving data. Cost
    tracks the expired days' fan-out, never the table (the 100 TB
    expiry shape: the DROP class is O(1) per partition). Returns
    ``(n_dropped, n_rewritten)``.

    Retention is idempotent and watermark-monotone: enforcing at
    ``as_of₁`` then ``as_of₂ ≥ as_of₁`` leaves exactly the table a
    one-shot enforcement at ``as_of₂`` leaves (expired-at-1 ⊆
    expired-at-2), which is what lets it run continuously from a
    stream of watermark ticks (``streaming.cdc.retention_sink``)."""
    _recover_partition_swap(path, partition_col)
    stored = spark.read.parquet(path)
    age = F.datediff(
        F.lit(as_of).cast("date"), F.col(partition_col).cast("date")
    )
    expired = age > ttl_days
    per_day = (
        stored.groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(expired.cast("long")).alias("_e"),
        )
        .where(F.col("_e") > 0)
        .collect()
    )
    drop = [r[partition_col] for r in per_day if r["_e"] == r["_n"]]
    rewrite = [r[partition_col] for r in per_day if r["_e"] < r["_n"]]
    if not drop and not rewrite:
        return 0, 0
    survivors = stored.where(
        F.col(partition_col).isin(rewrite) if rewrite else F.lit(False)
    ).where(~expired)
    replace_partitions_path(
        path, partition_col, drop + rewrite, survivors
    )
    return len(drop), len(rewrite)
