"""SVMLight as a REAL Spark data source (Python DataSource API).

``sources.load_svmlight_file`` parses svmlight through ``spark.read
.text`` + column expressions; this module registers the same format
as a first-class source — ``spark.read.format("svmlight")`` — using
Spark 4's Python DataSource API (reference surface: dislib
``data/io.py:15-75`` ``load_svmlight_file``):

- one ``InputPartition`` per file → files scan in parallel across
  executors (a directory of shards behaves like any multi-file scan);
- rows come back sparse (label, indices, values) — densify only on
  request, same contract as ``array.load_svmlight_sparse``.

``pushFilters`` is deliberately NOT implemented: in Spark 4.1 the
reader instance is cached inside the DataFrame's scan relation and
``pushFilters`` is only invoked when the query has pushable
conjuncts — so a filter pushed by one query LEAKS into later
filterless queries on the same DataFrame (verified empirically:
``df.where(label==1).count()`` then ``df.count()`` returned the
filtered count). A row-skipping option (``.option("min_label", x)``)
gives the same scan-side saving without cross-query mutable state;
tests/test_svmlight_source.py pins the no-leak behavior.

Register once per session::

    from dislib_spark.sources.svmlight_source import register
    register(spark)
    df = spark.read.format("svmlight").load("/data/train_dir")
    # optional scan-side skipping: .option("min_label", "0.5")
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("label", DoubleType()),
        StructField("indices", ArrayType(IntegerType())),
        StructField("values", ArrayType(DoubleType())),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SvmlightReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if self.path is None:
            raise ValueError(
                "svmlight source requires a path: "
                "spark.read.format('svmlight').load('/file-or-dir')"
            )
        # scan-side row skipping via explicit options (stateless
        # across queries — see module docstring for why pushFilters
        # is not used)
        self.min_label = options.get("min_label")
        self.max_label = options.get("max_label")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith((".", "_"))
                and not f.endswith(".inprogress")
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def _keep(self, label: float) -> bool:
        if self.min_label is not None and label < float(self.min_label):
            return False
        if self.max_label is not None and label > float(self.max_label):
            return False
        return True

    def read(self, partition):
        with open(partition.path) as fh:
            for line in fh:
                line = line.split("#", 1)[0].strip()
                if not line:
                    continue
                parts = line.split()
                label = float(parts[0])
                if not self._keep(label):
                    continue
                idx, vals = [], []
                for tok in parts[1:]:
                    i, v = tok.split(":", 1)
                    idx.append(int(i))
                    vals.append(float(v))
                yield (label, idx, vals)


class SvmlightDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "svmlight"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        opts = dict(self.options)
        return SvmlightReader(opts)

    def writer(self, schema, overwrite: bool):
        return SvmlightWriter(dict(self.options), overwrite)


def register(spark) -> None:
    """Register the ``svmlight`` format for this session."""
    spark.dataSource.register(SvmlightDataSource)


class _Committed(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class SvmlightWriter(DataSourceWriter):
    """Two-phase per-partition shard writer (shared-filesystem
    semantics — local fs here, NFS/fuse mounts at scale):

    - tasks write ``part-<pid>-<taskid>.txt.inprogress`` (task
      attempt id in the name → speculative/retried attempts never
      collide) and return the path in their commit message;
    - ``commit`` renames exactly the COMMITTED attempts' files to
      final ``.txt`` names and sweeps any leftover ``.inprogress``
      (zombie / speculative-loser / truncated attempts) — readers
      only ever see fully-written shards;
    - ``mode("overwrite")`` clears prior ``.txt`` shards up front
      (driver-side, before any task runs).
    """

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if self.path is None:
            raise ValueError(
                "svmlight writer requires a path: "
                "df.write.format('svmlight').save('/dir')"
            )
        if overwrite and os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.endswith(".txt") or f.endswith(".inprogress"):
                    os.remove(os.path.join(self.path, f))

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        tid = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(
            self.path, f"part-{pid:05d}-{tid}.txt.inprogress"
        )
        n = 0
        with open(out, "w") as fh:
            for row in iterator:
                # %.17g round-trips IEEE doubles exactly ('%g' would
                # truncate to 6 significant digits and lose precision)
                pairs = " ".join(
                    f"{i}:{v:.17g}" for i, v in zip(row.indices, row.values)
                )
                fh.write(f"{row.label:.17g} {pairs}\n".rstrip() + "\n")
                n += 1
        return _Committed(out, n)

    def commit(self, messages):
        committed = set()
        for m in messages:
            if m is None:
                continue
            final = m.path[: -len(".inprogress")]
            if os.path.exists(m.path):
                os.replace(m.path, final)
            committed.add(os.path.basename(final))
        # sweep losers: attempts that wrote but weren't committed
        if os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.endswith(".inprogress"):
                    os.remove(os.path.join(self.path, f))
        return None

    def abort(self, messages):
        if os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.endswith(".inprogress"):
                    os.remove(os.path.join(self.path, f))
