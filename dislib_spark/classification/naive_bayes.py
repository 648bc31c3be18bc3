"""Distributed multinomial Naive Bayes over token columns.

The fastText-shaped workhorse of LLM data curation: a cheap linear
text classifier for quality / language / domain gating (e.g. the
CCNet and GPT-3 data filters). No counterpart in the reference
(`dislib/classification` ships CascadeSVM / RF / KNN — dense-feature
models; cited for parity scope: reference `classification/__init__.py`)
— north-star surface.

Spark-first shape:

- **fit** is ONE corpus-sized (class, token) count aggregation
  (map-side combined) plus class-marginal and vocabulary
  re-aggregations of that table — exchange reuse, no second scan.
  The model is a (vocab × classes) log-probability table: a
  DataFrame, not driver state, so a 10^9-token vocabulary never
  leaves the cluster.
- **predict** joins each document's (token, tf) against the model
  table (hash join on the token key — broadcast when the model is
  small), sums ``tf · log P(w|c)`` per (doc, class), adds the class
  log-prior, and takes the argmax with a deterministic class
  tiebreak. Unseen tokens fall back to the per-class smoothing
  floor, matching sklearn's MultinomialNB exactly.

Everything is JVM expression code (split / explode / join / window);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out


class MultinomialNB:
    """Multinomial Naive Bayes with add-``alpha`` (Lidstone)
    smoothing, numerically identical to
    ``sklearn.naive_bayes.MultinomialNB`` on token-count features.

    ``fit`` keeps the model distributed (two small DataFrames);
    ``to_local()`` collects it for broadcast-size models.
    """

    def __init__(self, alpha: float = 1.0) -> None:
        self.alpha = float(alpha)
        self.log_prob_: DataFrame | None = None  # (c, w, logp)
        self.class_stats_: DataFrame | None = None  # (c, log_prior, log_floor)
        # shared (doc, label, token, tf) table when fit() is given an
        # id_col — lets score_documents() on the SAME corpus reuse the
        # one corpus explode instead of re-tokenizing (the oracle's own
        # `tok` CTE feeds wc AND dw; this mirrors it)
        self._dw0: DataFrame | None = None
        self._fit_key: tuple | None = None

    def fit(
        self,
        docs: DataFrame,
        label_col: str = "lang",
        text_col: str = "text",
        id_col: str | None = None,
    ) -> "MultinomialNB":
        if id_col is not None:
            # ONE corpus explode for fit AND same-corpus scoring: the
            # (doc, label, token) count table is the only corpus-sized
            # aggregation; (class, token) counts are an exact integer
            # re-aggregation of it (sum of per-doc counts = the direct
            # count). Lazy checkpoint: consumers (wc chain, dw join,
            # doc_len) read one materialization, computed inside the
            # first action; local mode's block-store locking computes
            # each partition once even under concurrent AQE stages.
            dw0 = (
                fan_out(docs)
                .select(
                    F.col(id_col).alias("_id"),
                    F.col(label_col).alias("_lbl"),
                    F.explode(F.split(F.col(text_col), " ")).alias("w"),
                )
                .where(F.col("w") != "")
                .groupBy("_id", "_lbl", "w")
                .agg(F.count(F.lit(1)).alias("tf"))
                .localCheckpoint(eager=False)
            )
            self._dw0 = dw0
            self._fit_key = (docs, label_col, text_col, id_col)
            wc = dw0.groupBy(F.col("_lbl").alias("c"), "w").agg(
                F.sum("tf").alias("n_wc")
            )
        else:
            toks = (
                fan_out(docs)
                .select(
                    F.col(label_col).alias("c"),
                    F.explode(F.split(F.col(text_col), " ")).alias("w"),
                )
                .where(F.col("w") != "")
            )
            # the one corpus-sized aggregation
            wc = toks.groupBy("c", "w").agg(
                F.count(F.lit(1)).alias("n_wc")
            )
        wc = wc.localCheckpoint(eager=False)  # 3 consumers below
        c_tok = wc.groupBy("c").agg(F.sum("n_wc").alias("n_c"))
        # vocabulary size and doc total stay LAZY 1-row broadcasts
        # (scalar columns) instead of driver count() actions: two
        # fewer blocking jobs per fit, and the same IEEE arithmetic —
        # long/long and double·long column ops reproduce the literal
        # form bit-for-bit.
        vdf = F.broadcast(wc.agg(F.countDistinct("w").alias("_v")))
        # total docs = window sum over the per-class doc counts: one
        # docs scan serves prior numerator AND denominator (long sum,
        # then the same long/double division as a separate count())
        from pyspark.sql import Window

        n_docs_per_c = (
            docs.groupBy(F.col(label_col).alias("c"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .withColumn(
                "_total_docs",
                F.sum("n_docs").over(Window.partitionBy()),
            )
        )
        a = self.alpha
        denom = F.col("n_c") + F.lit(a) * F.col("_v")
        self.class_stats_ = (
            n_docs_per_c.join(c_tok, "c")
            .crossJoin(vdf)
            .select(
                "c",
                F.log(
                    F.col("n_docs")
                    / F.col("_total_docs").cast("double")
                ).alias("log_prior"),
                # log P(unseen token | c) — the smoothing floor
                F.log(F.lit(a) / denom).alias("log_floor"),
            )
        )
        self.log_prob_ = (
            wc.join(c_tok, "c")
            .crossJoin(vdf)
            .select(
                "c",
                "w",
                F.log((F.col("n_wc") + a) / denom).alias("logp"),
            )
        )
        return self

    def score_documents(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(id, c, joint) — per-document joint log-likelihood for
        every class: ``log P(c) + Σ_w tf(w) · log P(w|c)`` with
        unseen-token floor. The per-(doc, word) tf pre-aggregation
        bounds stopword fan-in before the model join."""
        if self.log_prob_ is None or self.class_stats_ is None:
            raise RuntimeError("fit before score_documents")
        fk = self._fit_key
        label_out: list = []
        if (
            fk is not None
            and fk[0] is docs
            and fk[2] == text_col
            and fk[3] == id_col
        ):
            # same corpus as fit: reuse the checkpointed token table
            # (no second explode) and expose the true label column —
            # grouping doc_len by (_id, _lbl) is the same partition of
            # rows (_lbl is functionally dependent on _id), the label
            # just rides along.
            dw = self._dw0.select("_id", "w", "tf")
            doc_len = self._dw0.groupBy("_id", "_lbl").agg(
                F.sum("tf").alias("dl")
            )
            label_out = [F.col("_lbl").alias(fk[1])]
        else:
            dw = (
                fan_out(docs)
                .select(
                    F.col(id_col).alias("_id"),
                    F.explode(F.split(F.col(text_col), " ")).alias("w"),
                )
                .where(F.col("w") != "")
                .groupBy("_id", "w")
                .agg(F.count(F.lit(1)).alias("tf"))
            )
            doc_len = dw.groupBy("_id").agg(F.sum("tf").alias("dl"))
        # per (doc, class): sum of tf·logp over tokens the class KNOWS
        seen = (
            dw.join(self.log_prob_, "w")
            .groupBy("_id", "c")
            .agg(
                F.sum(F.col("tf") * F.col("logp")).alias("s_seen"),
                F.sum("tf").alias("n_seen"),
            )
        )
        # unseen mass: (dl - n_seen) tokens at the class floor. The
        # class-stats table is |C| rows — broadcast; crossJoin gives
        # every (doc, class) cell even when a doc shares no token
        # with a class.
        cells = doc_len.crossJoin(F.broadcast(self.class_stats_))
        return (
            cells.join(seen, ["_id", "c"], "left")
            .select(
                F.col("_id").alias(id_col),
                "c",
                (
                    F.col("log_prior")
                    + F.coalesce(F.col("s_seen"), F.lit(0.0))
                    + (F.col("dl") - F.coalesce(F.col("n_seen"), F.lit(0)))
                    * F.col("log_floor")
                ).alias("joint"),
                *label_out,
            )
        )

    def predict(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(id, pred) — argmax-joint class per document, ties broken
        by class value (deterministic)."""
        from pyspark.sql import Window

        scored = self.score_documents(docs, id_col, text_col)
        w = Window.partitionBy(id_col).orderBy(F.desc("joint"), "c")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(id_col, F.col("c").alias("pred"))
        )
