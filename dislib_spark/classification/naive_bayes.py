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

    def fit(
        self,
        docs: DataFrame,
        label_col: str = "lang",
        text_col: str = "text",
    ) -> "MultinomialNB":
        toks = (
            fan_out(docs)
            .select(
                F.col(label_col).alias("c"),
                F.explode(F.split(F.col(text_col), " ")).alias("w"),
            )
            .where(F.col("w") != "")
        )
        # the one corpus-sized aggregation
        wc = toks.groupBy("c", "w").agg(F.count(F.lit(1)).alias("n_wc"))
        wc = wc.localCheckpoint(eager=True)  # 3 consumers below
        c_tok = wc.groupBy("c").agg(F.sum("n_wc").alias("n_c"))
        # vocabulary size and doc total stay LAZY 1-row broadcasts
        # (scalar columns) instead of driver count() actions: two
        # fewer blocking jobs per fit, and the same IEEE arithmetic —
        # long/long and double·long column ops reproduce the literal
        # form bit-for-bit.
        vdf = F.broadcast(wc.agg(F.countDistinct("w").alias("_v")))
        tdf = F.broadcast(
            docs.agg(F.count(F.lit(1)).alias("_total_docs"))
        )
        n_docs_per_c = (
            docs.groupBy(F.col(label_col).alias("c"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        a = self.alpha
        denom = F.col("n_c") + F.lit(a) * F.col("_v")
        self.class_stats_ = (
            n_docs_per_c.join(c_tok, "c")
            .crossJoin(vdf)
            .crossJoin(tdf)
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
