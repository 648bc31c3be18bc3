"""Corpus language-model scoring + tokenizer-induction kernels.

Two training-data curation operators the big-pipeline stacks run at
scale (both public techniques: CCNet-style LM quality filtering,
Sennrich et al. BPE vocabulary induction):

- :func:`lm_doc_scores` — self-trained unigram LM perplexity proxy:
  token log-probabilities from the corpus' own unigram distribution,
  averaged per document. Low scores flag gibberish / OOV-heavy docs;
  the distributional shape is what CCNet buckets on (head/middle/
  tail). Pure DataFrame ops: one explode → count aggregation for the
  LM, one join back on token for scoring.
- :func:`bpe_pair_counts` — ONE iteration of byte-pair-encoding merge
  counting at word level: frequency-weighted counts of adjacent
  character pairs across the corpus vocabulary. The argmax pair is
  the next BPE merge; iterating this (driver loop over a shrinking
  vocab) trains a tokenizer. Exposed as the single-step kernel
  because that's the distributed-heavy part — the merge loop is
  driver-side orchestration over a vocab-sized (small) table.

Scale notes (100 TB): token explode is linear and partition-local;
the unigram count aggregation is map-side combined (vocab ≪ corpus);
the score join is a plain hash join on token — hot tokens (stopwords)
are exactly the rows AQE skew-split handles. BPE counting runs on
the *distinct-word* table (vocab-sized, not corpus-sized) — the
corpus-sized work is the single word-count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out


def _words(docs: DataFrame, text_col: str, extra: list[str]) -> DataFrame:
    """(extra..., w) — one row per token; single-space split, empty
    tokens dropped (matches the repo-wide oracle tokenization)."""
    return (
        docs.select(*extra, F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
    )


def lm_doc_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean token log-probability under the corpus'
    own unigram LM: score_d = avg over tokens of ln(c(w)/N).

    Returns (id_col, n_tokens, lm_score). More negative = more
    surprising under the corpus distribution.

    Skew design: the token join is pre-aggregated to one row per
    (doc, word) — a stopword occurring s times in a doc is ONE join
    row weighted by s, not s rows — so the hot-key fan-in of the
    token hash join shrinks from Σ tf to Σ distinct-(doc,word)
    (~5-20× on natural text; this was the dominant cost of the 500k
    scale smoke). The unigram counts build from the same pre-agg, so
    Catalyst reuses the exchange instead of re-scanning the corpus.
    """
    dw = (
        _words(fan_out(docs), text_col, [id_col])
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    counts = dw.groupBy("w").agg(F.sum("tf").alias("c"))
    total = counts.agg(F.sum("c").alias("n")).select(
        F.col("n").cast("double").alias("_total")
    )
    scored = (
        dw.join(counts, "w")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            "tf",
            (F.col("tf") * F.log(F.col("c") / F.col("_total"))).alias("wlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        (F.sum("wlp") / F.sum("tf")).alias("lm_score"),
    )


def lm2_doc_scores(
    docs: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram log-probability under an interpolated
    bigram LM self-trained on the corpus:

        p(w2|w1) = lam · c(w1,w2)/c(w1,·)  +  (1-lam) · c(w2)/N

    (bigram MLE linearly interpolated with the corpus unigram — the
    standard fixed-weight Jelinek-Mercer smoothing, so unseen-in-
    context tokens still score finitely). Returns (id_col, n_bigrams,
    lm2_score); more negative = more surprising. The bigram signal
    catches scrambled/boilerplate text that unigram scoring
    (:func:`lm_doc_scores`) cannot.

    Same skew design as the unigram path: everything joins through a
    per-(doc, bigram) pre-aggregation, so hot bigrams are one
    tf-weighted row per doc; the LM tables re-aggregate from it
    (exchange reuse) and the 1-row total broadcasts.
    """
    toks = F.split(F.col(text_col), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    db = (
        fan_out(docs)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
        # Checkpoint barrier: db has three consumers (bc→uc and the
        # scored join) and exchange reuse does not dedupe them here —
        # without it the explode+partial-agg pipeline runs ~3×
        # (measured 8.5 s → 2.5 s at sf0.1). eager=False: one
        # materialization inside the query's own first action.
        .localCheckpoint(eager=False)
    )
    bc = db.groupBy("w1", "w2").agg(F.sum("tf").alias("n12"))
    # context marginal c(w1,·) and unigram counts from the SAME table
    uc = bc.groupBy("w1").agg(F.sum("n12").alias("n1"))
    uni = (
        _words(fan_out(docs), text_col, [])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    total = uni.agg(F.sum("cu").alias("n")).select(
        F.col("n").cast("double").alias("_n")
    )
    prob = (
        F.lit(lam) * (F.col("n12") / F.col("n1"))
        + (1.0 - lam) * (F.col("cu") / F.col("_n"))
    )
    scored = (
        db.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), "tf", (F.col("tf") * F.log(prob)).alias("wlp"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        (F.sum("wlp") / F.sum("tf")).alias("lm2_score"),
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Frequency-weighted adjacent-character-pair counts over the
    corpus vocabulary — one BPE merge-selection step.

    Returns (pair, total) with total = Σ_words freq(word) ×
    occurrences(pair, word), ordered by total DESC then pair. The
    top row is the next BPE merge.
    """
    words = (
        _words(fan_out(docs), text_col, [])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.length("w") >= 2)  # guard: sequence(1,0) is DESCENDING
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    out = (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("total"))
        .orderBy(F.desc("total"), "pair")
    )
    return out.limit(top_k) if top_k else out


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE merge list to every document: greedy
    in-order merge application per word (the standard BPE encode).
    Returns (id_col, n_subtokens, n_words).

    Tokenizer application is inherently procedural (each merge
    rewrites the symbol sequence the next merge sees), so this is the
    Arrow path, not an expression tree: ``mapInPandas`` with the
    merge table broadcast in the closure — one Python invocation per
    Arrow batch, embarrassingly parallel, no shuffle. At 100 TB this
    is exactly how HF-tokenizer jobs run on Spark; swap the inner
    loop for a native tokenizer library when one is available.
    """
    merge_list = [(a, b) for a, b in merges]
    if any(
        not (isinstance(a, str) and isinstance(b, str))
        for a, b in merge_list
    ):
        raise TypeError(
            "merges must be (str, str) pairs — use "
            "bpe_train(..., return_pairs=True); the default "
            "(merged, count) form would silently apply zero merges"
        )

    def encode_word(w: str) -> int:
        syms = list(w)
        for a, b in merge_list:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    def run(batches):
        for pdf in batches:
            n_sub, n_words = [], []
            for text in pdf[text_col]:
                words = [w for w in text.split(" ") if w]
                n_words.append(len(words))
                n_sub.append(sum(encode_word(w) for w in words))
            yield pdf[[id_col]].assign(
                n_subtokens=n_sub, n_words=n_words
            )

    # fan_out: an under-split scan would serialize the whole Python
    # encode on one worker (per-row output is independent of
    # partitioning; no-op at real scale)
    from dislib_spark.utils.base import fan_out

    return fan_out(docs.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} long, n_subtokens long, n_words long"
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    return_pairs: bool = False,
) -> list:
    """Driver-orchestrated BPE merge loop (toy scale): repeatedly pick
    the argmax pair and re-segment the vocab. The vocab table is
    collected once (vocab ≪ corpus — the distributed step is the word
    count); merges then run locally like any tokenizer trainer."""
    rows = (
        _words(docs, text_col, [])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    vocab = {tuple(r["w"]): r["freq"] for r in rows}
    merges: list[tuple[str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((a, b) if return_pairs else (a + b, c))
        merged = a + b
        new_vocab: dict[tuple, int] = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges
