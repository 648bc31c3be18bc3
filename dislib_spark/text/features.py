"""Token-level feature selection: mutual information against a label.

The classifier-prep step of a curation pipeline (e.g. picking the
vocabulary for a fastText-style quality/language classifier): score
every token by its mutual information with a document label and keep
the top-k. Published technique (standard MI feature selection);
no counterpart in the reference — north-star LLM-pipeline surface.

All counts, one pass: token instances → (word, label) contingency
counts in a single map-side-combined aggregation; the marginals
derive from the same table (grouping-sets-style re-aggregation, no
second corpus scan). MI is then pure JVM log arithmetic on counts:

    MI(w) = Σ_c  p(w', c) · ln( p(w', c) / (p(w')·p(c)) )

summed over the 2×|C| cells (w present / absent × class), using the
instance-level unigram event model: draw one token position from the
corpus; w' = 1 iff it is w, c = its document's label.

Scale: contingency table is vocab × |C| rows (≪ corpus); marginals
are |C| + vocab rows; the only corpus-sized work is the first count.
The class-marginal table (|C| rows) broadcasts onto the contingency
join, so after the first aggregation everything is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out


def token_label_mi(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(token, n, mi) — instance-level mutual information of each
    token with ``label_col``, natural log. ``min_count`` drops rare
    tokens (their MI estimate is noise at any scale)."""
    toks = (
        fan_out(docs)
        .select(
            F.col(label_col).alias("c"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    # one corpus-sized aggregation; everything below is vocab-sized
    wc = toks.groupBy("w", "c").agg(F.count(F.lit(1)).alias("n_wc"))
    w_marg = wc.groupBy("w").agg(F.sum("n_wc").alias("n_w"))
    c_marg = wc.groupBy("c").agg(F.sum("n_wc").alias("n_c"))
    total = wc.agg(F.sum("n_wc").alias("n")).select(
        F.col("n").cast("double").alias("_n")
    )
    # densify: a token absent in some class contributes a 0-count
    # cell, and the absent-token event (w'=0) pairs with every class.
    full = (
        w_marg.where(F.col("n_w") >= min_count)
        .crossJoin(F.broadcast(c_marg))
        .join(wc, ["w", "c"], "left")
        .na.fill({"n_wc": 0})
        .crossJoin(F.broadcast(total))
    )
    n_wc = F.col("n_wc").cast("double")
    n_w = F.col("n_w").cast("double")
    n_c = F.col("n_c").cast("double")
    n = F.col("_n")
    # present-cell and absent-cell contributions for this (w, c)
    pres = F.when(
        F.col("n_wc") > 0,
        (n_wc / n) * F.log((n_wc * n) / (n_w * n_c)),
    ).otherwise(F.lit(0.0))
    n_abs = n_c - n_wc  # tokens of class c that are NOT w
    absent = F.when(
        n_abs > 0,
        (n_abs / n) * F.log((n_abs * n) / ((n - n_w) * n_c)),
    ).otherwise(F.lit(0.0))
    return (
        full.select("w", "n_w", (pres + absent).alias("cell"))
        .groupBy("w", "n_w")
        .agg(F.sum("cell").alias("mi"))
        .select(
            F.col("w").alias("token"),
            F.col("n_w").alias("n"),
            F.col("mi"),
        )
    )


def source_kl_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(group, n_tokens, kl) — KL divergence of each group's unigram
    token distribution from the whole-corpus distribution:
    ``KL(P_g ‖ P) = Σ_w p_g(w) · ln(p_g(w) / p(w))``. The
    distribution-drift signal for spotting a source whose language
    usage diverges from the corpus (scrapes gone wrong, template
    spam, language mix shift).

    Every group's support is a subset of the corpus support, so the
    log is always finite. One corpus-sized (group, word) count; the
    corpus marginal re-aggregates from it (exchange reuse), and the
    per-group totals (|groups| rows) broadcast back.
    """
    gw = (
        fan_out(docs)
        .select(
            F.col(group_col).alias("g"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).alias("n_gw"))
    )
    w_marg = gw.groupBy("w").agg(F.sum("n_gw").alias("n_w"))
    g_marg = gw.groupBy("g").agg(F.sum("n_gw").alias("n_g"))
    total = w_marg.agg(F.sum("n_w").alias("n")).select(
        F.col("n").cast("double").alias("_n")
    )
    joined = (
        gw.join(w_marg, "w")
        .join(F.broadcast(g_marg), "g")
        .crossJoin(F.broadcast(total))
    )
    p_g = F.col("n_gw") / F.col("n_g")
    p = F.col("n_w") / F.col("_n")
    return (
        joined.select("g", "n_g", (p_g * F.log(p_g / p)).alias("term"))
        .groupBy("g", "n_g")
        .agg(F.sum("term").alias("kl"))
        .select(
            F.col("g").alias(group_col),
            F.col("n_g").alias("n_tokens"),
            "kl",
        )
    )


def dsir_importance(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """(doc_id, n_tokens, weight) — DSIR-style per-document importance
    log-ratio: the mean over token instances of
    ``ln p_target(w) - ln p_raw(w)``, with add-``alpha`` smoothing
    over the raw vocabulary. Documents scoring > 0 look more like the
    target distribution than the raw corpus — the selection signal of
    Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023; the published method hashes n-grams into buckets, which is
    the scale lever when the vocabulary itself gets too wide — word
    unigrams here keep the weights interpretable/oracle-replayable).

    ``target_pred`` is a boolean Column over ``docs`` rows (e.g.
    ``F.col("lang") == "en"``) describing the high-quality target
    subset. Shape: ONE corpus-sized (word, in-target) count builds
    both distributions (no second scan, no join against a target-id
    list); per-(doc, word) tf pre-aggregation bounds the stopword
    hot-key fan-in of the weight join (same lever as the bigram LM);
    the three scalar totals broadcast.
    """
    toks = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("_id"),
            target_pred.cast("int").alias("_t"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    # one corpus-sized aggregation → per-(doc, word) tf with the
    # target flag carried (a doc is wholly in or out of the target)
    dw = toks.groupBy("_id", "_t", "w").agg(F.count(F.lit(1)).alias("tf"))
    vocab = dw.groupBy("w").agg(
        F.sum("tf").alias("n_raw"),
        F.sum(F.col("tf") * F.col("_t")).alias("n_tgt"),
    )
    totals = vocab.agg(
        F.sum("n_raw").cast("double").alias("_nr"),
        F.sum("n_tgt").cast("double").alias("_nt"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    a = F.lit(float(alpha))
    scored = vocab.crossJoin(F.broadcast(totals)).select(
        "w",
        (
            F.log((F.col("n_tgt") + a) / (F.col("_nt") + a * F.col("_v")))
            - F.log((F.col("n_raw") + a) / (F.col("_nr") + a * F.col("_v")))
        ).alias("lw"),
    )
    return (
        dw.join(scored, "w")
        .groupBy("_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum(F.col("tf") * F.col("lw")) / F.sum("tf")).alias("weight"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "weight",
        )
    )


def token_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, entropy) — Shannon entropy (nats) of each
    document's own unigram distribution:
    ``H = ln(n) − (Σ_w c_w·ln c_w)/n``. The token-diversity quality
    signal: boilerplate/template text scores low, natural text tracks
    its vocabulary breadth. Complements the Gopher repetition ratios
    (t11) with a single scalar.

    One corpus-sized (doc, word) count; the entropy is algebra over
    that table — same shuffle budget as any per-doc token statistic.
    """
    dw = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        dw.groupBy("_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("clogc"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n").cast("long").alias("n_tokens"),
            (F.log(F.col("n")) - F.col("clogc") / F.col("n")).alias(
                "entropy"
            ),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Adjacent-bigram collocation mining by pointwise mutual
    information — the phrase-detection step of embedding/tokenizer
    prep (word2vec phrases, Mikolov et al. 2013):

        PMI(w1, w2) = ln( n12 · N / (n1⁺ · n2⁻) )

    with n1⁺ = count of w1 as a LEFT bigram member, n2⁻ = count of w2
    as a RIGHT member, N = total bigram instances — the standard
    contingency marginals of the bigram event table, so PMI is exact
    (Σ cells = N by construction, no end-of-document edge slop).

    Scale: one corpus-sized explode → bigram count (map-side
    combined); both marginals re-aggregate the vocab²-bounded bigram
    table, and the final joins are vocab-sized. ``min_count`` prunes
    the hapax tail before the joins — at 100 TB that's the lever that
    keeps the collocation table dimension-sized.

    Returns (w1, w2, n12, pmi) for bigrams with n12 >= min_count.
    """
    toks = fan_out(docs).select(
        F.split(F.col(text_col), " ").alias("t")
    )
    big = toks.select(
        F.explode(
            F.expr("transform(sequence(1, greatest(size(t) - 1, 0)), s -> struct(t[s-1] AS w1, t[s] AS w2))")
        ).alias("b")
    ).select("b.w1", "b.w2").where((F.col("w1") != "") & (F.col("w2") != ""))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    left_m = bc.groupBy("w1").agg(F.sum("n12").alias("n1"))
    right_m = bc.groupBy("w2").agg(F.sum("n12").alias("n2"))
    total = bc.agg(F.sum("n12").cast("double").alias("_n"))
    return (
        bc.where(F.col("n12") >= min_count)
        .join(left_m, "w1")
        .join(right_m, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n12",
            F.round(
                F.log(
                    F.col("n12").cast("double")
                    * F.col("_n")
                    / (F.col("n1").cast("double") * F.col("n2").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 10,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate per group for a fixed top-k vocabulary
    — the tokenizer-coverage check run before committing a vocab to
    a training run (which sources will fragment into unknowns?).

    Vocabulary = the ``vocab_size`` most frequent corpus tokens
    (count desc, token asc tiebreak — deterministic at any
    partitioning). One corpus-sized (group, token) count; the vocab
    derives from re-aggregating that table and broadcasts back onto
    it, so after the first aggregation everything is vocab/group-
    sized. Returns (group, n_tokens, n_oov, oov_rate).
    """
    from pyspark.sql import Window

    gw = (
        fan_out(docs)
        .select(
            F.col(group_col).alias("g"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wc = gw.groupBy("w").agg(F.sum("n").alias("cw"))
    # top-vocab_size via TakeOrderedAndProject (per-partition heap +
    # k-row merge) — a global row_number Window here would pull the
    # whole distinct-word table through one partition, unbounded at
    # corpus scale; only MEMBERSHIP is needed, not the rank value
    vocab = (
        wc.orderBy(F.desc("cw"), "w")
        .limit(vocab_size)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        gw.join(F.broadcast(vocab), "w", "left")
        .groupBy("g")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(0)).alias("n_oov"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_ngrams, novelty) — the fraction of a document's
    distinct word n-grams whose FIRST corpus appearance (minimum
    doc_id) is this document. The dedup-aware contribution score used
    to order crawl batches: near-duplicates and boilerplate-heavy
    pages score ~0, genuinely new text ~1 (the per-doc complement of
    the corpus-level dedup ops in text/dedup.py).

    Scale: one exploded distinct (doc, ngram) table, ONE grouped min
    for the first-seen owner, and an equi-join back on the ngram key
    — both sides hash-partition on the same key, so the join is
    co-shuffled, never broadcast-sized. Docs with fewer than ``n``
    tokens have no n-grams and drop out (they carry no novelty
    evidence).
    """
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda w: w != F.lit("")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("t", i + j) for j in range(n)]
        ),
    )
    pairs = (
        fan_out(docs)
        .select(F.col(id_col).alias("_id"), toks.alias("t"))
        .where(F.size("t") >= n)
        .select("_id", F.explode(F.array_distinct(grams)).alias("g"))
    )
    first = pairs.groupBy("g").agg(F.min("_id").alias("first_id"))
    return (
        pairs.join(first, "g")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                (F.col("_id") == F.col("first_id")).cast("long")
            ).alias("novel"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            (F.col("novel") / F.col("n_ngrams")).alias("novelty"),
        )
    )


def term_burstiness(
    docs: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, total, df, vmr) for the ``top_k`` highest-frequency
    terms: the variance-to-mean ratio of the term's per-document
    count across the WHOLE corpus (zero-count documents included —
    Church & Gale burstiness). VMR ≈ 1 is Poisson scatter (function
    words); VMR ≫ 1 means the term clumps into few documents
    (topical/template terms) — the signal behind stopword lists and
    template detection.

    Zeros are never materialized: with N docs, C = Σc, S = Σc², the
    population variance is S/N − (C/N)² — so one corpus-sized
    (doc, term) count collapses to per-term (C, S, df) scalars and
    the N-doc total rides in on a 1-row broadcast. Exact integer
    sums make the replay exact; output is TopK (orderBy+limit, never
    a global row_number window).
    """
    dw = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_term = dw.groupBy("w").agg(
        F.sum("c").alias("ct"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.count(F.lit(1)).alias("df"),
    )
    ndocs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("nd")))
    mean = F.col("ct") / F.col("nd")
    var = F.col("s2") / F.col("nd") - mean * mean
    return (
        per_term.crossJoin(ndocs)
        .select(
            F.col("w").alias("term"),
            F.col("ct").cast("long").alias("total"),
            F.col("df").cast("long").alias("df"),
            F.round(var / mean, 6).alias("vmr"),
        )
        .orderBy(F.desc("total"), "term")
        .limit(top_k)
    )


def lexical_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
) -> DataFrame:
    """Per-document lexical-diversity profile: type-token ratio and
    hapax-legomena share — the cheap vocabulary-richness signals that
    separate boilerplate/template pages (low TTR) and keyword-stuffed
    spam (hapax-heavy) from prose before any model-based scoring.

    One explode → per-(doc, token) count → per-doc aggregate; every
    stage is keyed on doc_id so the whole thing is one co-shuffled
    chain with map-side combine, linear at any corpus size. All
    ratios are divisions of exact integer counts.

    Returns (doc_id, n_tokens, n_types, n_hapax, ttr, hapax_ratio).
    """
    tok = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per = tok.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("tf") == 1).cast("long")).alias("n_hapax"),
    )
    return per.where(F.col("n_tokens") >= int(min_tokens)).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("n_hapax").cast("bigint").alias("n_hapax"),
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(F.col("n_hapax") / F.col("n_types"), 6).alias(
            "hapax_ratio"
        ),
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 512,
) -> DataFrame:
    """Per-document character-level Shannon entropy over the first
    ``prefix_len`` characters — the compression-ratio proxy that
    catches gibberish (entropy too high) and repeated-character /
    template junk (too low) without tokenizing. The per-doc sibling
    of :func:`token_entropy`'s corpus-level statistic.

    The prefix cap bounds the explode at ``prefix_len`` rows per doc
    (deterministic, and the standard trick for cheap per-doc signals
    at corpus scale); per-(doc, char) counts co-shuffle on doc_id.
    H = −Σ (c/n)·ln(c/n) sums ≤ |alphabet| IEEE-exact-ratio terms, so
    1-ulp LN drift sits ten orders under the 6-dp rounding.

    Returns (doc_id, n_chars_used, n_distinct, entropy).
    """
    ch = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(
                    F.substring(F.col(text_col), 1, int(prefix_len)),
                    "",
                )
            ).alias("c"),
        )
        .where(F.col("c") != "")
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = ch.groupBy("doc_id").agg(
        F.sum("n").alias("nt"), F.count(F.lit(1)).alias("nd")
    )
    p = F.col("n") / F.col("nt")
    return (
        ch.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("nt").cast("bigint").alias("n_chars_used"),
            F.max("nd").cast("bigint").alias("n_distinct"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )
