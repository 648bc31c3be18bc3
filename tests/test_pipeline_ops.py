"""Training-pipeline operator tests: deterministic hash sampling /
splitting and benchmark-contamination detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.packing import pack_sequences, packing_stats
from dislib_spark.sampling import (
    hash_bucket,
    hash_split,
    stratified_hash_sample,
    weighted_mix,
)
from dislib_spark.tables import load_table
from dislib_spark.text.contamination import contamination_check, word_ngrams
from dislib_spark.text.repetition import (
    repetition_filter,
    with_repetition_features,
)
from tests.conftest import SF_SMOKE


def test_hash_bucket_stable_and_uniformish(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    b1 = d.select(hash_bucket(F.col("doc_id")).alias("b"))
    # deterministic across layouts: repartition must not change buckets
    b2 = d.repartition(7).select(hash_bucket(F.col("doc_id")).alias("b"))
    assert sorted(r.b for r in b1.collect()) == sorted(
        r.b for r in b2.collect()
    )
    n = d.count()
    hit = b1.where(F.col("b") < 50).count()
    assert 0.35 * n < hit < 0.65 * n  # roughly half at rate 0.5


def test_hash_split_disjoint_covering(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    train, val, test = hash_split(d, "doc_id", [0.8, 0.1, 0.1])
    n = d.count()
    nt, nv, ns = train.count(), val.count(), test.count()
    assert nt + nv + ns == n  # covering + disjoint by bucket ranges
    assert nt > nv and nt > ns
    # stability: same membership on a rerun
    assert train.count() == hash_split(d, "doc_id", [0.8, 0.1, 0.1])[0].count()


def test_stratified_rates(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    s = stratified_hash_sample(
        d, "lang", {"en": 1.0, "de": 0.0}, key_col="doc_id",
        default_rate=0.0,
    )
    got = {r.lang for r in s.select("lang").distinct().collect()}
    assert got == {"en"}  # rate 1.0 keeps all, 0.0/default drop all
    n_en = d.where(F.col("lang") == "en").count()
    assert s.count() == n_en


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("a b c",), ("a b c d",)], "text string")
    out = df.select(F.size(word_ngrams(F.col("text"), 4)).alias("k")).collect()
    assert sorted(r.k for r in out) == [0, 1]


def test_repetition_features_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # g2: ab,ba,ab,ba,ab -> top2 3/5
            (2, "p q r s t u"),  # all distinct
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in with_repetition_features(df).collect()
    }
    # doc1 3-grams: aba,bab,aba,bab -> 2 distinct of 4 -> dup 0.5
    assert rows[1].dup3_frac == 0.5
    assert rows[1].top2_share == 0.6
    assert rows[2].dup3_frac == 0.0
    assert rows[2].top2_share == 0.2  # 5 distinct 2-grams, max count 1
    kept = repetition_filter(df, max_dup3_frac=0.3, max_top2_share=0.5)
    assert [r.doc_id for r in kept.collect()] == [2]


def test_pack_sequences_offsets_and_stats(spark):
    df = spark.createDataFrame(
        [(i, "s", 300) for i in range(6)],
        "doc_id long, src string, n long",
    )
    packed = pack_sequences(df, "n", budget=512, order_col="doc_id",
                            shard_col="src")
    got = {r.doc_id: (r.tok_offset, r.seq_id) for r in packed.collect()}
    # offsets 0,300,...,1500; seq = offset // 512
    assert got == {i: (300 * i, (300 * i) // 512) for i in range(6)}
    stats = {
        r.seq_id: (r.n_docs, r.seq_tokens)
        for r in packing_stats(packed, "n", 512, "src").collect()
    }
    assert sum(n for n, _ in stats.values()) == 6
    assert sum(t for _, t in stats.values()) == 1800
    # stability across layouts
    re = pack_sequences(
        df.repartition(5), "n", budget=512, order_col="doc_id",
        shard_col="src",
    )
    assert {r.doc_id: (r.tok_offset, r.seq_id) for r in re.collect()} == got


def test_weighted_mix_multiplicities(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    mixed = weighted_mix(
        d, "lang", {"en": 2.0, "de": 0.0}, key_col="doc_id",
        default_weight=1.0,
    )
    n_en = d.where(F.col("lang") == "en").count()
    assert mixed.where(F.col("lang") == "en").count() == 2 * n_en
    assert mixed.where(F.col("lang") == "de").count() == 0
    others = d.where(~F.col("lang").isin("en", "de")).count()
    assert mixed.where(~F.col("lang").isin("en", "de")).count() == others
    # fractional weight: expected ~1.5x, deterministic on rerun
    frac = weighted_mix(d, "lang", {"en": 1.5}, key_col="doc_id")
    c1 = frac.where(F.col("lang") == "en").count()
    assert n_en < c1 < 2 * n_en
    c2 = weighted_mix(d.repartition(9), "lang", {"en": 1.5},
                      key_col="doc_id")
    assert c2.where(F.col("lang") == "en").count() == c1


def test_contamination_exact_small(spark):
    corpus = spark.createDataFrame(
        [
            (1, "w x y z a b"),  # shares 'w x y z' with bench
            (2, "p q r s t"),  # no overlap
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "m n w x y z")], "doc_id long, text string"
    )
    hits = contamination_check(corpus, bench, n=4).collect()
    assert len(hits) == 1
    row = hits[0]
    assert row.doc_id == 1 and row.n_shared == 1 and row.n_grams == 3


def test_connected_components_exact(spark):
    # two components {1,2,3,4} (chain) and {10,11}; 4-1 via 2-4 edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4), (10, 11)], "a_id long, b_id long"
    )
    from dislib_spark.graph import connected_components

    cc = {
        r.node: r.component
        for r in connected_components(edges).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_canonical_keeps_min_and_singletons(spark):
    from dislib_spark.graph import dedup_canonical

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 7, 10, 11)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a_id long, b_id long"
    )
    kept = sorted(
        r.doc_id for r in dedup_canonical(df, pairs).collect()
    )
    # clusters {1,2,3}->1, {10,11}->10; 7 untouched
    assert kept == [1, 7, 10]


def test_connected_components_chain_converges(spark):
    # a 12-node chain needs several propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a_id long, b_id long"
    )
    from dislib_spark.graph import connected_components

    cc = connected_components(edges)
    assert cc.select("component").distinct().count() == 1
    assert cc.agg(F.min("component")).first()[0] == 0


def test_random_projection_preserves_norms(spark):
    import numpy as np

    from dislib_spark.vector.projection import (
        project,
        projection_planes,
        random_project,
    )

    d = load_table(spark, SF_SMOKE, "embeddings")
    p = random_project(d, "embedding", out_dim=16, seed=3)
    row = p.select("vec_id", "embedding", "proj").first()
    # parity vs numpy on one vector
    planes = np.array(projection_planes(len(row.embedding), 16, seed=3))
    expect = planes @ np.array(row.embedding, dtype=np.float64)
    assert np.allclose(np.array(row.proj), expect, atol=1e-9)
    # JL: average norm ratio near 1 at out_dim=16
    ratios = p.select(
        (
            F.sqrt(F.aggregate(F.col("proj"), F.lit(0.0),
                               lambda a, x: a + x * x))
            / F.sqrt(F.aggregate(
                F.col("embedding"), F.lit(0.0),
                lambda a, x: a + x.cast("double") * x))
        ).alias("r")
    ).agg(F.avg("r")).first()[0]
    assert 0.8 < ratios < 1.2


def test_tfidf_exact_toy(spark):
    import math

    from dislib_spark.text.tfidf import bm25_scores, tfidf_topk

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "y z"), (3, "z z z")],
        "doc_id long, text string",
    )
    top = {
        (r.doc_id, r.rank): (r.term, r.score)
        for r in tfidf_topk(df, k=1).collect()
    }
    # doc1: x appears twice, df(x)=1 -> idf = ln(4/2)+1; score = 2*that
    expect = round(2 * (math.log(4 / 2) + 1), 6)
    assert top[(1, 1)] == ("x", expect)
    # doc3's top term is z (tf 3)
    assert top[(3, 1)][0] == "z"
    # BM25: doc with more matches scores higher than doc with fewer
    b = {r.doc_id: r.bm25 for r in bm25_scores(df, ["z"]).collect()}
    assert set(b) == {2, 3} and b[3] > b[2]


def test_winnow_matches_python(spark):
    """Winnowed fingerprint sets equal a pure-python reference
    (normalize -> md5 char-8-grams -> window-4 minima -> distinct)."""
    import hashlib
    import re

    from dislib_spark.text.winnow import with_fingerprints

    texts = [
        (1, "The quick brown fox jumps over the lazy dog!"),
        (2, "the  QUICK brown fox jumps over a sleepy dog"),
        (3, "short"),
        (4, ""),
        (5, "aaaaaaaaaaaaaaaaaaaa"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: sorted(r.fingerprints)
        for r in with_fingerprints(df).collect()
    }

    def py_winnow(text, k=8, w=4):
        norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
        grams = [
            hashlib.md5(norm[i : i + k].encode()).hexdigest()
            for i in range(len(norm) - k + 1)
        ]
        if not grams:
            return []
        n_win = max(len(grams) - w + 1, 1)
        return sorted({min(grams[j : j + w]) for j in range(n_win)})

    for doc_id, text in texts:
        assert got[doc_id] == py_winnow(text), doc_id
    # near-identical docs share most fingerprints; disjoint docs none
    s1, s2 = set(got[1]), set(got[2])
    assert len(s1 & s2) > 0


def test_winnow_overlap_pairs(spark):
    from dislib_spark.text.winnow import fingerprint_overlap_pairs

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely different content with nothing shared whatsoever"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.a_id, r.b_id): r.n_shared
        for r in fingerprint_overlap_pairs(df, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_pii_redaction_matches_python(spark):
    """Masking + counts equal python re on strings covering every
    pattern, overlap order (email before digit run), and clean text."""
    import re

    from dislib_spark.text.pii import PII_PATTERNS, with_pii_stats

    rows = [
        (1, "contact john.doe+spam@example.org or 12345678 now"),
        (2, "server at 10.0.255.3 port open"),
        (3, "call +1 555-123 4567 today"),
        (4, "clean text with small numbers 123 45"),
        (5, "9876543@numbers.example.com is an email not an id"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    kinds = ("email", "ipv4", "phone", "id_digits")
    got = {r.id: r for r in with_pii_stats(df, kinds=kinds).collect()}

    for rid, text in rows:
        masked = text
        for kind in PII_PATTERNS:
            if kind in kinds:
                masked = re.sub(PII_PATTERNS[kind], "[PII]", masked)
        assert got[rid].redacted == masked, (rid, got[rid].redacted, masked)
        for kind in kinds:
            expect = len(re.findall(PII_PATTERNS[kind], text))
            assert got[rid][f"n_{kind}"] == expect, (rid, kind)
    # the email local-part digits were masked as email, not id
    assert got[5].redacted == "[PII] is an email not an id"


def test_pagerank_matches_numpy(spark):
    """Fixed-iteration PageRank equals a dense numpy power iteration
    on an asymmetric toy graph (hub, chain, and a dangling-ish leaf)."""
    import numpy as np

    from dislib_spark.graph import pagerank

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 4), (4, 0), (5, 0)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r.node: r.rank
        for r in pagerank(df, n_iter=10, undirected=True).collect()
    }

    # numpy reference: same undirected fixed-iteration update
    und = set()
    for a, b in edges:
        und.add((a, b)); und.add((b, a))
    n = 6
    deg = np.zeros(n)
    for u, _ in und:
        deg[u] += 1
    r = np.ones(n)
    d = 0.85
    for _ in range(10):
        nxt = np.full(n, 1 - d)
        for u, v in und:
            nxt[v] += d * r[u] / deg[u]
        r = nxt
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    # the hub (node 0) outranks the leaf (node 5)
    assert got[0] > got[5]


def test_fan_out_contract(spark):
    """fan_out repartitions under-split inputs to session parallelism
    and leaves well-split inputs untouched (the 100 TB no-op case)."""
    from dislib_spark.utils.base import fan_out

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 1)
    assert narrow.rdd.getNumPartitions() == 1
    widened = fan_out(narrow)
    assert widened.rdd.getNumPartitions() == par
    assert widened.count() == 1000

    wide = spark.range(0, 1000, 1, par)
    # identical object back — no extra shuffle inserted
    assert fan_out(wide) is wide


def test_temperature_rates_properties(spark):
    """α=0 flattens to equal per-stratum mass; α=1 is the identity
    (rate 1 everywhere when target = corpus size); rates stay in
    (0, 1]; kept counts track n·rate."""
    import math as _math

    from dislib_spark.sampling import sample_by_rates, temperature_rates
    from dislib_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    counts = {
        r.lang: r.cnt
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }

    # alpha=1: p_s = n_s/N, so target*p_s/n_s == 1 → keep everything
    r1 = {r.stratum: r.rate for r in temperature_rates(d, "lang", 1.0).collect()}
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())

    # alpha=0.5: numpy replay of the formula
    r5 = {r.stratum: r.rate for r in temperature_rates(d, "lang", 0.5).collect()}
    tm = sum(_math.sqrt(n) for n in counts.values())
    tn = sum(counts.values())
    for lang, n in counts.items():
        want = min(1.0, tn * (_math.sqrt(n) / tm) / n)
        assert abs(r5[lang] - want) < 1e-9, lang
    assert all(0.0 < v <= 1.0 for v in r5.values())

    # rare strata get boosted relative to head strata
    rare = min(counts, key=counts.get)
    head = max(counts, key=counts.get)
    if counts[rare] < counts[head]:
        assert r5[rare] > r5[head]

    # kept fraction ≈ rate (md5 buckets are near-uniform; threshold
    # is exact so the kept count equals the per-bucket population)
    kept = sample_by_rates(
        d, temperature_rates(d, "lang", 0.5), "lang", "doc_id"
    )
    kn = {
        r.lang: r.cnt
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for lang, n in counts.items():
        frac = kn.get(lang, 0) / n
        assert abs(frac - min(1.0, r5[lang])) < 0.15, lang

    # missing-strata rows are dropped (left join + coalesce(0))
    extra = spark.createDataFrame(
        [(999999, "xx")], "doc_id long, lang string"
    )
    out = sample_by_rates(
        extra, temperature_rates(d, "lang", 0.5), "lang", "doc_id"
    )
    assert out.count() == 0


def test_observation_metrics_match_separate_aggregation(spark):
    """Observation metrics collected during ONE action equal a
    separate aggregation pass — and chained observations report every
    funnel stage from a single terminal action."""
    from dislib_spark.utils.observe import observed

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    gated = d.where(F.col("n_chars") > 200)
    obs_df, obs = observed(
        gated,
        "gate",
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )
    n_rows = obs_df.count()  # the single action
    got = obs.get
    want = gated.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    ).collect()[0]
    assert got["n_kept"] == want.n_kept == n_rows
    assert got["chars_kept"] == want.chars_kept

    # funnel helper: every stage observed by ONE terminal action
    from dislib_spark.utils.observe import funnel_metrics

    final, obs_list = funnel_metrics(
        d,
        [
            ("len_gate", F.col("n_chars") > 200),
            ("lang_gate", F.col("lang") == "en"),
        ],
    )
    final.write.format("noop").mode("overwrite").save()
    counts = [o.get["n"] for o in obs_list]
    assert counts[0] == d.count()
    assert counts[1] == n_rows
    assert counts[2] == d.where(
        (F.col("n_chars") > 200) & (F.col("lang") == "en")
    ).count()
    assert counts[0] >= counts[1] >= counts[2]


def test_weighted_sample_topk_python_parity(spark):
    """The A-ES selection equals the python closed form (same md5
    uniform, same key, same per-group top-k), and heavier weights win
    more slots in expectation (spot-check: the all-heavy group's keys
    dominate)."""
    import hashlib
    import math

    from dislib_spark.sampling import weighted_sample_topk

    rows = [(i, "g" + str(i % 2), float(10 + (i * 37) % 90)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, src string, w double")

    def key(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 1.0) / 2**32
        return round(math.log(u) / w, 12)

    expect = {}
    for g in ("g0", "g1"):
        ks = sorted(
            ((key(i, w), -i) for i, s, w in rows if s == g), reverse=True
        )
        expect[g] = [-i for _, i in ks[:3]]
    got = weighted_sample_topk(df, "w", "id", k=3, by="src").collect()
    for g in ("g0", "g1"):
        picked = [r["id"] for r in sorted(
            (x for x in got if x["src"] == g), key=lambda r: r["rank"]
        )]
        assert picked == expect[g]
    # ungrouped TakeOrdered path
    top = weighted_sample_topk(df, "w", "id", k=4).collect()
    all_keys = sorted(((key(i, w), -i) for i, s, w in rows), reverse=True)
    assert [r["id"] for r in top] == [-i for _, i in all_keys[:4]]


def test_ngram_novelty_hand_computed(spark):
    """Trigram first-seen ownership on a 3-doc toy: the original doc
    scores 1.0, its near-copy scores the unshared fraction, short
    docs (<3 tokens) drop out."""
    from dislib_spark.text.features import ngram_novelty

    rows = [
        (1, "a b c d"),      # trigrams {a b c, b c d} -> both first here
        (2, "a b c x"),      # {a b c (seen), b c x (new)} -> 0.5
        (3, "a b"),          # too short -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_ngrams"], r["novelty"])
        for r in ngram_novelty(df, n=3).collect()
    }
    assert got == {1: (2, 1.0), 2: (2, 0.5)}


def test_term_burstiness_hand_computed(spark):
    """VMR with implicit zeros: hand sufficient-statistics values on a
    3-doc toy corpus (zero-count docs included via N, never
    materialized)."""
    from dislib_spark.text.features import term_burstiness

    rows = [(1, "a a b"), (2, "a c"), (3, "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: (r["total"], r["df"], r["vmr"])
        for r in term_burstiness(df, top_k=10).collect()
    }
    # a: counts (2,1,0): mean 1, var (5/3 - 1) = 2/3 -> vmr 2/3
    assert got["a"] == (3, 2, round(2 / 3, 6))
    # b: counts (1,0,0): mean 1/3, var 2/9 -> vmr 2/3
    assert got["b"] == (1, 1, round(2 / 3, 6))
    # c: counts (0,1,1): mean 2/3, var 2/9 -> vmr 1/3
    assert got["c"] == (2, 2, round(1 / 3, 6))


def test_centroid_medoids_numpy_parity(spark):
    """Top-k most-central members per label match a direct numpy
    cosine-to-centroid ranking on random vectors."""
    import numpy as np

    from dislib_spark.vector.drift import centroid_medoids

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8))
    labels = np.arange(40) % 4
    rows = [
        (int(i), int(labels[i]), [float(x) for x in vecs[i]])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    got = {}
    for r in centroid_medoids(df, k=3).collect():
        got.setdefault(r["label"], []).append(r["vec_id"])

    for lab in range(4):
        sub = vecs[labels == lab]
        ids = np.arange(40)[labels == lab]
        c = sub.mean(axis=0)
        cos = (sub @ c) / (
            np.linalg.norm(sub, axis=1) * np.linalg.norm(c)
        )
        order = sorted(zip(-np.round(cos, 9), ids))
        want = [int(i) for _, i in order[:3]]
        assert got[lab] == want


def test_lexical_diversity_hand_computed(spark):
    from dislib_spark.text.features import lexical_diversity

    df = spark.createDataFrame(
        [
            (1, "a a a b b c d e f g"),  # 10 tok, 7 types, 5 hapax
            (2, "x " * 5),  # below min_tokens
            (3, " ".join(str(i) for i in range(12))),  # all hapax
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in lexical_diversity(df, min_tokens=10).collect()
    }
    assert set(got) == {1, 3}
    assert got[1]["n_tokens"] == 10
    assert got[1]["n_types"] == 7
    assert got[1]["n_hapax"] == 5
    assert abs(got[1]["ttr"] - 0.7) < 1e-9
    assert abs(got[1]["hapax_ratio"] - 5 / 7) < 1e-6
    assert got[3]["ttr"] == 1.0 and got[3]["hapax_ratio"] == 1.0


def test_char_entropy_hand_computed(spark):
    import math as m

    from dislib_spark.text.features import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd" * 200)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert got[1]["entropy"] == 0.0
    assert abs(got[2]["entropy"] - m.log(2)) < 1e-6
    # doc 3: 800 chars but capped at the 512-char prefix
    assert got[3]["n_chars_used"] == 512
    assert abs(got[3]["entropy"] - m.log(4)) < 1e-6


def test_dimension_stats_numpy_parity(spark):
    import numpy as np

    from dislib_spark.vector.drift import dimension_stats

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(300, 5)).astype(np.float32)
    rows = [(i, [float(v) for v in mat[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["dim"]: r for r in dimension_stats(df, "embedding").collect()}

    ref = np.round(mat.astype(np.float64), 7)
    for j in range(5):
        col = ref[:, j]
        assert got[j]["n"] == 300
        assert abs(got[j]["mean"] - col.mean()) < 1e-5
        assert abs(got[j]["variance"] - col.var()) < 1e-5
        assert abs(got[j]["min_v"] - col.min()) < 1e-7
        assert abs(got[j]["max_v"] - col.max()) < 1e-7


def test_weighted_sample_drops_nonpositive_weights(spark):
    """w<=0 rows must never be selected: w=0 keys to -inf/null and a
    negative w flips ln(u)/w positive (sorting above every valid
    row) — both are dropped before keying."""
    from dislib_spark.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, 5.0, "s"), (2, 0.0, "s"), (3, -2.0, "s"), (4, 1.0, "s")],
        "id long, w double, src string",
    )
    got = weighted_sample_topk(df, "w", "id", k=4, by="src").collect()
    assert sorted(r["id"] for r in got) == [1, 4]


def test_k_core_peels_to_dense_subgraph(spark):
    """2-core keeps exactly the triangle of a path+triangle graph;
    a chain that needs multiple peel rounds empties correctly; k=3
    on a graph with no 3-core returns nothing."""
    from dislib_spark.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7)],
        ["a_id", "b_id"],
    )
    got = sorted(
        (r["node"], r["deg"]) for r in k_core(edges, 2).collect()
    )
    assert got == [(5, 2), (6, 2), (7, 2)]
    assert k_core(edges, 3).count() == 0
    # pure chain: every round exposes new degree-1 endpoints; with
    # enough rounds the 2-core is empty, with too few it is not —
    # fixed-round semantics, monotone peel
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["a_id", "b_id"]
    )
    assert k_core(chain, 2, rounds=8).count() == 0
    assert k_core(chain, 2, rounds=1).count() > 0
