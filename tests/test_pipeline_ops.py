"""Training-pipeline operator tests: deterministic hash sampling /
splitting and benchmark-contamination detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.sampling import hash_bucket, hash_split, stratified_hash_sample
from dislib_spark.tables import load_table
from dislib_spark.text.contamination import contamination_check, word_ngrams
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
