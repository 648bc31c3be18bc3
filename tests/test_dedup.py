

def test_idf_simhash_zero_weight_ubiquitous_terms(spark):
    """A term present in EVERY doc has idf=ln(1)=0 — it contributes
    nothing to the signature regardless of its count, so two docs
    differing only in repetitions of a ubiquitous term hash
    identically (the whole point of IDF weighting)."""
    from dislib_spark.text.dedup import idf_simhash_signatures

    rows = [
        (1, "alpha beta common"),
        (2, "alpha beta common common common"),
        (3, "gamma delta common"),
        (4, "epsilon zeta common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r["id"]: r["sig"]
        for r in idf_simhash_signatures(df).collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_idf_simhash_pairs_match_bruteforce(spark):
    """Pigeonhole blocking over the weighted signatures finds exactly
    the brute-force hamming<=8 pairs (completeness guarantee holds for
    ANY signature scheme)."""
    from dislib_spark.text.dedup import (
        idf_simhash_signatures,
        simhash_pairs_from_sigs,
    )

    import random

    rng = random.Random(51)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    base = " ".join(rng.choices(vocab, k=30))
    for i in range(30):
        words = base.split()
        for _ in range(rng.randrange(0, 4)):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = idf_simhash_signatures(df)
    got = {
        (r["a_id"], r["b_id"])
        for r in simhash_pairs_from_sigs(sigs, 8, 60).collect()
    }
    s = {r["id"]: r["sig"] for r in sigs.collect()}
    want = {
        (a, b)
        for a in s
        for b in s
        if a < b and bin(s[a] ^ s[b]).count("1") <= 8
    }
    assert got == want
