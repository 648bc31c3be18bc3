

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


def test_containment_pairs_catches_embedded_doc(spark):
    """t72's kernel on the exact gap case the symmetric passes miss:
    a short document embedded verbatim inside a much longer one has
    containment 1.0 but Jaccard = |short|/|long| < 0.3 — it must
    surface with caught_by_jaccard = 0, and jaccard_pairs at 0.3
    must NOT flag the pair."""
    from dislib_spark.text.dedup import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta eta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [
        (1, short),
        (2, short + " " + filler),  # short fully contained
        (3, "totally different words " + " ".join(f"q{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a_id"], r["b_id"]): r
        for r in containment_pairs(df, c_threshold=0.6, j_max=0.3).collect()
    }
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.3
    assert r["caught_by_jaccard"] == 0
    # symmetric Jaccard dedup misses it
    jp = {(x["a_id"], x["b_id"]) for x in jaccard_pairs(df, threshold=0.3).collect()}
    assert (1, 2) not in jp


def test_grid_weighted_median_numpy_parity(spark):
    """m62/m63/m64's exact weighted-median selector vs a numpy
    expansion of the weighted population, both parities."""
    import numpy as np

    from dislib_spark.queries.ml import _grid_weighted_median
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    for trial in range(4):
        vals = rng.choice(np.arange(-10, 11), size=12, replace=False)
        wts = rng.integers(1, 9, size=12)
        if trial % 2 == 0 and wts.sum() % 2 == 0:
            wts[0] += 1  # force odd total half the time
        rows = [(float(v), int(w)) for v, w in zip(vals, wts)]
        grid = spark.createDataFrame(rows, "v double, w long").select(
            "v", F.col("w").cast("decimal(38,0)").alias("w")
        )
        got = _grid_weighted_median(grid, "v", "w").collect()[0]
        pop = np.sort(np.repeat(vals.astype(float), wts))
        want = float(np.median(pop))
        assert float(got["med"]) == want, (trial, got["med"], want)
        assert int(got["w_total"]) == int(wts.sum())


def test_stream_sessions_batch_python_parity(spark):
    """stream_sessions' batch form vs a straight-line python
    gaps-and-islands replay on irregular per-user event times."""
    import datetime

    from dislib_spark.streaming.stateful import stream_sessions

    base = datetime.datetime(2024, 1, 1)
    offs = {
        7: [0, 60, 200, 2000, 2100, 9000],
        8: [0, 950, 1000],
        9: [5],
    }
    rows = [
        (u, base + datetime.timedelta(seconds=s))
        for u, ss in offs.items()
        for s in ss
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["start_s"], r["end_s"], r["n_events"])
        for r in stream_sessions(df, gap="15 minutes").collect()
    }
    want = set()
    epoch = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
    # replay against whatever epoch the session used for ts casting:
    # derive from the data itself (min start_s observed aligns offsets)
    anchor = min(s for _, s, _, _ in got) - min(offs[7])
    for u, ss in offs.items():
        cur = [ss[0]]
        for t in ss[1:]:
            if t - cur[-1] > 900:
                want.add((u, anchor + cur[0], anchor + cur[-1], len(cur)))
                cur = [t]
            else:
                cur.append(t)
        want.add((u, anchor + cur[0], anchor + cur[-1], len(cur)))
    assert got == want


def test_minhash_precomputed_sig_identical(spark):
    """minhash_lsh_pairs(sig=minhash_signatures(...)) returns exactly
    the per-call-build result for both banding configs — the shared
    signature path (t75) must be a pure plan refactor."""
    from dislib_spark.text.dedup import minhash_lsh_pairs, minhash_signatures

    import random

    rng = random.Random(75)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    base = " ".join(rng.choices(vocab, k=25))
    for i in range(20):
        words = base.split()
        for _ in range(rng.randrange(0, 6)):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((i, " ".join(words)))
    rows.append((98, "xx"))  # < n tokens: dropped by both paths
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(df, hash_fn="md5")
    for bands in (8, 4):
        want = sorted(
            map(
                tuple,
                minhash_lsh_pairs(
                    df, threshold=0.3, bands=bands, hash_fn="md5"
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                minhash_lsh_pairs(
                    df, threshold=0.3, bands=bands, hash_fn="md5", sig=sig
                ).collect(),
            )
        )
        assert got == want
        assert len(want) > 0
