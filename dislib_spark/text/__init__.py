from dislib_spark.text.analysis import (
    fingerprint, predict_lang, quality_score, token_count, with_text_features,
)
from dislib_spark.text.dedup import (
    exact_dedup, jaccard_pairs, minhash_lsh_pairs, simhash, simhash_pairs, word_shingles,
)

__all__ = [
    "fingerprint", "predict_lang", "quality_score", "token_count",
    "with_text_features", "exact_dedup", "jaccard_pairs",
    "minhash_lsh_pairs", "simhash", "simhash_pairs", "word_shingles",
]
