from dislib_spark.vector.search import (
    cosine_similarity, cosine_topk, ivf_topk, lsh_topk, neardup_pairs,
    neardup_pairs_lsh,
)

__all__ = [
    "cosine_similarity", "cosine_topk", "ivf_topk", "lsh_topk",
    "neardup_pairs", "neardup_pairs_lsh",
]
