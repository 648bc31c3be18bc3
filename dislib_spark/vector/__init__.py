from dislib_spark.vector.search import (
    assign_to_cells, cosine_similarity, cosine_topk, ivf_index,
    ivf_query_index, ivf_topk, lsh_topk, neardup_pairs, neardup_pairs_lsh,
)

__all__ = [
    "assign_to_cells", "cosine_similarity", "cosine_topk", "ivf_index",
    "ivf_query_index", "ivf_topk", "lsh_topk", "neardup_pairs",
    "neardup_pairs_lsh",
]
