from vecgo_spark.functions.vector import (
    cosine_similarity,
    dot,
    hamming,
    l2_normalize,
    l2_norm,
    sq_l2,
)

__all__ = ["sq_l2", "dot", "cosine_similarity", "l2_normalize", "l2_norm", "hamming"]
