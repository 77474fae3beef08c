from .vector import (
    as_double_array,
    cosine_similarity,
    dot_product,
    l2_norm,
    squared_l2,
)

__all__ = [
    "as_double_array",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "squared_l2",
]
