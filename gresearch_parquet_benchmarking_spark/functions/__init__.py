from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    tokens_col,
    norm_fingerprint_col,
    md5_hash64,
)
from gresearch_parquet_benchmarking_spark.functions.vector import (
    to_double_array,
    dot_product,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "tokens_col",
    "norm_fingerprint_col",
    "md5_hash64",
    "to_double_array",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
