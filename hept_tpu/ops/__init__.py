from .bucket_attn import (
    bucket_rbf_attention_cols_xla,
    bucket_rbf_attention_xla,
    dense_rbf_attention,
    hept_attention_core,
    hept_attention_core_cols,
    stable_ratio,
)
from .segment import segment_softmax, segment_sum, segment_mean
from .knn import knn_brute_force

__all__ = [
    "bucket_rbf_attention_cols_xla",
    "bucket_rbf_attention_xla",
    "dense_rbf_attention",
    "hept_attention_core",
    "hept_attention_core_cols",
    "stable_ratio",
    "segment_softmax",
    "segment_sum",
    "segment_mean",
    "knn_brute_force",
]
