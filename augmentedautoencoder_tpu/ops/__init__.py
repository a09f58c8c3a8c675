"""TPU kernels / device ops: codebook nearest-neighbor query paths."""

from .nn_query import cosine_similarity_topk, cosine_top1, cosine_top1_pallas

__all__ = ["cosine_similarity_topk", "cosine_top1", "cosine_top1_pallas"]
