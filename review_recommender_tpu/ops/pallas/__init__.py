"""Hand-written Pallas TPU kernels for the hot retrieval ops.

Kernels are drop-in replacements for the XLA implementations in ops/ and are
selected by config.USE_PALLAS on TPU backends; the XLA versions remain the
reference implementations and the CPU/test path.
"""
from review_recommender_tpu.ops.pallas.bm25_kernel import (  # noqa: F401
    bm25_full_scores_packed_pallas,
    bm25_full_scores_pallas,
    bm25_topk_packed_pallas,
    bm25_topk_pallas,
    pack_postings,
)
