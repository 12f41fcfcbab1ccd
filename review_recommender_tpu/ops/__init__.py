"""TPU compute ops for the query path.

  dense    brute-force cosine top-k over the corpus embedding matrix
  bm25     BM25 Okapi scoring (candidate-pool and full-corpus variants)
  gate     attribute-gate factors from precomputed presence structures
  fusion   the fused candidate scorer (minmax, priors, trust, gate, blend)
  segment  per-product best-review segment max (snippets)
  pallas   hand-written Pallas kernels backing the hot variants
"""
from review_recommender_tpu.ops.dense import dense_topk  # noqa: F401
from review_recommender_tpu.ops.bm25 import (  # noqa: F401
    bm25_candidate_scores,
    bm25_full_scores,
)
from review_recommender_tpu.ops.gate import gate_factors_device  # noqa: F401
from review_recommender_tpu.ops.fusion import fuse_candidates  # noqa: F401
