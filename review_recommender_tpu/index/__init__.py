"""Artifact & schema layer: ETL, offline index build, versioned bundle IO.

Replaces the reference's loose artifacts (product_emb.npy,
product_emb_meta.parquet, product_bm25.pkl, reviews_with_embeddings.parquet —
SURVEY.md §1 artifact table) with one versioned, device-ready index bundle.
"""
from review_recommender_tpu.index.schema import (  # noqa: F401
    ProductIndex,
    ReviewIndex,
    IndexBundle,
)
from review_recommender_tpu.index.build import build_product_index  # noqa: F401
from review_recommender_tpu.index.io import load_bundle, save_bundle  # noqa: F401
