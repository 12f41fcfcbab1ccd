"""Offline data pipeline: ETL, product aggregation, sharded embedding jobs,
index build, reference-artifact import."""
from review_recommender_tpu.data.etl import clean_chunk, normalize_merge, stable_id  # noqa: F401
from review_recommender_tpu.data.pipeline import (  # noqa: F401
    build_index_from_reviews,
    import_reference_artifacts,
    run_full_pipeline,
)
from review_recommender_tpu.data.prep import build_products, looks_spammy  # noqa: F401
