"""Serving layer: HTTP JSON API, unified CLI, artifact audit."""
from review_recommender_tpu.serve.audit import audit_index_dir  # noqa: F401
