"""The end-to-end search engine: host featurization + jitted device stages."""
from review_recommender_tpu.engine.search import SearchEngine  # noqa: F401
from review_recommender_tpu.engine.featurize import QueryFeaturizer  # noqa: F401
