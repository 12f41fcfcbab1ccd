"""Multi-chip parallelism: corpus-sharded retrieval over a device mesh and
data/tensor-parallel training sharding rules."""
from review_recommender_tpu.parallel.sharded import ShardedSearchEngine  # noqa: F401
