"""Training: contrastive bi-encoder fine-tuning over a dp x tp mesh."""
from review_recommender_tpu.train.contrastive import (  # noqa: F401
    ContrastiveTrainer,
    TrainConfig,
    make_pair_batch,
    param_specs,
    shard_params,
)
