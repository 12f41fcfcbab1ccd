"""Training: contrastive bi-encoder + pointwise cross-encoder fine-tuning
over a dp x tp mesh."""
from review_recommender_tpu.train.contrastive import (  # noqa: F401
    ContrastiveTrainer,
    TrainConfig,
    make_pair_batch,
    param_specs,
    shard_params,
)
from review_recommender_tpu.train.cross_encoder import (  # noqa: F401
    CrossEncoderTrainer,
    CrossTrainConfig,
    make_triple_batch,
    train_crossencoder,
)
from review_recommender_tpu.train.data import (  # noqa: F401
    mine_pairs,
    mine_triples,
    train_biencoder,
)
from review_recommender_tpu.train.mlm import (  # noqa: F401
    MLMTrainConfig,
    MLMTrainer,
    init_mlm,
    make_mlm_batch,
    pretrain_mlm,
)
