"""JAX model family: BERT encoder stack, bi-encoder and cross-encoder towers,
WordPiece/Hash tokenizers, torch->JAX weight conversion."""
from review_recommender_tpu.models.bert import (  # noqa: F401
    BertConfig,
    BertEncoder,
    BiEncoderModel,
    CrossEncoderModel,
    init_biencoder,
    init_crossencoder,
)
from review_recommender_tpu.models.encoder import BiEncoder, CrossEncoder  # noqa: F401
from review_recommender_tpu.models.tokenizer import (  # noqa: F401
    HashTokenizer,
    WordPieceTokenizer,
    encode_batch,
)
