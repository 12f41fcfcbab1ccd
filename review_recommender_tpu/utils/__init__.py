"""Host-side utility kernels: text processing and numeric primitives.

Parity surface of the reference utils module (/root/reference/utils.py:40-132):
tokenization, gate groups, gate factor, plus jnp implementations of the
numeric kernels (l2 normalize, min-max normalize, Bayesian prior, trust,
cosine top-k) used by the device engine.
"""
from review_recommender_tpu.utils.text import (  # noqa: F401
    COLORS,
    STOP_WORDS,
    SYNONYMS,
    build_gate_groups,
    calculate_gate_factor,
    tokenize_query,
    tokenize_document,
)
from review_recommender_tpu.utils.numerics import (  # noqa: F401
    bayesian_prior,
    cosine_similarity_search,
    l2_normalize,
    minmax_normalize,
    trust_score_from_reviews,
)
