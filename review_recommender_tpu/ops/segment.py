"""Best-review snippet scoring: per-product segment max over review sims.

Replaces the reference's pandas groupby-argmax over up to 300k filtered
review embeddings (app/app_product_search.py:320-370, SURVEY.md hot loop #4)
with one (M, D) x (D,) matmul plus a segment max keyed by the precomputed
review->product mapping. The device pass scores *all* reviews (cheap,
bandwidth-bound); the reference's max_scan row cap was a host-memory
protection that the device path does not need — callers that want the exact
truncation semantics can pre-slice the review index.

Returns the best score per product row; the argmax review index (for snippet
text display) is recovered per returned product with a second tiny pass,
host-side, only for the k displayed results.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = jnp.float32(-3.4e38)


def best_review_scores(
    rev_emb: jax.Array,  # (M_pad, D)
    rev_product: jax.Array,  # (M_pad,) int32 segment ids, N = discard bucket
    rev_valid: jax.Array,  # (M_pad,) bool
    qvec: jax.Array,  # (D,)
    num_products: int,
) -> jax.Array:
    """(num_products,) best review cosine sim per product (-3.4e38 if none)."""
    sims = jnp.dot(rev_emb, qvec.astype(rev_emb.dtype),
                   preferred_element_type=jnp.float32)
    sims = jnp.where(rev_valid, sims, NEG)
    seg = jnp.where(rev_valid, rev_product, num_products)
    best = jax.ops.segment_max(
        sims, seg, num_segments=num_products + 1, indices_are_sorted=False
    )
    return best[:num_products]


def best_review_argmax_host(sims, rev_product, product_row: int):
    """Host helper: index of the best review for one product row."""
    import numpy as np

    mask = np.asarray(rev_product) == product_row
    if not mask.any():
        return None
    idxs = np.nonzero(mask)[0]
    return int(idxs[np.argmax(np.asarray(sims)[idxs])])
