"""Attribute-gate factors on device.

The reference gate does raw substring matching of each group's synonyms
against the candidate's agg_text[:6000] (app/app_product_search.py:228-236).
Substring search is not a device-friendly operation, so the gate is split at
index/query time (SURVEY.md §7 hard part #1):

  1. Known phrase vocabulary (all SYNONYMS/COLORS phrases, incl. multi-word
     ones like "noise cancelling"): exact substring presence precomputed
     host-side at index build into a per-doc bitset (gate_bits). Query maps
     each group to a phrase-bitmask -> device AND/any. Exact parity.

  2. Dynamic query tokens (len>=4 singleton groups): host expands the token
     to the set of index-vocabulary terms that contain it as a substring
     (the vocabulary is small; the scan is microseconds in numpy/C++), and
     the device tests candidate doc_terms membership against that padded
     id set. This matches the reference whenever the substring hit lies
     inside a single token of the document (the overwhelmingly common case);
     hits that span token boundaries or fall inside stop-words are missed.
     GATE_MODE=host computes the exact substring gate on the candidate pool
     for parity-critical runs (evals).

Query-side gate features (built by engine/featurize.py):
  group_phrase_mask (G_max, G_phrases) bool
  group_term_ids    (G_max, T_cap) int32, -1 = pad
  group_valid       (G_max,) bool
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gate_factors_device(
    gate_bits: jax.Array,  # (P, G_phrases) bool
    doc_terms: jax.Array,  # (P, L) int32
    group_phrase_mask: jax.Array,  # (G_max, G_phrases) bool
    group_term_ids: jax.Array,  # (G_max, T_cap) int32, -1 pad
    group_valid: jax.Array,  # (G_max,) bool
    penalty: jax.Array,  # scalar f32
) -> tuple[jax.Array, jax.Array]:
    """Returns (factor (P,), hits (P,) int32)."""
    # phrase hits: (P, 1, G_phrases) & (1, G_max, G_phrases) -> any over phrases
    phrase_hit = jnp.any(
        gate_bits[:, None, :] & group_phrase_mask[None, :, :], axis=-1
    )  # (P, G_max)

    # term hits: (P, L, 1, 1) == (1, 1, G_max, T_cap) -> any over (L, T_cap)
    term_match = doc_terms[:, :, None, None] == group_term_ids[None, None, :, :]
    term_hit = jnp.any(term_match, axis=(1, 3))  # (P, G_max)

    hit = phrase_hit | term_hit
    miss = group_valid[None, :] & ~hit  # (P, G_max)
    n_miss = jnp.sum(miss.astype(jnp.int32), axis=1)  # (P,)
    factor = jnp.power(penalty.astype(jnp.float32), n_miss.astype(jnp.float32))
    hits = jnp.sum((group_valid[None, :] & hit).astype(jnp.int32), axis=1)
    return factor.astype(jnp.float32), hits
