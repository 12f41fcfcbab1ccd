"""Host-side query featurization: strings -> device-ready integer features.

Converts a query string into the fixed-shape arrays the jitted query program
consumes:

  - BM25 side: padded query term ids + per-term idf. Duplicated query tokens
    are kept (rank_bm25 sums a contribution per query-token occurrence).
  - Gate side: per-group phrase bitmasks over the static GATE_PHRASES
    vocabulary, plus padded index-vocabulary term-id expansions for dynamic
    tokens (vectorized substring scan over the vocab via np.char.find).

All lookups are O(query) plus one vectorized vocab scan per dynamic gate
token; nothing here touches the device.
"""
from __future__ import annotations

import dataclasses
from typing import List, Set

import numpy as np

from review_recommender_tpu.config import config
from review_recommender_tpu.index.schema import ProductIndex
from review_recommender_tpu.utils.text import (
    GATE_PHRASE_ID,
    GATE_PHRASES,
    build_gate_groups,
    tokenize_query,
)

GROUPS_CAP = 6  # reference caps gate groups at 6 (utils.py:86)


@dataclasses.dataclass
class QueryFeatures:
    q_terms: np.ndarray  # (Q,) int32, 0 pad
    q_idf: np.ndarray  # (Q,) f32
    group_phrase_mask: np.ndarray  # (6, G_phrases) bool
    group_term_ids: np.ndarray  # (6, T_cap) int32, -1 pad
    group_valid: np.ndarray  # (6,) bool
    tokens: List[str]
    groups: List[Set[str]]  # host groups for exact-gate mode / debug

    def pack(self) -> np.ndarray:
        """All integer/bool features flattened into ONE f32 vector so a
        query costs a single host->device transfer (each small transfer to
        a tunneled TPU has ~1 ms latency). Term ids are exact in f32
        (vocab ids are far below 2^24); unpack_features() inverts on
        device."""
        return np.concatenate([
            self.q_terms.astype(np.float32),
            self.q_idf,
            self.group_phrase_mask.astype(np.float32).ravel(),
            self.group_term_ids.astype(np.float32).ravel(),
            self.group_valid.astype(np.float32),
        ])


def packed_len(query_terms_cap: int, gate_terms_cap: int) -> int:
    g = len(GATE_PHRASES)
    return (2 * query_terms_cap + GROUPS_CAP * g
            + GROUPS_CAP * gate_terms_cap + GROUPS_CAP)


def unpack_features(packed, query_terms_cap: int, gate_terms_cap: int):
    """Device-side inverse of QueryFeatures.pack (jnp ops, jit-safe).
    Returns (q_terms i32, q_idf f32, gp_mask bool, gt_ids i32, g_valid bool).
    """
    import jax.numpy as jnp

    q = query_terms_cap
    g = len(GATE_PHRASES)
    t = gate_terms_cap
    off = 0
    q_terms = packed[off : off + q].astype(jnp.int32); off += q
    q_idf = packed[off : off + q]; off += q
    gp = packed[off : off + GROUPS_CAP * g].reshape(GROUPS_CAP, g) > 0; off += GROUPS_CAP * g
    gt = packed[off : off + GROUPS_CAP * t].reshape(GROUPS_CAP, t).astype(jnp.int32); off += GROUPS_CAP * t
    gv = packed[off : off + GROUPS_CAP] > 0
    return q_terms, q_idf, gp, gt, gv


class QueryFeaturizer:
    def __init__(
        self,
        index: ProductIndex,
        query_terms_cap: int = 32,
        gate_terms_cap: int = 64,
    ):
        self.index = index
        self.query_terms_cap = query_terms_cap
        self.gate_terms_cap = gate_terms_cap
        # Per-instance token-expansion cache (NOT functools.lru_cache on the
        # bound method: that would key on `self` in a process-global table and
        # pin the whole index alive after an index reload in a long server).
        self._expand_cache: dict = {}
        self._expand_cache_cap = 65536
        # Vectorized substring scan structures over the index vocabulary.
        terms = sorted(index.vocab.items(), key=lambda kv: kv[1])
        self._vocab_terms = np.array([t for t, _ in terms], dtype=np.str_)
        self._vocab_ids = np.array([i for _, i in terms], dtype=np.int32)
        self._vocab_df = index.df[self._vocab_ids] if len(terms) else np.zeros(0, np.int32)
        # C fast path: '\n'-joined vocab blob (line i <-> term id i+1 —
        # vocab ids are contiguous 1..V in build order)
        self._vocab_blob = None
        self._native = None
        try:
            from review_recommender_tpu.native import (
                NativeQueryFeaturizer,
                native_available,
                substring_scan_native,
            )

            if native_available() and terms:
                self._vocab_blob = ("\n".join(t for t, _ in terms) + "\n").encode()
                self._scan_native = substring_scan_native
                native = NativeQueryFeaturizer(
                    self._vocab_blob, index.df, index.idf,
                    query_terms_cap, gate_terms_cap,
                )
                expect = packed_len(query_terms_cap, gate_terms_cap)
                if native.packed_len == expect:
                    self._native = native
        except Exception:
            pass

    def _expand_token(self, token: str) -> np.ndarray:
        """Index-vocab term ids containing `token` as a substring, most
        frequent (by document frequency) first, capped at gate_terms_cap.
        Cached per instance: real query streams repeat tokens heavily and
        the vocab scan is the single most expensive host step."""
        hit = self._expand_cache.get(token)
        if hit is not None:
            return hit
        if len(self._vocab_terms) == 0:
            return np.zeros(0, np.int32)
        if self._native is not None and token.isascii():
            # trigram-index probe in C++ (native/featurizer.cc) — already
            # df-capped; cache and return directly
            ids = self._native.expand_token(token)
            if len(self._expand_cache) >= self._expand_cache_cap:
                self._expand_cache.clear()
            self._expand_cache[token] = ids
            return ids
        if self._vocab_blob is not None:
            ids = self._scan_native(self._vocab_blob, token)
        else:
            hits = np.char.find(self._vocab_terms, token) >= 0
            ids = self._vocab_ids[hits]
        if len(ids) > self.gate_terms_cap:
            dfs = self.index.df[ids]
            order = np.argsort(-dfs, kind="stable")[: self.gate_terms_cap]
            ids = ids[order]
        ids = ids.astype(np.int32)
        if len(self._expand_cache) >= self._expand_cache_cap:
            self._expand_cache.clear()
        self._expand_cache[token] = ids
        return ids

    def featurize_packed(self, query: str) -> np.ndarray:
        """Query string -> the packed f32 feature buffer, via the C++
        featurizer in ONE FFI crossing when available (the hot serving path:
        ~70 us of Python becomes a few us of C++). Non-ASCII queries and
        ENABLE_BM25=false fall back to the Python path (the flag is read per
        call there; the native handle bakes idf in)."""
        if (self._native is not None and query.isascii()
                and config.ENABLE_BM25):
            return self._native.featurize_packed(query)
        return self.featurize(query).pack()

    def featurize_packed_batch(self, queries) -> np.ndarray:
        """Batch of queries -> (B, packed_len) f32, one FFI crossing."""
        if (self._native is not None and config.ENABLE_BM25
                and all(q.isascii() for q in queries)):
            return self._native.featurize_packed_batch(queries)
        return np.stack([self.featurize_packed(q) for q in queries])

    def featurize(self, query: str) -> QueryFeatures:
        tokens = tokenize_query(query)

        # --- BM25 term ids (duplicates preserved) ---
        # ENABLE_BM25=false zero-fills the term lanes, which zeroes the BM25
        # signal in every query program (the reference's per-signal
        # degradation, app_product_search.py:119-149) without recompiling.
        Q = self.query_terms_cap
        q_terms = np.zeros(Q, dtype=np.int32)
        q_idf = np.zeros(Q, dtype=np.float32)
        if config.ENABLE_BM25:
            for i, tok in enumerate(tokens[:Q]):
                tid = self.index.vocab.get(tok, 0)
                q_terms[i] = tid
                q_idf[i] = self.index.idf[tid] if tid else 0.0

        # --- gate groups ---
        groups = build_gate_groups(query)
        G = len(GATE_PHRASES)
        phrase_mask = np.zeros((GROUPS_CAP, G), dtype=bool)
        term_ids = np.full((GROUPS_CAP, self.gate_terms_cap), -1, dtype=np.int32)
        valid = np.zeros(GROUPS_CAP, dtype=bool)
        for gi, group in enumerate(groups[:GROUPS_CAP]):
            valid[gi] = True
            dyn: List[np.ndarray] = []
            for member in group:
                pid = GATE_PHRASE_ID.get(member)
                if pid is not None:
                    phrase_mask[gi, pid] = True
                else:
                    dyn.append(self._expand_token(member))
            if dyn:
                ids = np.concatenate(dyn)[: self.gate_terms_cap]
                term_ids[gi, : len(ids)] = ids

        return QueryFeatures(
            q_terms=q_terms,
            q_idf=q_idf,
            group_phrase_mask=phrase_mask,
            group_term_ids=term_ids,
            group_valid=valid,
            tokens=tokens,
            groups=groups,
        )
