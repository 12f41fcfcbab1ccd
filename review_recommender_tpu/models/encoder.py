"""Serving wrappers: text -> jitted model forward with bucketed shapes.

BiEncoder / CrossEncoder are the two model hooks of engine/search.py
(`query_encoder`, `cross_encoder`), replacing the reference's
sentence-transformers CPU calls (app/app_product_search.py:251, :277-278).

Shape discipline: sequences pad to a small set of length buckets and batches
pad to a batch bucket, so XLA compiles a handful of programs once and every
later call hits the cache. Activations run in bf16 on the MXU, outputs in
f32.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from review_recommender_tpu.models.bert import (
    BertConfig,
    BiEncoderModel,
    CrossEncoderModel,
    init_biencoder,
    init_crossencoder,
)
from review_recommender_tpu.models.tokenizer import (
    encode_seqs,
    pack_seqs,
    pad_bucket,
)

SEQ_BUCKETS = (16, 32, 64, 128, 256, 512)
BATCH_BUCKETS = (1, 8, 16, 32, 64, 128, 256)


def _batch_bucket(n: int) -> int:
    for b in BATCH_BUCKETS:
        if n <= b:
            return b
    return ((n + BATCH_BUCKETS[-1] - 1) // BATCH_BUCKETS[-1]) * BATCH_BUCKETS[-1]


def _bucketed_chunks(seqs, batch_size: int):
    """Yield (original_indices, items) chunks with items length-sorted, so
    each chunk packs to the smallest viable seq bucket instead of one long
    item forcing the whole batch into the top bucket (the standard
    sort-by-length serving trick; per-row outputs are order-invariant, and
    the sort is stable so equal-length items keep their original order)."""
    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i][0]))
    for lo in range(0, len(order), batch_size):
        sel = order[lo : lo + batch_size]
        yield sel, [seqs[i] for i in sel]


class BiEncoder:
    """Query/document embedding tower (bge-small semantics: CLS + L2-norm)."""

    def __init__(self, cfg: BertConfig, params, tokenizer, *,
                 dtype=jnp.bfloat16, pooling: str = "cls", max_len: int = 512,
                 mesh=None):
        """mesh: optional 1-D jax.sharding.Mesh — offline encode jobs shard
        the batch axis across it (pure data parallelism; params replicate).
        Batch buckets are multiples of the mesh size, so every chip gets an
        equal slice."""
        self.cfg = cfg
        self.tokenizer = tokenizer
        # a sequence longer than the model's position table would gather
        # out-of-range position embeddings (garbage, not an error)
        self.max_len = min(max_len, cfg.max_position)
        # mesh encode jobs jit with GSPMD batch shardings, which cannot
        # partition a pallas_call — pin XLA attention there (same rule as
        # the mesh trainers, train/mlm.py)
        self.model = BiEncoderModel(
            cfg, dtype=dtype, pooling=pooling,
            attn_impl="xla" if mesh is not None else "auto",
        )
        self.params = params
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            batch_sharding = NamedSharding(mesh, P(axis))
            self._fwd = jax.jit(
                lambda p, ids, mask, tt: self.model.apply(
                    {"params": p}, ids, mask, tt
                ),
                in_shardings=(None, batch_sharding, batch_sharding,
                              batch_sharding),
            )
            self._batch_multiple = int(mesh.shape[axis])
        else:
            self._fwd = jax.jit(
                lambda p, ids, mask, tt: self.model.apply(
                    {"params": p}, ids, mask, tt
                )
            )
            self._batch_multiple = 1

    @classmethod
    def random_init(cls, cfg: Optional[BertConfig] = None, tokenizer=None,
                    seed: int = 0, **kw):
        """Randomly initialized tower (tests / synthetic benchmarks)."""
        from review_recommender_tpu.models.tokenizer import HashTokenizer

        cfg = cfg or BertConfig.bge_small()
        _, params = init_biencoder(cfg, seed=seed)
        return cls(cfg, params, tokenizer or HashTokenizer(cfg.vocab_size), **kw)

    @classmethod
    def random_for_dim(cls, dim: int, seed: int = 0, **kw):
        """Random tower whose output dim matches an index's embedding dim
        (serving stand-in until converted checkpoint weights are supplied).
        bge-small dims get the full bge-small architecture; other dims get a
        proportional 4-layer tower."""
        if dim == 384:
            return cls.random_init(BertConfig.bge_small(), seed=seed, **kw)
        heads = max(1, dim // 32)
        while dim % heads:
            heads -= 1
        cfg = BertConfig(
            vocab_size=30522, hidden_size=dim, num_layers=4, num_heads=heads,
            intermediate_size=4 * dim, max_position=512,
        )
        return cls.random_init(cfg, seed=seed, **kw)

    def encode(self, texts: Sequence[str], batch_size: int = 256) -> np.ndarray:
        """Encode a list of texts -> (N, H) float32 L2-normalized.
        Length-sorted bucketing: short texts ride small seq buckets instead
        of padding to the longest text in arrival order."""
        if not len(texts):
            return np.zeros((0, self.cfg.hidden_size), np.float32)
        seqs = encode_seqs(self.tokenizer, list(texts), max_len=self.max_len)
        out = np.zeros((len(texts), self.cfg.hidden_size), np.float32)
        for sel, chunk in _bucketed_chunks(seqs, batch_size):
            ids, mask, tt = pack_seqs(self.tokenizer, chunk)
            seq = min(pad_bucket(ids.shape[1], SEQ_BUCKETS), self.max_len)
            bsz = _batch_bucket(len(chunk))
            m = self._batch_multiple
            bsz = ((bsz + m - 1) // m) * m  # equal per-chip slices on a mesh
            ids_p = np.zeros((bsz, seq), np.int32)
            mask_p = np.zeros((bsz, seq), np.int32)
            tt_p = np.zeros((bsz, seq), np.int32)
            w = min(ids.shape[1], seq)
            ids_p[: len(chunk), :w] = ids[:, :w]
            mask_p[: len(chunk), :w] = mask[:, :w]
            tt_p[: len(chunk), :w] = tt[:, :w]
            emb = self._fwd(self.params, ids_p, mask_p, tt_p)
            out[sel] = np.asarray(emb[: len(chunk)], dtype=np.float32)
        return out

    def __call__(self, text: str) -> np.ndarray:
        """Single-query hook for SearchEngine(query_encoder=...)."""
        return self.encode([text])[0]


class CrossEncoder:
    """(query, doc) relevance scorer (ms-marco MiniLM head)."""

    def __init__(self, cfg: BertConfig, params, tokenizer, *,
                 dtype=jnp.bfloat16, max_len: int = 512, batch_size: int = 64):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_len = min(max_len, cfg.max_position)  # see BiEncoder note
        self.batch_size = batch_size
        self.model = CrossEncoderModel(cfg, dtype=dtype)
        self.params = params
        self._fwd = jax.jit(
            lambda p, ids, mask, tt: self.model.apply(
                {"params": p}, ids, mask, tt
            )
        )

    @classmethod
    def random_init(cls, cfg: Optional[BertConfig] = None, tokenizer=None,
                    seed: int = 0, **kw):
        from review_recommender_tpu.models.tokenizer import HashTokenizer

        cfg = cfg or BertConfig.minilm_l6_cross()
        _, params = init_crossencoder(cfg, seed=seed)
        return cls(cfg, params, tokenizer or HashTokenizer(cfg.vocab_size), **kw)

    def score_pairs(self, queries: Sequence[str], docs: Sequence[str]) -> np.ndarray:
        """Score (query, doc) pairs -> (N,) float32 logits. Length-sorted
        bucketing: one 2000-char doc no longer drags a whole chunk of short
        pairs into the S=512 bucket."""
        assert len(queries) == len(docs)
        if not len(docs):
            return np.zeros(0, np.float32)
        seqs = encode_seqs(
            self.tokenizer, list(queries), pairs=list(docs),
            max_len=self.max_len,
        )
        out = np.zeros(len(docs), np.float32)
        for sel, chunk in _bucketed_chunks(seqs, self.batch_size):
            ids, mask, tt = pack_seqs(self.tokenizer, chunk)
            seq = min(pad_bucket(ids.shape[1], SEQ_BUCKETS), self.max_len)
            bsz = _batch_bucket(len(chunk))
            ids_p = np.zeros((bsz, seq), np.int32)
            mask_p = np.zeros((bsz, seq), np.int32)
            tt_p = np.zeros((bsz, seq), np.int32)
            w = min(ids.shape[1], seq)
            ids_p[: len(chunk), :w] = ids[:, :w]
            mask_p[: len(chunk), :w] = mask[:, :w]
            tt_p[: len(chunk), :w] = tt[:, :w]
            scores = self._fwd(self.params, ids_p, mask_p, tt_p)
            out[sel] = np.asarray(scores[: len(chunk)], dtype=np.float32)
        return out

    def __call__(self, query: str, texts: Sequence[str]) -> np.ndarray:
        """Hook for SearchEngine(cross_encoder=...): one query, many docs.
        Texts arrive pre-truncated to 2000 chars by the engine (parity with
        app/app_product_search.py:273)."""
        return self.score_pairs([query] * len(texts), texts)
