"""Masked-language-model pretraining for the BERT trunk on a dp x tp mesh.

Why this exists: a from-scratch cross-encoder trained with pointwise BCE on
relevance triples NEVER escapes the chance plateau — measured flat at the
label base rate across dtypes, learning rates and embedding inits (easy
random-negative task included). The missing piece is a trunk whose attention
already routes token-identity information between positions; that is
precisely what MLM pretraining produces (the original BERT recipe). Pretrain
the trunk here on the corpus's own documents, then graft it into the
cross-encoder (train/cross_encoder.py:warm_start_from_biencoder accepts any
model whose trunk lives under the "encoder" key) and fine-tune with BCE.

The reference has no pretraining (frozen HF downloads); this subsystem lets
the framework produce query towers for any domain with zero downloads.

TPU notes: one jitted train step (mask sampling happens on host — cheap,
keeps the device program static); masked-position CE via a weight mask, no
dynamic shapes; dp shards the batch, tp splits the trunk kernels via the
same TP_RULES as the other trainers. The decoder head is UNTIED (a plain
vocab-size Dense) — at tiny-model scale tying buys nothing and untied keeps
the trunk param tree identical to the bi-/cross-encoder trunks for grafting.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from review_recommender_tpu.models.bert import BertConfig, BertEncoder
from review_recommender_tpu.train.contrastive import make_lr, shard_params


class MLMModel(nn.Module):
    """BertEncoder trunk + transform + untied vocab decoder -> logits."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        c = self.cfg
        hidden = BertEncoder(c, self.dtype, attn_impl=self.attn_impl,
                             name="encoder")(
            input_ids, attention_mask, token_type_ids
        ).astype(jnp.float32)
        h = nn.Dense(c.hidden_size, dtype=jnp.float32,
                     name="mlm_transform")(hidden)
        h = nn.gelu(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="mlm_ln")(h)
        return nn.Dense(c.vocab_size, dtype=jnp.float32, name="mlm_decoder")(h)


def init_mlm(cfg: BertConfig, seed: int = 0, dtype=jnp.bfloat16):
    model = MLMModel(cfg, dtype=dtype)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids, jnp.ones_like(ids))
    return model, params["params"]


@dataclasses.dataclass
class MLMTrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    mask_prob: float = 0.15
    seed: int = 0
    total_steps: int = 0
    warmup_steps: int = 0


def make_mlm_batch(tokenizer, texts: Sequence[str], *, max_len: int,
                   rng: np.random.Generator, mask_prob: float = 0.15):
    """Host-side BERT masking: of the sampled positions, 80% -> [MASK],
    10% -> random id, 10% -> kept. Returns (input_ids, attention_mask,
    labels, label_weights) — weights are 1.0 exactly at masked positions.
    Special positions (CLS/SEP/PAD) are never masked."""
    from review_recommender_tpu.models.tokenizer import encode_batch

    ids, attn, _tt = encode_batch(tokenizer, list(texts), max_len=max_len,
                                  pad_to=max_len)
    labels = ids.copy()
    special = (
        (ids == tokenizer.cls_id) | (ids == tokenizer.sep_id)
        | (attn == 0)
    )
    pick = (rng.random(ids.shape) < mask_prob) & ~special
    # guarantee at least one masked position per row with any maskable token
    maskable = ~special
    for i in np.nonzero(pick.sum(axis=1) == 0)[0]:
        cand = np.nonzero(maskable[i])[0]
        if len(cand):
            pick[i, cand[int(rng.integers(len(cand)))]] = True
    action = rng.random(ids.shape)
    vocab_size = getattr(tokenizer, "vocab_size", None) or len(tokenizer.vocab)
    rand_ids = rng.integers(5, vocab_size, size=ids.shape).astype(ids.dtype)
    masked = np.where(action < 0.8, tokenizer.mask_id,
                      np.where(action < 0.9, rand_ids, ids))
    input_ids = np.where(pick, masked, ids)
    weights = pick.astype(np.float32)
    return input_ids, attn, labels, weights


class MLMTrainer:
    """Masked-token CE trainer for the MLMModel trunk."""

    def __init__(self, cfg: BertConfig, params, *,
                 train_cfg: Optional[MLMTrainConfig] = None,
                 mesh: Optional[Mesh] = None, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.tc = train_cfg or MLMTrainConfig()
        # GSPMD has no partitioning rule for pallas_call: on a tp-sharded
        # mesh the fused attention kernel would force replication, so
        # mesh-jitted training pins the XLA einsum path.
        self.model = MLMModel(cfg, dtype=dtype,
                              attn_impl="xla" if mesh is not None else "auto")
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.tc.max_grad_norm),
            optax.adamw(make_lr(self.tc), weight_decay=self.tc.weight_decay),
        )
        if mesh is not None:
            params = shard_params(params, mesh)
        self.params = params
        self.opt_state = self.tx.init(params)
        self.step = 0

        if mesh is not None:
            bs = NamedSharding(mesh, P("dp", None))
            self._step_fn = jax.jit(
                self._train_step,
                in_shardings=(None, None, bs, bs, bs, bs),
            )
        else:
            self._step_fn = jax.jit(self._train_step)

    def _loss(self, params, ids, mask, labels, weights):
        logits = self.model.apply({"params": params}, ids, mask)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        denom = jnp.maximum(weights.sum(), 1.0)
        loss = (ce * weights).sum() / denom
        acc = ((jnp.argmax(logits, -1) == labels) * weights).sum() / denom
        return loss, acc

    def _train_step(self, params, opt_state, ids, mask, labels, weights):
        (loss, acc), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, ids, mask, labels, weights
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    def train_step(self, ids, mask, labels, weights) -> Dict[str, float]:
        """One masked-batch step. Returns metrics (blocks)."""
        m = self.train_step_async(ids, mask, labels, weights)
        return {k: v if k == "step" else float(v) for k, v in m.items()}

    def train_step_async(self, ids, mask, labels, weights) -> Dict:
        """Metrics stay device arrays (no per-step sync — see
        train/contrastive.py:train_step_async)."""
        self.params, self.opt_state, loss, acc = self._step_fn(
            self.params, self.opt_state,
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
            jnp.asarray(weights),
        )
        self.step += 1
        return {"loss": loss, "masked_acc": acc, "step": self.step}

    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        blob = flax.serialization.to_bytes(
            {"params": self.params, "opt_state": self.opt_state,
             "step": self.step})
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(blob)
        tmp.replace(path)

    def restore(self, path: str | Path) -> None:
        target = {"params": self.params, "opt_state": self.opt_state,
                  "step": self.step}
        state = flax.serialization.from_bytes(target,
                                              Path(path).read_bytes())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step = int(state["step"])
        if self.mesh is not None:
            self.params = shard_params(self.params, self.mesh)


def pretrain_mlm(trainer: MLMTrainer, texts: Sequence[str], tokenizer, *,
                 batch_size: int = 64, steps: int = 1000, max_len: int = 96,
                 seed: int = 0, log_every: int = 100,
                 checkpoint_path: Optional[str] = None,
                 checkpoint_every: int = 0) -> List[dict]:
    """Step-count-driven pretraining loop: each step samples a fresh text
    batch and fresh mask pattern (epochless, the standard MLM regime).

    Resume-aware: the loop runs from trainer.step to `steps`, and each
    step's sampling/mask rng is seeded by (seed, step) — so a trainer
    restored from a mid-run checkpoint continues the EXACT batch stream the
    killed run would have seen (reference offline-job resume semantics,
    nlp/11_build_product_embeddings.py:130-147). checkpoint_every > 0
    saves to checkpoint_path every N steps (atomic write)."""
    import logging

    logger = logging.getLogger(__name__)
    history: List[dict] = []
    n = len(texts)
    for step_i in range(trainer.step, steps):
        srng = np.random.default_rng((seed, step_i))
        sel = srng.integers(n, size=batch_size)
        batch = make_mlm_batch(tokenizer, [texts[int(i)] for i in sel],
                               max_len=max_len, rng=srng,
                               mask_prob=trainer.tc.mask_prob)
        m = trainer.train_step_async(*batch)  # no per-step device sync
        history.append(m)
        if log_every and m["step"] % log_every == 0:
            logger.info("mlm step %d loss %.4f masked_acc %.3f",
                        m["step"], float(m["loss"]), float(m["masked_acc"]))
        if (checkpoint_path is not None and checkpoint_every
                and m["step"] % checkpoint_every == 0):
            trainer.save(checkpoint_path)
    history = [{k: v if k == "step" else float(v) for k, v in m.items()}
               for m in history]
    if checkpoint_path is not None:
        trainer.save(checkpoint_path)
    return history
