"""Pointwise cross-encoder training: sigmoid BCE over (query, doc, label)
triples on a dp x tp device mesh.

The reference's rerank stage is a frozen ms-marco MiniLM download scored on
CPU (/root/reference/app/app_product_search.py:277-278); it has no way to
adapt that model to a new corpus. This module adds the training half for the
CrossEncoderModel head (models/bert.py): fine-tune (or train from scratch)
the pair scorer on relevance triples mined from the corpus, so the rerank
lane can be a *learned* model even in environments where no pretrained
checkpoint can be downloaded (see examples/quality_table.py --lane trained).

Loss: binary cross-entropy on the single relevance logit — the standard
pointwise objective for the BertForSequenceClassification 1-logit layout
this model mirrors. Hard negatives (same-theme / BM25-pool docs) carry most
of the signal; train/data.py:mine_triples supplies them.

Parallelism mirrors train/contrastive.py: dp shards the triple batch (XLA
inserts the gradient psum over ICI), tp splits attention/FFN kernels
Megatron-style via the same TP_RULES (the cross-encoder's BertEncoder has
identical parameter paths; the pooler/classifier head stays replicated).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from review_recommender_tpu.models.bert import BertConfig, CrossEncoderModel
from review_recommender_tpu.train.contrastive import make_lr, shard_params


@dataclasses.dataclass
class CrossTrainConfig:
    learning_rate: float = 5e-5
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    seed: int = 0
    #: warmup+cosine when set (see train/contrastive.py:make_lr)
    total_steps: int = 0
    warmup_steps: int = 0


class CrossEncoderTrainer:
    """BCE trainer for the CrossEncoderModel pair scorer."""

    def __init__(
        self,
        cfg: BertConfig,
        params,
        *,
        train_cfg: Optional[CrossTrainConfig] = None,
        mesh: Optional[Mesh] = None,
        dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.tc = train_cfg or CrossTrainConfig()
        # mesh-jitted training pins XLA attention (see train/mlm.py note)
        self.model = CrossEncoderModel(
            cfg, dtype=dtype, attn_impl="xla" if mesh is not None else "auto"
        )
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
            batch_sharding = NamedSharding(mesh, P("dp", None))
            label_sharding = NamedSharding(mesh, P("dp"))
            self._step_fn = jax.jit(
                self._train_step,
                in_shardings=(None, None, batch_sharding, batch_sharding,
                              batch_sharding, label_sharding),
            )
        else:
            self._step_fn = jax.jit(self._train_step)

    def _loss(self, params, ids, mask, ttype, labels):
        logits = self.model.apply({"params": params}, ids, mask, ttype)
        loss = optax.sigmoid_binary_cross_entropy(
            logits, labels.astype(jnp.float32)
        ).mean()
        acc = jnp.mean((logits > 0) == (labels > 0.5))
        return loss, acc

    def _train_step(self, params, opt_state, ids, mask, ttype, labels):
        (loss, acc), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, ids, mask, ttype, labels
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    def train_step(self, ids, mask, ttype, labels) -> Dict[str, float]:
        """One step on a tokenized triple batch. Returns metrics (blocks)."""
        m = self.train_step_async(ids, mask, ttype, labels)
        return {k: v if k == "step" else float(v) for k, v in m.items()}

    def train_step_async(self, ids, mask, ttype, labels) -> Dict:
        """Metrics stay device arrays (no per-step sync — see
        train/contrastive.py:train_step_async)."""
        self.params, self.opt_state, loss, acc = self._step_fn(
            self.params, self.opt_state,
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(ttype),
            jnp.asarray(labels),
        )
        self.step += 1
        return {"loss": loss, "acc": acc, "step": self.step}

    # ------------------------------------------------------------- checkpoint
    def save(self, path: str | Path) -> None:
        """Serialize params + opt state + step (flax msgpack, atomic)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        blob = flax.serialization.to_bytes(
            {"params": self.params, "opt_state": self.opt_state,
             "step": self.step}
        )
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


def warm_start_from_biencoder(xe_params, bi_params):
    """Graft a trained trunk into a CrossEncoderModel param tree
    (pooler/classifier head stays at init). Accepts any source whose
    BertEncoder lives under the "encoder" key: a trained BiEncoderModel or
    an MLM-pretrained MLMModel (train/mlm.py) — the latter is the one that
    actually rescues from-scratch cross-encoder training (see below).

    The standard retriever->reranker bootstrap: a from-scratch cross-encoder
    must first learn token-identity structure before BCE on a scalar head
    gives any gradient signal about WHICH tokens match — with a random
    trunk it collapses to predicting the label base rate (measured: loss
    pins at the label entropy, acc at the majority class). The trained
    retriever's embeddings already encode identity, so the grafted trunk
    starts where the hard part ends.

    Both configs must agree on hidden/layers/heads/intermediate; shapes may
    differ only along leading axes (e.g. max_position), where the
    overlapping rows are copied and the rest keeps its init.
    """
    import jax

    def merge(s, d):
        s = np.asarray(s)
        d = np.array(d)  # copy — never mutate the init tree in place
        if s.shape == d.shape:
            return s.astype(d.dtype)
        assert s.ndim == d.ndim, (s.shape, d.shape)
        sl = tuple(slice(0, min(a, b)) for a, b in zip(s.shape, d.shape))
        d[sl] = s[sl]
        return d

    out = dict(xe_params)
    out["encoder"] = jax.tree.map(merge, bi_params["encoder"],
                                  xe_params["encoder"])
    return out


def make_triple_batch(tokenizer, queries, docs, labels, max_len=128,
                      pad_to=None):
    """Tokenize (query, doc) pairs with labels -> padded int32 arrays +
    float32 label vector. Pair encoding: [CLS] q [SEP] d [SEP] with token
    types, the cross-encoder input layout (models/tokenizer.py)."""
    from review_recommender_tpu.models.tokenizer import encode_batch

    ids, mask, ttype = encode_batch(tokenizer, queries, pairs=docs,
                                    max_len=max_len, pad_to=pad_to)
    return ids, mask, ttype, np.asarray(labels, np.float32)


def train_crossencoder(
    trainer: CrossEncoderTrainer,
    triples,
    tokenizer,
    *,
    batch_size: int = 32,
    epochs: int = 1,
    max_len: int = 128,
    seed: int = 0,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    log_every: int = 50,
):
    """Epoch loop over (query, doc, label) triples; shuffled, fixed pad width
    (one compiled step). Resume-aware: skips the first trainer.step batches
    (identical shuffle stream) so a restored checkpoint continues the
    killed run; checkpoint_every > 0 saves mid-run every N steps. Returns
    per-step metrics history."""
    import logging

    logger = logging.getLogger(__name__)
    rng = np.random.default_rng(seed)
    history = []
    n = len(triples)
    produced = 0
    for _ in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n, batch_size):
            sel = order[lo : lo + batch_size]
            if len(sel) < batch_size:
                break
            produced += 1
            if produced <= trainer.step:
                continue
            qs = [triples[i][0] for i in sel]
            ds = [triples[i][1] for i in sel]
            ys = [triples[i][2] for i in sel]
            batch = make_triple_batch(tokenizer, qs, ds, ys, max_len=max_len,
                                      pad_to=max_len)
            m = trainer.train_step_async(*batch)  # no per-step device sync
            history.append(m)
            if log_every and m["step"] % log_every == 0:
                logger.info("step %d loss %.4f acc %.3f", m["step"],
                            float(m["loss"]), float(m["acc"]))
            if (checkpoint_path is not None and checkpoint_every
                    and m["step"] % checkpoint_every == 0):
                trainer.save(checkpoint_path)
    history = [{k: v if k == "step" else float(v) for k, v in m.items()}
               for m in history]
    if checkpoint_path is not None:
        trainer.save(checkpoint_path)
    return history
