"""Contrastive bi-encoder training: in-batch-negative InfoNCE over a dp x tp
device mesh.

The reference has no training at all — its encoders are frozen HF downloads
and its only "training" analog is the offline embedding batch job
(/root/reference/nlp/11_build_product_embeddings.py). This module adds the
capability the reference lacks: fine-tuning the retrieval tower on
(query, positive-doc) pairs mined from the review corpus, so the index
embeddings can be domain-adapted on TPU.

Parallelism:
  dp — batch axis. Each group of chips takes a slice of the pair batch;
       gradients are averaged by XLA (the loss is a mean over the global
       batch; jit + sharded inputs insert the psum).
  tp — tensor axis. Attention q/k/v and FFN kernels are column/row split
       (Megatron layout): qkv/intermediate kernels shard their OUTPUT dim,
       the following projection shards its INPUT dim, so each pair of
       matmuls needs one reduce at the end, which XLA inserts.

In-batch negatives make the (B, B) similarity logits a genuinely global
computation — with dp-sharded towers the q @ d^T matmul becomes an
all-gather over dp, exactly the collective a production contrastive trainer
wants on ICI.
"""
from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from review_recommender_tpu.models.bert import BertConfig, BiEncoderModel


# --------------------------------------------------------------------- config
@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    temperature: float = 0.05  # bge-style InfoNCE temperature
    max_grad_norm: float = 1.0
    remat: bool = False  # jax.checkpoint per layer: trade FLOPs for HBM
    seed: int = 0
    #: when total_steps > 0, learning_rate becomes the PEAK of a linear
    #: warmup + cosine decay schedule (the standard BERT fine-tune shape;
    #: from-scratch tiny towers need the warmup to not diverge at high lr)
    total_steps: int = 0
    warmup_steps: int = 0


def make_lr(tc) -> "optax.Schedule | float":
    """Constant lr, or warmup+cosine when tc.total_steps is set."""
    if getattr(tc, "total_steps", 0) and tc.total_steps > 0:
        warmup = tc.warmup_steps or max(1, tc.total_steps // 10)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=tc.learning_rate,
            warmup_steps=warmup, decay_steps=tc.total_steps,
            end_value=0.05 * tc.learning_rate,
        )
    return tc.learning_rate


# ----------------------------------------------------------- sharding rules
# (path regex, PartitionSpec) — first match wins. Megatron-style tp split.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"attention/(query|key|value)/kernel$", P(None, "tp")),
    (r"attention/(query|key|value)/bias$", P("tp")),
    (r"attention/output_dense/kernel$", P("tp", None)),
    (r"/intermediate/kernel$", P(None, "tp")),
    (r"/intermediate/bias$", P("tp")),
    (r"layer_\d+/output/kernel$", P("tp", None)),
    (r"word_embeddings/embedding$", P("tp", None)),  # vocab-sharded
)


def param_specs(params) -> Any:
    """PartitionSpec pytree for the bi-encoder params under TP_RULES
    (everything unmatched is replicated)."""

    def spec_for(path, _leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pat, spec in TP_RULES:
            if re.search(pat, name):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to TP_RULES."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


# -------------------------------------------------------------------- trainer
class ContrastiveTrainer:
    """InfoNCE trainer for the BiEncoderModel tower."""

    def __init__(
        self,
        cfg: BertConfig,
        params,
        *,
        train_cfg: Optional[TrainConfig] = None,
        mesh: Optional[Mesh] = None,
        dtype=jnp.bfloat16,
        pooling: str = "cls",
    ):
        self.cfg = cfg
        self.tc = train_cfg or TrainConfig()
        # mesh-jitted training pins XLA attention: GSPMD cannot partition a
        # pallas_call over the tp-sharded head axis (see train/mlm.py note)
        self.model = BiEncoderModel(cfg, dtype=dtype, pooling=pooling,
                                    remat=self.tc.remat,
                                    attn_impl="xla" if mesh is not None
                                    else "auto")
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
            self._step_fn = jax.jit(
                self._train_step,
                in_shardings=(None, None, batch_sharding, batch_sharding,
                              batch_sharding, batch_sharding),
            )
        else:
            self._step_fn = jax.jit(self._train_step)

    # loss: symmetric InfoNCE with in-batch negatives
    def _loss(self, params, q_ids, q_mask, d_ids, d_mask):
        apply = lambda ids, mask: self.model.apply({"params": params}, ids, mask)
        zq = apply(q_ids, q_mask)  # (B, H), L2-normalized by the model
        zd = apply(d_ids, d_mask)
        logits = (zq @ zd.T) / jnp.float32(self.tc.temperature)  # (B, B)
        labels = jnp.arange(logits.shape[0])
        l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        loss = 0.5 * (l_qd.mean() + l_dq.mean())
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        return loss, acc

    def _train_step(self, params, opt_state, q_ids, q_mask, d_ids, d_mask):
        (loss, acc), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, q_ids, q_mask, d_ids, d_mask
        )
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    def train_step(self, q_ids, q_mask, d_ids, d_mask) -> Dict[str, float]:
        """One step on a (query, positive-doc) token batch. Returns metrics
        (blocks on the device for the values)."""
        m = self.train_step_async(q_ids, q_mask, d_ids, d_mask)
        return {k: v if k == "step" else float(v) for k, v in m.items()}

    def train_step_async(self, q_ids, q_mask, d_ids, d_mask) -> Dict:
        """Like train_step but metrics stay device arrays — no blocking
        readback per step. On a tunneled TPU a per-step sync costs a full
        RPC round trip (~28 ms here); loops that only LOG every N steps
        should dispatch async and materialize at the log points
        (utils like train_biencoder/pretrain_mlm do)."""
        self.params, self.opt_state, loss, acc = self._step_fn(
            self.params, self.opt_state,
            jnp.asarray(q_ids), jnp.asarray(q_mask),
            jnp.asarray(d_ids), jnp.asarray(d_mask),
        )
        self.step += 1
        return {"loss": loss, "in_batch_acc": acc, "step": self.step}

    # ------------------------------------------------------------- checkpoint
    def save(self, path: str | Path) -> None:
        """Serialize params + opt state + step (flax msgpack)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        blob = flax.serialization.to_bytes(
            {"params": self.params, "opt_state": self.opt_state,
             "step": self.step}
        )
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(blob)
        tmp.replace(path)  # atomic: resume never sees a torn file

    def restore(self, path: str | Path) -> None:
        target = {"params": self.params, "opt_state": self.opt_state,
                  "step": self.step}
        state = flax.serialization.from_bytes(target, Path(path).read_bytes())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.step = int(state["step"])
        if self.mesh is not None:
            self.params = shard_params(self.params, self.mesh)


def make_pair_batch(tokenizer, queries, docs, max_len=128, pad_to=None):
    """Tokenize a (query, positive) pair batch -> padded int32 arrays."""
    from review_recommender_tpu.models.tokenizer import encode_batch

    q_ids, q_mask, _ = encode_batch(tokenizer, queries, max_len=max_len, pad_to=pad_to)
    d_ids, d_mask, _ = encode_batch(tokenizer, docs, max_len=max_len, pad_to=pad_to)
    return q_ids, q_mask, d_ids, d_mask
