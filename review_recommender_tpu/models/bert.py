"""BERT-family encoder in pure JAX/flax — the compute path for both query
models of the engine:

  - bi-encoder  BAAI/bge-small-en-v1.5         (12L, H=384, CLS pooling)
  - cross-encoder cross-encoder/ms-marco-MiniLM-L-6-v2 (6L, H=384, pooler+1-logit head)

The reference runs these through sentence-transformers/torch on CPU
(/root/reference/app/app_product_search.py:53-86, :251, :277-278); here the
forward is one jitted XLA program per (batch, seq) bucket so the MXU does the
matmuls in bf16 with f32 accumulation. Weights are converted from HF torch
state dicts (models/convert.py); nothing at runtime depends on torch.

TPU notes:
  - all matmuls go through nn.Dense/einsum with dtype=bfloat16 activations
    and param_dtype=float32; XLA fuses bias+gelu into the matmuls.
  - softmax and LayerNorm run in float32 for numerical parity with the
    reference's CPU float32 path.
  - static (batch, seq) shapes; callers bucket-pad (models/encoder.py) so at
    most a handful of programs are ever compiled.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

ACT = {"gelu": nn.gelu, "relu": nn.relu}


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    pad_token_id: int = 0
    # LayerNorm compute dtype. float32 (default) is the HF-parity /
    # training-safe choice; bfloat16 removes the f32 up-cast round trips
    # of every (B, S, H) residual tensor (2 LNs/layer) — an
    # inference-serving knob, measured in examples/tower_speed.py.
    ln_dtype: str = "float32"

    @classmethod
    def bge_small(cls) -> "BertConfig":
        return cls()  # defaults are bge-small-en-v1.5

    @classmethod
    def minilm_l6_cross(cls) -> "BertConfig":
        return cls(num_layers=6)

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "BertConfig":
        """Small config for tests."""
        return cls(
            vocab_size=vocab_size, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position=64,
        )


class SelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype
    attn_impl: str = "auto"  # 'xla' | 'pallas' | 'auto' (pallas on TPU)

    @nn.compact
    def __call__(self, x, key_bias):
        from review_recommender_tpu.ops.pallas.attention_kernel import (
            multihead_attention,
        )

        c = self.cfg
        dense = lambda name: nn.Dense(
            c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        # key_bias: (B, S) f32 additive mask over key positions. The fused
        # path (ops/pallas/attention_kernel.py) keeps the (S, S) logits in
        # VMEM; the XLA path is the identical einsum math.
        ctx = multihead_attention(
            dense("query")(x), dense("key")(x), dense("value")(x),
            key_bias, c.num_heads, impl=self.attn_impl,
        )
        out = nn.Dense(
            c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
            name="output_dense",
        )(ctx)
        return out


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        if c.ln_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"ln_dtype={c.ln_dtype!r} (expected 'float32'/'bfloat16') "
                "— a typo here would silently degrade LayerNorm numerics")
        ln_dt = jnp.float32 if c.ln_dtype == "float32" else jnp.bfloat16
        ln = lambda name: nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=ln_dt,
            param_dtype=jnp.float32, name=name,
        )
        attn_out = SelfAttention(c, self.dtype, self.attn_impl,
                                 name="attention")(x, attn_bias)
        x = ln("attention_layer_norm")((x + attn_out).astype(ln_dt))
        x = x.astype(self.dtype)

        h = nn.Dense(
            c.intermediate_size, dtype=self.dtype, param_dtype=jnp.float32,
            name="intermediate",
        )(x)
        h = ACT[c.hidden_act](h)
        h = nn.Dense(
            c.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
            name="output",
        )(h)
        x = ln("output_layer_norm")((x + h).astype(ln_dt))
        return x.astype(self.dtype)


class BertEncoder(nn.Module):
    """Token ids -> per-token hidden states (B, S, H).

    remat=True wraps each layer in jax.checkpoint: activations are
    recomputed in the backward pass instead of stored, cutting training
    activation memory from O(layers) to O(1) layers — the standard TPU
    trade of FLOPs for HBM when fine-tuning with big batches."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        c = self.cfg
        B, S = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        emb = lambda n, name: nn.Embed(
            n, c.hidden_size, dtype=jnp.float32, param_dtype=jnp.float32,
            name=name,
        )
        positions = jnp.arange(S)[None, :]
        x = (
            emb(c.vocab_size, "word_embeddings")(input_ids)
            + emb(c.max_position, "position_embeddings")(positions)
            + emb(c.type_vocab_size, "token_type_embeddings")(token_type_ids)
        )
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32,
            param_dtype=jnp.float32, name="embeddings_layer_norm",
        )(x).astype(self.dtype)

        # additive attention bias in f32 over KEY positions: 0 keep,
        # big-negative drop. (B, S); heads/query axes broadcast downstream.
        attn_bias = jnp.where(
            attention_mask.astype(bool), 0.0, -1e30
        ).astype(jnp.float32)

        layer_cls = nn.remat(BertLayer) if self.remat else BertLayer
        for i in range(c.num_layers):
            x = layer_cls(c, self.dtype, self.attn_impl,
                          name=f"layer_{i}")(x, attn_bias)
        return x


class BiEncoderModel(nn.Module):
    """Sentence embedding tower: CLS pooling + L2 norm (bge-small semantics —
    sentence-transformers' `normalize_embeddings=True` path the reference
    uses at app/app_product_search.py:251)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16
    pooling: str = "cls"  # "cls" | "mean"
    remat: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        hidden = BertEncoder(self.cfg, self.dtype, remat=self.remat,
                             attn_impl=self.attn_impl, name="encoder")(
            input_ids, attention_mask, token_type_ids
        ).astype(jnp.float32)
        if self.pooling == "cls":
            pooled = hidden[:, 0, :]
        else:
            m = attention_mask[:, :, None].astype(jnp.float32)
            pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1e-9
            )
        norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
        return pooled / jnp.maximum(norm, 1e-12)


class CrossEncoderModel(nn.Module):
    """(query, doc) pair relevance: BERT -> tanh pooler -> 1 logit
    (HF BertForSequenceClassification head, the ms-marco MiniLM layout)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None):
        hidden = BertEncoder(self.cfg, self.dtype,
                             attn_impl=self.attn_impl, name="encoder")(
            input_ids, attention_mask, token_type_ids
        ).astype(jnp.float32)
        cls = hidden[:, 0, :]
        pooled = nn.tanh(
            nn.Dense(self.cfg.hidden_size, dtype=jnp.float32, name="pooler")(cls)
        )
        logit = nn.Dense(1, dtype=jnp.float32, name="classifier")(pooled)
        return logit[:, 0]


def init_biencoder(cfg: BertConfig, seed: int = 0, dtype=jnp.bfloat16,
                   pooling: str = "cls"):
    model = BiEncoderModel(cfg, dtype=dtype, pooling=pooling)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids, jnp.ones_like(ids))
    return model, params["params"]


def init_crossencoder(cfg: BertConfig, seed: int = 0, dtype=jnp.bfloat16):
    model = CrossEncoderModel(cfg, dtype=dtype)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids, jnp.ones_like(ids))
    return model, params["params"]
