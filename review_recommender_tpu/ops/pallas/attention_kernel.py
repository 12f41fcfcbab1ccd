"""Pallas TPU kernel: fused multi-head attention for the BERT towers.

The XLA path (mha_xla below, the math of models/bert.py:SelfAttention)
materializes the (B, H, S, S) attention logits between the QK^T and PV
matmuls — XLA does not fuse across two contractions. This kernel computes
one (batch, head) attention in VMEM end to end: the (S, S) logits tile
(≤ 1 MB f32 at the towers' max_position=512) never touches HBM. No
online/streaming softmax is needed — the whole row fits — so the kernel
stays a direct transcription of the XLA math and parity is exact op-for-op
(f32 logits + bias, f32 softmax, probs cast to the compute dtype,
f32-accumulated PV).

Measured on the v5e chip at the cross-encoder's rerank shape (B=64, H=12,
D=32), in-program chained loop so tunnel dispatch can't mask program time:
S=512 pallas 1.36 ms vs XLA 2.36 ms (1.74x); S=256 pallas 0.67 vs XLA
0.57 (0.86x — XLA wins when the logits are small). Auto dispatch therefore
fuses only S >= ATTN_PALLAS_MIN_SEQ (default 512); see _pallas_min_seq.
Product level: the full 6-layer cross-encoder forward at (64, 512) drops
18.95 -> 13.99 ms/forward (1.35x), consistent with ~1 ms saved per layer.

Gradients: `multihead_attention` wraps the kernel in a custom_vjp whose
backward re-runs the XLA einsum path under jax.vjp (rematerialized
backward). Training (train/mlm.py, train/cross_encoder.py, contrastive)
therefore works unchanged: fast fused forward, standard XLA backward.

Reference analog: the torch/sentence-transformers CPU attention inside
/root/reference/app/app_product_search.py:251 and :277-278 (the two model
forwards of the query path).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mha_xla(q, k, v, key_bias, num_heads: int):
    """Reference XLA multi-head attention.

    q/k/v: (B, S, H*D) activations (any float dtype; matmuls accumulate in
    f32). key_bias: (B, S) f32 additive mask over KEY positions (0 keep,
    big-negative drop). Returns (B, S, H*D) in q.dtype.
    """
    b, s, hd = q.shape
    d = hd // num_heads
    split = lambda t: t.reshape(b, s, num_heads, d)
    qh, kh, vh = split(q), split(k), split(v)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    logits = logits + key_bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, vh, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return ctx.reshape(b, s, hd)


def _mha_kernel(bias_ref, q_ref, k_ref, v_ref, out_ref):
    """One (batch, head) attention, entirely in VMEM.

    bias_ref: (1, 1, S) f32. q/k/v/out refs: (1, 1, S, D)."""
    q = q_ref[0, 0]  # (S, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    # QK^T with f32 accumulation: contract the D axis of both operands.
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (S, S) f32
    logits = logits + bias_ref[0]  # (1, S) broadcasts over query rows
    # Row softmax in f32 (stable); rows that are all-masked come out
    # uniform, same as the XLA path — downstream pooling ignores them.
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    ctx = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)  # (S, D)
    out_ref[0, 0] = ctx


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def mha_pallas(q, k, v, key_bias, num_heads: int, interpret: bool = False):
    """Fused attention. Same contract as mha_xla.

    Layout: the (B, S, H*D) dense outputs are transposed to (B, H, S, D)
    once on the XLA side (~2% of the HBM traffic the fusion saves), then a
    (B, H) grid runs one program per head with the (S, S) logits resident
    in VMEM.
    """
    b, s, hd = q.shape
    d = hd // num_heads
    to_heads = lambda t: t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)

    head_spec = pl.BlockSpec(
        (1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    ctx = pl.pallas_call(
        _mha_kernel,
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s, d), q.dtype),
        grid=(b, num_heads),
        in_specs=[
            # bias block is constant across the inner (head) grid axis, so
            # Mosaic re-fetches it once per batch row, not per program.
            # (B, 1, S) layout: the block's trailing (1, S) dims equal the
            # array dims, satisfying the TPU (8, 128)-divisibility rule.
            pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            head_spec, head_spec, head_spec,
        ],
        out_specs=head_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * d,
            bytes_accessed=4 * b * s * hd * q.dtype.itemsize + 4 * b * s,
            transcendentals=b * num_heads * s * s,
        ),
    )(key_bias.astype(jnp.float32).reshape(b, 1, s), qh, kh, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _mha_pallas_vjp(q, k, v, key_bias, num_heads, interpret):
    return mha_pallas(q, k, v, key_bias, num_heads, interpret=interpret)


def _mha_fwd(q, k, v, key_bias, num_heads, interpret):
    out = mha_pallas(q, k, v, key_bias, num_heads, interpret=interpret)
    return out, (q, k, v, key_bias)


def _mha_bwd(num_heads, interpret, res, g):
    # Rematerialized backward: re-run the XLA einsum attention under vjp.
    # Costs one extra XLA attention forward but needs no kernel backward,
    # and keeps training numerics on the well-tested path.
    q, k, v, key_bias = res
    _, pullback = jax.vjp(
        lambda q_, k_, v_, b_: mha_xla(q_, k_, v_, b_, num_heads),
        q, k, v, key_bias,
    )
    return pullback(g)


_mha_pallas_vjp.defvjp(_mha_fwd, _mha_bwd)


_TPU_PLATFORMS = ("tpu", "axon")


def _platform() -> str:
    try:
        return jax.devices()[0].platform.lower()
    except Exception:  # pragma: no cover - backend probe failure
        return "unknown"


def resolve_attn_impl(impl: str = "auto") -> str:
    """'auto' -> 'pallas' on TPU platforms when USE_PALLAS is on, 'xla'
    otherwise (platform ALLOWLIST, matching engine/search.py:_pallas_ok —
    unknown future backends fall back to XLA, they don't crash into a
    Mosaic kernel). ATTN_IMPL env overrides everything (serving knob, read
    live); config.Config.ATTN_IMPL is the .env-layered default beneath it.
    USE_PALLAS uses config.py's parsing (only "true" enables) so the two
    Pallas consumers in one process can't disagree about the same var."""
    from review_recommender_tpu.config import Config, _env_bool

    env = os.environ.get("ATTN_IMPL", "").strip().lower()
    if env in ("xla", "pallas"):
        return env
    if impl in ("xla", "pallas"):
        return impl
    cfg_impl = str(getattr(Config, "ATTN_IMPL", "auto")).strip().lower()
    if cfg_impl in ("xla", "pallas"):
        return cfg_impl
    if not _env_bool("USE_PALLAS", "true"):
        return "xla"
    return "pallas" if _platform() in _TPU_PLATFORMS else "xla"


def _pallas_min_seq() -> int:
    """Auto-mode sequence-length floor for the fused kernel. Measured on
    the v5e chip (in-program chained loop, B=64, H=12, D=32): S=512 pallas
    1.36 ms vs XLA 2.36 ms (1.74x); S=256 pallas 0.67 vs XLA 0.57 (0.86x)
    — below ~512 the logits are small enough that XLA's pipelining wins,
    so auto only fuses the top bucket."""
    try:
        return int(os.environ.get("ATTN_PALLAS_MIN_SEQ", "512"))
    except ValueError:
        return 512


def _choose_impl(impl: str, seq_len: int) -> str:
    """Final dispatch decision: resolve env/backend, then apply the
    sequence-length gate in auto mode (an explicit impl= or ATTN_IMPL env
    is a forced choice and skips the gate)."""
    env = os.environ.get("ATTN_IMPL", "").strip().lower()
    forced = env in ("xla", "pallas") or impl in ("xla", "pallas")
    chosen = resolve_attn_impl(impl)
    if chosen == "pallas" and not forced and seq_len < _pallas_min_seq():
        return "xla"
    return chosen


def multihead_attention(q, k, v, key_bias, num_heads: int,
                        impl: str = "auto", interpret: bool = False):
    """Dispatching MHA: the single attention entry point of models/bert.py.

    impl: 'xla' | 'pallas' | 'auto' (env ATTN_IMPL wins; auto = pallas on
    TPU backends for S >= ATTN_PALLAS_MIN_SEQ, the measured win region).
    The pallas path is differentiable via a rematerialized XLA backward.
    """
    if _choose_impl(impl, q.shape[1]) == "pallas":
        # Forced-pallas on a non-TPU platform (tests) runs the kernel in
        # interpret mode; on TPU the compiled kernel runs as-is.
        interpret = interpret or _platform() not in _TPU_PLATFORMS
        return _mha_pallas_vjp(q, k, v, key_bias, num_heads, interpret)
    return mha_xla(q, k, v, key_bias, num_heads)
