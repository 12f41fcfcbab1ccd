"""Tower-forward speed experiment: where do the missing MXU percent go?

evals_out/roofline.md puts the 6L cross-encoder forward at ~32% of its
MXU bound (13.6 ms vs 4.3 ms at B=64 S=512). The matmuls themselves are
fine — the suspects are the per-layer f32 round trips: every layer
up-casts its (B, S, H) residual tensor to f32 TWICE for LayerNorm
(50 MB/tensor at this shape) and streams its weights as f32
(param_dtype=float32, cast to bf16 per call).

This measures, with the jitter-immune in-program chain (bench._chain_ms):
  1. baseline       — ln f32, params f32 (the serving default)
  2. ln_bf16        — BertConfig.ln_dtype="bfloat16"
  3. params_bf16    — weights pre-cast to bf16 (halves weight HBM bytes)
  4. both
and reports max |Δlogit| of each variant against an all-f32 reference,
so the speed/accuracy trade is measured, not guessed.

Run on the chip: python examples/tower_speed.py

MEASURED RESULT (round 4, v5e, B=64 S=512, 6L cross-encoder, 20-step
in-program pair medians):

    baseline (ln f32, params f32)  13.658 ms   dlogit 0.013 (bf16 acts)
    ln_bf16                        13.474 ms   dlogit 0.013
    params_bf16                    13.465 ms   dlogit 0.016
    both                           13.557 ms   dlogit 0.016

The f32 LayerNorm round trips and f32 weight streaming are NOT where the
time goes — every variant is within ~1.5% (run noise); XLA already
fuses/overlaps those casts under the matmuls. The ~3x-from-bound gap is
structural: hd=32 attention heads tile the 128-wide MXU at 1/4 occupancy
and the K=384 projections are skinny against the 128x128 tiles. The f32
defaults therefore stay (free accuracy); ln_dtype remains available as a
config knob with a measured do-nothing result.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _chain_ms  # noqa: E402


def main() -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from review_recommender_tpu.models.bert import (
        BertConfig,
        CrossEncoderModel,
        init_crossencoder,
    )

    b, s = 64, 512
    cfg = BertConfig.minilm_l6_cross()
    _, params = init_crossencoder(cfg, seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size, (b, s)), jnp.int32)
    mask = jnp.asarray(
        np.where(np.arange(s)[None, :] < rng.integers(s // 2, s + 1, b)[:, None],
                 1, 0), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32)

    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)

    # all-f32 reference for the accuracy column
    ref_model = CrossEncoderModel(cfg, dtype=jnp.float32)
    ref = np.asarray(ref_model.apply({"params": params}, ids, mask, tt),
                     np.float64)

    variants = [
        ("baseline (ln f32, params f32)", cfg, params),
        ("ln_bf16", dataclasses.replace(cfg, ln_dtype="bfloat16"), params),
        ("params_bf16", cfg, params_bf16),
        ("both", dataclasses.replace(cfg, ln_dtype="bfloat16"), params_bf16),
    ]
    for name, c, p in variants:
        model = CrossEncoderModel(c, dtype=jnp.bfloat16)

        def fwd(x_ids, p=p, model=model):
            return model.apply({"params": p}, x_ids, mask, tt)

        # chain via the ids: fold the logit back into a token id delta of 0
        # (logits are tiny; int cast of 1e-6*logit is 0 — pure dependency)
        def step(x_ids, fwd=fwd):
            out = fwd(x_ids)
            return x_ids + (out[:1].astype(jnp.float32) * 1e-12).astype(
                jnp.int32)

        ms = _chain_ms(step, ids, lo=3, hi=23)
        got = np.asarray(fwd(ids), np.float64)
        print(json.dumps({
            "variant": name,
            "ms": round(ms, 3),
            "max_abs_dlogit_vs_f32": round(float(np.abs(got - ref).max()), 5),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
