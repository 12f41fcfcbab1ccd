"""Head-geometry experiment: what does widening attention heads buy?

evals_out/roofline.md puts the tower forwards at ~32-76% of their MXU
bound, and examples/tower_speed.py ruled out the f32 LayerNorm / weight
casts — the residual gap is structural: hd=32 heads (HF bge-small /
MiniLM geometry) tile the 128-wide MXU at 1/4 occupancy in the
(S, hd) @ (hd, S) logit and (S, S) @ (S, hd) context matmuls
(ROADMAP gap #8).

This measures the SAME 6L/384H cross-encoder forward with heads in
{12, 6, 3} (hd 32 / 64 / 128) at the rerank shape (B=64, S=512), XLA
attention. Param count is identical across variants (QKV/output
projections are (H, H) regardless of the split), so this isolates pure
head-tiling efficiency. HF-converted towers cannot change geometry
(checkpoint parity), but the FROM-SCRATCH trained towers (rrt train, the
canonical quality lane) already pick hidden//64 heads — this experiment
is the measured justification, and says whether hd=128 would be better
still.

Run on the chip: python examples/head_geometry.py

MEASURED RESULT (round 5, v5e, B=64 S=512, 6L/384H cross-encoder,
20-step in-program pair medians — evals_out/head_geometry.json):

    heads=12 (hd= 32, HF geometry)  17.511 ms   24.7% of MXU bound
    heads= 6 (hd= 64)               10.522 ms   41.0%
    heads= 3 (hd=128)                7.408 ms   58.3%

Head geometry IS the structural gap tower_speed.py pointed at: widening
heads 32 -> 128 is 2.36x at identical parameter count. HF-converted
towers keep hd=32 (checkpoint parity is the contract); from-scratch
trained towers (rrt train) default to hd=64 — measured 1.66x over the
HF geometry — with `--head-dim 128` available where serving speed
outranks head diversity.
"""
from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _chain_ms, _roofline  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from review_recommender_tpu.models.bert import (
        BertConfig,
        CrossEncoderModel,
        init_crossencoder,
    )

    b, s = 64, 512
    base = BertConfig.minilm_l6_cross()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, base.vocab_size, (b, s)), jnp.int32)
    mask = jnp.asarray(
        np.where(np.arange(s)[None, :]
                 < rng.integers(s // 2, s + 1, b)[:, None], 1, 0),
        jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32)

    h = base.hidden_size
    # forward FLOPs (per the roofline.md tower model): 4 H^2 + 2 H I per
    # token for projections+FFN, + attention 2*2*S*hd per head per token
    flops_proj = b * s * (4 * h * h * 2 + 2 * 2 * h * base.intermediate_size)
    flops_attn = b * s * s * h * 2 * 2  # logits + context, all heads
    flops = base.num_layers * (flops_proj + flops_attn)

    for heads in (12, 6, 3):
        cfg = dataclasses.replace(base, num_heads=heads)
        _, params = init_crossencoder(cfg, seed=0)
        model = CrossEncoderModel(cfg, dtype=jnp.bfloat16, attn_impl="xla")

        def step(x_ids, model=model, params=params):
            out = model.apply({"params": params}, x_ids, mask, tt)
            return x_ids + (out[:1].astype(jnp.float32) * 1e-12).astype(
                jnp.int32)

        ms = _chain_ms(step, ids, lo=3, hi=23)
        print(json.dumps({
            "heads": heads, "head_dim": h // heads,
            "ms": round(ms, 3),
            "roofline": _roofline(ms, flops=flops,
                                  bytes_moved=b * s * h * 2 * 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
