"""Stripe-count sweep for the fused dense score+pool scan.

The scan pool (ops/dense.py:dense_striped_topk_scan) sits at ~46% of its
HBM bound at the headline shape (evals_out/roofline.md). The stripe count
G trades three costs against each other:

  - carry residency: the (B, G) f32 best + (B, G) i32 argmax carries live
    across scan steps; total carry bytes = B*G*8. Small enough for VMEM
    (v5e ~128 MiB) they never touch HBM; too large and every slice pays a
    spill round trip that can exceed the corpus read itself.
  - slice count s = N/G: more slices = more fold steps for XLA to
    software-pipeline under the matmuls (good) but also more carry
    rewrites if spilled (bad).
  - pool recall: ~1 - pool/(2G); G >= 8192 keeps it >0.99 at pool=150.

This sweeps G at the headline shape with the jitter-immune in-program
chain (bench._chain_ms) and prints one JSON line per point, bf16 and
int8. Run on the chip: python examples/scan_pool_tuning.py

MEASURED RESULT (round 4, v5e, N=200k B=128): stripe count is a FLAT
knob — G=8192 and G=32768 both sit at 0.27-0.29 ms/step when verified
with long chains (10 vs 100 trips; a short-chain sweep printed a
physically-impossible 0.046 ms at G=32768 — sub-ms kernels need >50-step
differences for the pair-median to beat this box's RPC jitter, hence the
lo/hi below). int8 scan measured SLOWER than bf16 at every G (0.48-0.55
vs 0.38 ms at the default) — the MXU doesn't deliver its nominal 2x int8
rate on these skinny-K shapes (matches the int8-tower negative result in
ROADMAP.md); int8's value is HBM capacity, not speed. The bf16 scan at
~70% of its HBM bound is effectively done; DENSE_POOL_STRIPES=8192 stays
the default.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _chain_ms, _roofline  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from review_recommender_tpu.ops.dense import (
        dense_striped_topk_scan,
        dense_striped_topk_scan_int8,
        quantize_corpus_int8,
        slice_corpus_for_striped,
        slice_corpus_for_striped_int8,
    )

    n, d, b, pool = 200_000, 384, 128, 150
    rng = np.random.default_rng(0)
    emb_f = rng.standard_normal((n, d)).astype(np.float32)
    emb_f /= np.linalg.norm(emb_f, axis=1, keepdims=True)
    valid = jnp.ones((n,), jnp.bool_)
    qv = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    qv32 = jnp.asarray(np.asarray(qv, np.float32))
    emb = jnp.asarray(emb_f, jnp.bfloat16)
    emb_q, row_scale = quantize_corpus_int8(jnp.asarray(emb_f))

    # 2048/4096 excluded: s=N/G of 49-98 fully-unrolled slices makes
    # XLA compile the scan body that many times (minutes per point)
    for stripes in (8192, 16384, 32768, 65536):
        emb_s, valid_s = slice_corpus_for_striped(emb, valid, stripes)

        def step(q, emb_s=emb_s, valid_s=valid_s):
            s, _ = jax.vmap(lambda qq: dense_striped_topk_scan(
                emb_s, valid_s, qq, pool))(q)
            return q + s[:, :1].astype(q.dtype) * jnp.bfloat16(1e-6)

        ms = _chain_ms(step, qv, lo=10, hi=60)
        print(json.dumps({
            "kernel": "scan bf16", "stripes": stripes,
            "carry_mib": round(b * stripes * 8 / 2**20, 1),
            "ms": round(ms, 3),
            "roofline": _roofline(ms, flops=2 * b * n * d,
                                  bytes_moved=n * d * 2),
        }), flush=True)

        emb_qs, scale_s, valid_qs = slice_corpus_for_striped_int8(
            emb_q, row_scale, valid, stripes)

        def step8(q, emb_qs=emb_qs, scale_s=scale_s, valid_qs=valid_qs):
            s, _ = jax.vmap(lambda qq: dense_striped_topk_scan_int8(
                emb_qs, scale_s, valid_qs, qq, pool))(q)
            return q + s[:, :1] * 1e-6

        ms8 = _chain_ms(step8, qv32, lo=10, hi=60)
        print(json.dumps({
            "kernel": "scan int8", "stripes": stripes,
            "carry_mib": round(b * stripes * 8 / 2**20, 1),
            "ms": round(ms8, 3),
            "roofline": _roofline(ms8, flops=2 * b * n * d,
                                  bytes_moved=n * d * 1 + n * 4),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
