"""Fused-MHA kernel variants: chasing the timing instability (ROADMAP #7).

The production kernel (ops/pallas/attention_kernel.py) runs a (B, H) grid
with one (S, S) logits tile per program. Round-4 observation: its timing
wobbles 0.48-3.9 ms across runs at the rerank shape (B=64, S=512, H=12,
D=32) while the XLA einsum path holds 2.0-2.9 ms — suspects are Mosaic's
default grid scheduling and VMEM pressure at 768 tiny programs per call.

This measures, with the jitter-immune in-program chain (bench._chain_ms),
five variants against the XLA reference:

  xla          einsum attention (mha_xla) — the fallback path
  base         production kernel as-is (no compiler_params)
  dimsem       dimension_semantics=("parallel", "parallel") — tells Mosaic
               both grid axes are order-free, enabling better pipelining
  vmem_cap     vmem_limit_bytes=100 MiB — lifts the default ~32 MiB cap so
               the scheduler can double-buffer more aggressively
  heads_fused  grid (B,): all 12 heads of one batch row in ONE program as
               batched dot_generals (logits (12, 512, 512) f32 = 12 MiB in
               VMEM) — 64 fat programs instead of 768 thin ones, so grid
               overhead amortizes and the MXU sees batched matmuls

Every variant is checked for numerical parity against mha_xla (max |diff|
reported); a variant that wins on speed but diverges numerically is not a
candidate. Run on the chip: python examples/mha_variants.py

Reference analog: the torch CPU attention inside
/root/reference/app/app_product_search.py:251,277-278.

STATUS: measurement pending — the axon tunnel entered one of its known
full outages (ROADMAP.md handoff note) while this experiment was queued;
the numbers go here when a run completes on live hardware. Until then
the production kernel stays as-is and this file is the ready-to-run
harness, not a record.
"""
from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _chain_ms  # noqa: E402


def _build_variants():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from review_recommender_tpu.ops.pallas.attention_kernel import (
        _mha_kernel,
        mha_pallas,
        mha_xla,
    )

    def grid_variant(compiler_params):
        """Production kernel layout with explicit compiler_params."""

        @functools.partial(jax.jit, static_argnames=("num_heads",))
        def run(q, k, v, key_bias, num_heads):
            b, s, hd = q.shape
            d = hd // num_heads
            to_heads = lambda t: (
                t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3))
            qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
            head_spec = pl.BlockSpec(
                (1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM)
            ctx = pl.pallas_call(
                _mha_kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (b, num_heads, s, d), q.dtype),
                grid=(b, num_heads),
                in_specs=[
                    pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    head_spec, head_spec, head_spec,
                ],
                out_specs=head_spec,
                compiler_params=compiler_params,
                # same cost estimate as the production kernel
                # (attention_kernel.py mha_pallas) so compiler_params is
                # the ONLY delta vs 'base' (ADVICE r4)
                cost_estimate=pl.CostEstimate(
                    flops=4 * b * num_heads * s * s * d,
                    bytes_accessed=(4 * b * s * hd * q.dtype.itemsize
                                    + 4 * b * s),
                    transcendentals=b * num_heads * s * s,
                ),
            )(key_bias.astype(jnp.float32).reshape(b, 1, s), qh, kh, vh)
            return ctx.transpose(0, 2, 1, 3).reshape(b, s, hd)

        return run

    def _heads_fused_kernel(bias_ref, q_ref, k_ref, v_ref, out_ref):
        # One batch row, ALL heads: batched dot_general over the head dim.
        q = q_ref[0]  # (H, S, D)
        k = k_ref[0]
        v = v_ref[0]
        d = q.shape[-1]
        scale = 1.0 / jnp.sqrt(jnp.float32(d))
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (H, S, S) f32
        logits = logits + bias_ref[0][:, None, :]  # (1, S) over queries
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        ctx = jax.lax.dot_general(
            probs, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)  # (H, S, D)
        out_ref[0] = ctx

    @functools.partial(jax.jit, static_argnames=("num_heads",))
    def heads_fused(q, k, v, key_bias, num_heads):
        b, s, hd = q.shape
        d = hd // num_heads
        to_heads = lambda t: (
            t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3))
        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        row_spec = pl.BlockSpec(
            (1, num_heads, s, d), lambda bi: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM)
        ctx = pl.pallas_call(
            _heads_fused_kernel,
            out_shape=jax.ShapeDtypeStruct((b, num_heads, s, d), q.dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 1, s), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                row_spec, row_spec, row_spec,
            ],
            out_specs=row_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 2**20,
            ),
        )(key_bias.astype(jnp.float32).reshape(b, 1, s), qh, kh, vh)
        return ctx.transpose(0, 2, 1, 3).reshape(b, s, hd)

    return {
        "xla": mha_xla,
        "base": lambda q, k, v, bias, h: mha_pallas(q, k, v, bias, h),
        "dimsem": grid_variant(pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"))),
        "vmem_cap": grid_variant(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20)),
        "heads_fused": heads_fused,
    }


def main() -> int:
    import jax.numpy as jnp

    variants = _build_variants()
    ab, as_, heads, hd = 64, 512, 12, 384
    rng = np.random.default_rng(3)
    mk = lambda: jnp.asarray(rng.standard_normal((ab, as_, hd)),
                             jnp.bfloat16)
    q0, kk, vv = mk(), mk(), mk()
    lens = rng.integers(as_ // 2, as_ + 1, size=ab)
    bias = jnp.asarray(
        np.where(np.arange(as_)[None, :] < lens[:, None], 0.0, -1e30),
        jnp.float32)

    ref = np.asarray(variants["xla"](q0, kk, vv, bias, heads),
                     dtype=np.float32)
    out = {}
    # ONE compile per variant (Mosaic kernels never hit the persistent
    # cache, so compiles dominate wall time); jitter immunity comes from
    # _chain_ms's own interleaved (lo, hi) pair medians, not from extra
    # outer rounds.
    for name, f in variants.items():
        print(f"# measuring {name} ...", flush=True)
        step = (lambda q, f=f:
                q + f(q, kk, vv, bias, heads) * jnp.bfloat16(1e-6))
        ms = round(_chain_ms(step, q0, lo=10, hi=110), 3)
        d = float(np.abs(np.asarray(
            f(q0, kk, vv, bias, heads), dtype=np.float32) - ref).max())
        out[name] = {"median_ms": ms, "max_abs_diff_vs_xla": round(d, 4)}
        print(json.dumps({"variant": name, **out[name]}, sort_keys=True),
              flush=True)
    base = out["base"]["median_ms"]
    best = min(out, key=lambda n: out[n]["median_ms"])
    print(json.dumps({
        "shape": {"B": ab, "S": as_, "H": heads, "D": hd // heads},
        "best": best,
        # both ratios are base/variant: >1 means the variant beats base
        # (consistent direction, ADVICE r4)
        "base_over_best": round(base / out[best]["median_ms"], 3),
        "base_over_xla": round(base / out["xla"]["median_ms"], 3),
    }, sort_keys=True), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
