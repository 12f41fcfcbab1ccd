#!/usr/bin/env python3
"""Pin or demote the Pallas MHA auto-dispatch (VERDICT r4 item 4).

ROADMAP gap #7: the fused MHA kernel measured 0.48-3.9 ms run-to-run at
B=64 S=512 while XLA held 2.0-2.9 ms — auto-dispatch fuses at S>=512 on a
kernel whose win was not reproducible. This experiment isolates WHERE the
variance lives:

  1. interleaved A/B rounds: fused chain then XLA chain, back to back,
     R times in one process (clock drift hits both lanes equally; a
     consistent per-round ratio means the kernel itself is stable);
  2. same-executable re-runs: the fused chain timed 10x WITHOUT
     recompilation — variance here is runtime state (clock/HBM), not
     compilation;
  3. per-compile check: jax.clear_caches() + retrace between two timings
     of identical source — variance here is Mosaic scheduling
     nondeterminism per compile;
  4. VMEM pressure: the same A/B at S=256 and B=32 (smaller blocks).

Decision rule (printed at the end): fused keeps auto-dispatch iff it wins
ALL interleaved rounds at the production shape (B=64, S=512); otherwise
ATTN_IMPL=pallas must become opt-in.

Usage: python examples/mha_pin.py [--rounds 5]
       [--json-out evals_out/mha_pin.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.roofline import timed_chain  # noqa: E402


def _mk_inputs(rng, b, s, hd):
    import jax.numpy as jnp

    q = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.bfloat16)
    bias = jnp.zeros((b, s), jnp.float32)
    return q, k, v, bias


def ab_rounds(rounds, b, s, hd, heads, label, out):
    import functools

    import jax
    import jax.numpy as jnp

    from review_recommender_tpu.ops.pallas.attention_kernel import (
        mha_pallas,
        mha_xla,
    )

    rng = np.random.default_rng(0)
    q0, kk, vv, bias = _mk_inputs(rng, b, s, hd)
    fused = jax.jit(functools.partial(mha_pallas, num_heads=heads))
    xla = jax.jit(functools.partial(mha_xla, num_heads=heads))

    def step_of(f):
        return lambda q: q + f(q, kk, vv, bias) * jnp.bfloat16(1e-6)

    pairs = []
    for r in range(rounds):
        ms_f = timed_chain(step_of(fused), q0)
        ms_x = timed_chain(step_of(xla), q0)
        pairs.append({"round": r, "fused_ms": round(ms_f, 3),
                      "xla_ms": round(ms_x, 3),
                      "xla_over_fused": round(ms_x / ms_f, 3)})
        print(json.dumps({"shape": label, **pairs[-1]}), flush=True)
    out[label] = pairs
    return pairs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--json-out", default="evals_out/mha_pin.json")
    args = ap.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp

    from review_recommender_tpu.ops.pallas.attention_kernel import (
        mha_pallas,
    )

    out: dict = {}
    heads, hd = 12, 384

    # 1) production shape, interleaved A/B
    pairs = ab_rounds(args.rounds, 64, 512, hd, heads, "B64_S512", out)

    # 2) same-executable re-runs (no recompile): runtime-state variance
    rng = np.random.default_rng(1)
    q0, kk, vv, bias = _mk_inputs(rng, 64, 512, hd)
    fused = jax.jit(functools.partial(mha_pallas, num_heads=heads))
    step = lambda q: q + fused(q, kk, vv, bias) * jnp.bfloat16(1e-6)
    reruns = [round(timed_chain(step, q0), 3) for _ in range(10)]
    out["same_executable_reruns_ms"] = reruns
    print(json.dumps({"same_executable_reruns_ms": reruns}), flush=True)

    # 3) per-compile check: clear caches, retrace, retime (two fresh
    # compiles of identical source)
    compile_times = []
    for i in range(2):
        jax.clear_caches()
        fused_i = jax.jit(functools.partial(mha_pallas, num_heads=heads))
        step_i = (lambda f: (lambda q: q + f(q, kk, vv, bias)
                             * jnp.bfloat16(1e-6)))(fused_i)
        compile_times.append(round(timed_chain(step_i, q0), 3))
    out["fresh_compile_ms"] = compile_times
    print(json.dumps({"fresh_compile_ms": compile_times}), flush=True)

    # 4) VMEM pressure: smaller blocks
    ab_rounds(args.rounds, 64, 256, hd, heads, "B64_S256", out)
    ab_rounds(args.rounds, 32, 512, hd, heads, "B32_S512", out)

    wins = sum(p["fused_ms"] < p["xla_ms"] for p in pairs)
    spread = (max(p["fused_ms"] for p in pairs)
              / min(p["fused_ms"] for p in pairs))
    verdict = {
        "production_shape_wins": f"{wins}/{len(pairs)}",
        "fused_spread_max_over_min": round(spread, 2),
        "keep_auto": wins == len(pairs),
    }
    out["verdict"] = verdict
    print(json.dumps({"verdict": verdict}, indent=2))
    Path(args.json_out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.json_out).write_text(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
