#!/usr/bin/env python3
"""int8 fused-scan tuning (VERDICT r4 item 6).

The per-row-scale int8 scan measured 24.5% of its HBM bound and SLOWER than
bf16 (evals_out/roofline.md) — its per-slice epilogue converts the (B, G)
int32 accumulator to f32 and multiplies by per-row scales on the VPU every
slice. This experiment times three variants as interleaved chained rounds
(clock-drift-immune, same methodology as examples/roofline.py):

  bf16        dense_striped_topk_scan            (the production default)
  int8/row    dense_striped_topk_scan_int8       (per-row scales, float epilogue)
  int8/global dense_striped_topk_scan_int8_global (ONE corpus scale,
              integer carries, one final rescale — the epilogue fold)

plus the two things latency timing can't show:
  - quantization quality: max |cos error| vs f32 and pool-recall@150 for
    both int8 schemes (the price of the global scale's coarser grid);
  - h2d transfer bytes/time for the corpus (int8's real win is capacity
    and transfer, not scan latency).

Usage: python examples/int8_scan_tuning.py [--n-docs 200000] [--batch 128]
       [--rounds 5] [--json-out evals_out/int8_scan_tuning.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.roofline import chip_specs, timed_chain  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--stripes", type=int, default=8192)
    ap.add_argument("--pool", type=int, default=150)
    ap.add_argument("--json-out", default="evals_out/int8_scan_tuning.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from review_recommender_tpu.ops.dense import (
        dense_striped_topk_scan,
        dense_striped_topk_scan_int8,
        dense_striped_topk_scan_int8_global,
        quantize_corpus_int8,
        quantize_corpus_int8_global,
        slice_corpus_for_striped,
        slice_corpus_for_striped_int8,
    )

    specs = chip_specs()
    n, d, b, pool = args.n_docs, 384, args.batch, args.pool
    rng = np.random.default_rng(0)
    emb_f32 = rng.standard_normal((n, d)).astype(np.float32)
    emb_f32 /= np.linalg.norm(emb_f32, axis=1, keepdims=True)
    valid = jnp.ones((n,), jnp.bool_)

    # ---- h2d transfer: bf16 vs int8 corpus ---------------------------
    def h2d_ms(host_arr):
        t0 = time.perf_counter()
        a = jax.device_put(host_arr)
        a.block_until_ready()
        return (time.perf_counter() - t0) * 1e3, a

    import ml_dtypes  # jax dependency, always present

    bf16_host = emb_f32.astype(ml_dtypes.bfloat16)
    q_row, row_scale = quantize_corpus_int8(emb_f32)
    q_glob, g_scale = quantize_corpus_int8_global(emb_f32)
    t_bf16, _emb_dev = h2d_ms(bf16_host)
    t_int8, _q_row_dev = h2d_ms(q_row)
    h2d = {"bf16_ms": round(t_bf16, 1), "int8_ms": round(t_int8, 1),
           "bf16_bytes": int(bf16_host.nbytes),
           "int8_bytes": int(q_row.nbytes)}
    print(json.dumps({"h2d_corpus": h2d}), flush=True)

    # ---- quantization quality (host, exact) ---------------------------
    qv_f = rng.standard_normal((8, d)).astype(np.float32)
    qv_f /= np.linalg.norm(qv_f, axis=1, keepdims=True)
    exact = emb_f32 @ qv_f.T  # (N, 8)

    def quality(sim_hat):
        err = np.abs(sim_hat - exact).max()
        rec = []
        for j in range(qv_f.shape[0]):
            top_e = set(np.argsort(-exact[:, j])[:pool].tolist())
            top_h = set(np.argsort(-sim_hat[:, j])[:pool].tolist())
            rec.append(len(top_e & top_h) / pool)
        return float(err), float(np.mean(rec))

    def qq(v):
        s = max(np.abs(v).max() / 127.0, 1e-12)
        return np.clip(np.rint(v / s), -127, 127).astype(np.int8), s

    sim_row = np.zeros_like(exact)
    sim_glob = np.zeros_like(exact)
    for j in range(qv_f.shape[0]):
        qi, qs = qq(qv_f[j])
        acc_r = q_row.astype(np.int32) @ qi.astype(np.int32)
        sim_row[:, j] = acc_r * (row_scale * qs)
        acc_g = q_glob.astype(np.int32) @ qi.astype(np.int32)
        sim_glob[:, j] = acc_g * (g_scale * qs)
    err_r, rec_r = quality(sim_row)
    err_g, rec_g = quality(sim_glob)
    print(json.dumps({"quality": {
        "per_row": {"max_abs_err": round(err_r, 5),
                    "pool_recall": round(rec_r, 4)},
        "global": {"max_abs_err": round(err_g, 5),
                   "pool_recall": round(rec_g, 4)},
    }}), flush=True)

    # ---- chained timing, interleaved rounds ---------------------------
    emb_bf = jnp.asarray(emb_f32, jnp.bfloat16)
    emb_s, valid_s = slice_corpus_for_striped(emb_bf, valid, args.stripes)
    emb_qs, scale_s, valid_qs = slice_corpus_for_striped_int8(
        jnp.asarray(q_row), jnp.asarray(row_scale), valid, args.stripes)
    emb_gs, _unused, valid_gs = slice_corpus_for_striped_int8(
        jnp.asarray(q_glob), jnp.asarray(np.zeros(n, np.float32)), valid,
        args.stripes)

    scan_bf = jax.vmap(lambda q: dense_striped_topk_scan(
        emb_s, valid_s, q, pool))
    scan_r8 = jax.vmap(lambda q: dense_striped_topk_scan_int8(
        emb_qs, scale_s, valid_qs, q, pool))
    scan_g8 = jax.vmap(lambda q: dense_striped_topk_scan_int8_global(
        emb_gs, valid_gs, q, pool, g_scale))

    qv_bf = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    qv32 = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    steps = {
        "bf16": (lambda q: q + scan_bf(q)[0][:, :1].astype(q.dtype)
                 * jnp.asarray(1e-6, q.dtype), qv_bf),
        "int8_row": (lambda q: q + scan_r8(q)[0][:, :1] * 1e-6, qv32),
        "int8_global": (lambda q: q + scan_g8(q)[0][:, :1] * 1e-6, qv32),
    }
    bounds_ms = {
        "bf16": (n * d * 2) / specs["hbm_bw"] * 1e3,
        "int8_row": (n * d + n * 4) / specs["hbm_bw"] * 1e3,
        "int8_global": (n * d) / specs["hbm_bw"] * 1e3,
    }
    rounds = {k: [] for k in steps}
    for r in range(args.rounds):
        for name, (step, x0) in steps.items():
            ms = timed_chain(step, x0)
            rounds[name].append(round(ms, 3))
            print(json.dumps({"round": r, "variant": name, "ms": ms}),
                  flush=True)
    summary = {}
    for name in steps:
        med = float(np.median(rounds[name]))
        summary[name] = {
            "rounds_ms": rounds[name], "median_ms": round(med, 3),
            "bound_ms": round(bounds_ms[name], 3),
            "pct_of_bound": round(100 * bounds_ms[name] / med, 1),
        }
    out = {"n_docs": n, "batch": b, "pool": pool, "stripes": args.stripes,
           "h2d_corpus": h2d,
           "quality": {"per_row": {"max_abs_err": err_r,
                                   "pool_recall": rec_r},
                       "global": {"max_abs_err": err_g,
                                  "pool_recall": rec_g}},
           "timing": summary}
    Path(args.json_out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.json_out).write_text(json.dumps(out, indent=2))
    print(json.dumps({"summary": summary}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
