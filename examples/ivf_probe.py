"""IVF pool probe: single-query latency + pool recall vs the full scans.

The IVF pool (ops/ivf.py) is the sub-linear lane for the single-query /
small-batch regime: per query it reads nprobe*block_rows corpus rows
instead of all N. This sweeps nprobe at the headline shape (N=200k,
D=384, pool=150) with the jitter-immune in-program chain (bench._chain_ms)
and measures pool recall against the exact scan on TWO corpus geometries:

  clustered   256-component mixture (what real embedding corpora look
              like — the geometry IVF exploits), queries = corpus rows +
              noise (near-duplicate queries, the serving case)
  isotropic   uniform random directions — IVF's worst case: centroid
              scores carry almost no information, so recall at small
              nprobe collapses. Reported so the knob's failure mode is on
              record, not discovered in production.

Run on the chip:  python examples/ivf_probe.py [--out evals_out/ivf_probe.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _chain_ms  # noqa: E402


def make_corpus(n, d, kind, seed=0, k_true=256, noise=0.7):
    """`noise` is the TOTAL noise norm relative to the unit center (per-
    component sigma = noise/sqrt(d)), so within-cluster cosine is
    ~1/sqrt(1+noise^2) ~= 0.82 at the default — the 0.6-0.9 band real
    product-embedding corpora sit in. (A per-component sigma of 0.25 at
    D=384 gives noise norm ~5x the center: effectively isotropic, recall
    0.23 — the first probe run measured exactly that mistake.)"""
    rng = np.random.default_rng(seed)
    if kind == "isotropic":
        emb = rng.standard_normal((n, d)).astype(np.float32)
    else:
        centers = rng.standard_normal((k_true, d)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        ids = rng.integers(0, k_true, n)
        emb = centers[ids] + (noise / np.sqrt(d)) * rng.standard_normal(
            (n, d)
        ).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb.astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--pool", type=int, default=150)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--kinds", default="clustered,isotropic",
                    help="comma-separated corpus geometries to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from review_recommender_tpu.ops.dense import (
        dense_topk,
        dense_striped_topk_scan,
        slice_corpus_for_striped,
    )
    from review_recommender_tpu.ops.ivf import build_ivf, ivf_device_arrays, ivf_topk

    n, d, pool = args.n, args.dim, args.pool
    results = []

    for kind in args.kinds.split(","):
        emb_f = make_corpus(n, d, kind)
        rng = np.random.default_rng(1)
        # near-duplicate queries: corpus rows + noise
        qrows = rng.integers(0, n, args.queries)
        qs = emb_f[qrows] + (0.5 / np.sqrt(d)) * rng.standard_normal(
            (args.queries, d)
        ).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)

        emb = jnp.asarray(emb_f, jnp.bfloat16)
        valid = jnp.ones((n,), jnp.bool_)
        qv = jnp.asarray(qs, jnp.float32)

        # corpus-sized arrays ride the chain CARRY, never a closure — a
        # closed-over constant is serialized into the axon remote-compile
        # payload (HTTP 413 at this size; the engine/search.py contract)
        fetch_q = lambda st: np.asarray(st[0]).ravel()[:2]

        def step_exact(st):
            q, emb_, valid_ = st
            s, _ = jax.vmap(lambda qq: dense_topk(emb_, qq, valid_,
                                                  pool))(q)
            return (q.at[:, 0].add(jnp.sum(s) * 1e-12), emb_, valid_)

        ms_exact = _chain_ms(step_exact, (qv[:1], emb, valid),
                             fetch=fetch_q, lo=10, hi=60)

        emb_s, valid_s = slice_corpus_for_striped(emb, valid, 8192)

        def step_striped(st):
            q, es, vs = st
            s, _ = jax.vmap(lambda qq: dense_striped_topk_scan(
                es, vs, qq, pool))(q)
            return (q.at[:, 0].add(jnp.sum(s) * 1e-12), es, vs)

        ms_striped = _chain_ms(step_striped, (qv[:1], emb_s, valid_s),
                               fetch=fetch_q, lo=10, hi=60)

        # exact pool as recall ground truth (arrays as jit ARGS, same rule)
        ref_fn = jax.jit(lambda e, v, q: jax.vmap(
            lambda qq: dense_topk(e, qq, v, pool))(q))
        _, idx_ref = ref_fn(emb, valid, qv)
        idx_ref = np.asarray(idx_ref)

        base = {
            "kind": kind, "n": n, "dim": d, "pool": pool,
            "exact_ms": round(ms_exact, 3),
            "striped_ms": round(ms_striped, 3),
        }
        print(json.dumps(base), flush=True)

        t0 = time.monotonic()
        ivf = build_ivf(emb_f, np.ones(n, bool))
        build_s = time.monotonic() - t0
        a = ivf_device_arrays(ivf, emb_f, jnp.bfloat16)
        dev = (a["ivf_centroids"], a["ivf_blocks"], a["ivf_block_valid"],
               a["ivf_block_rows"], a["ivf_block_centroid"])
        print(json.dumps({
            "kind": kind, "ivf_build_s": round(build_s, 1),
            "centroids": len(ivf.centroids), "blocks": ivf.n_blocks,
            "block_rows": ivf.block_rows,
            "fill_pct": round(100 * float(ivf.block_valid.mean()), 1),
        }), flush=True)

        for nprobe in (16, 32, 64, 128):
            def step_ivf(st, nprobe=nprobe):
                q = st[0]
                s, _ = jax.vmap(lambda qq: ivf_topk(
                    *st[1:], qq, pool, nprobe))(q)
                return (q.at[:, 0].add(jnp.sum(s) * 1e-12),) + st[1:]

            ms = _chain_ms(step_ivf, (qv[:1],) + dev, fetch=fetch_q,
                           lo=10, hi=60)
            ivf_fn = jax.jit(lambda cen, blk, bv, br, bc, q: jax.vmap(
                lambda qq: ivf_topk(cen, blk, bv, br, bc, qq, pool,
                                    nprobe))(q))
            _, idx_ivf = ivf_fn(*dev, qv)
            idx_ivf = np.asarray(idx_ivf)
            recall = float(np.mean([
                len(set(idx_ref[i]) & set(idx_ivf[i])) / pool
                for i in range(len(qs))
            ]))
            recall10 = float(np.mean([
                len(set(idx_ref[i][:10]) & set(idx_ivf[i])) / 10
                for i in range(len(qs))
            ]))
            rows_read = nprobe * ivf.block_rows
            row = {
                **base, "nprobe": nprobe, "ivf_ms": round(ms, 3),
                "pool_recall": round(recall, 4),
                "recall_at_10": round(recall10, 4),
                "rows_scanned": rows_read,
                "traffic_vs_full_scan": round(rows_read / n, 4),
                "speedup_vs_exact": round(ms_exact / ms, 2),
                "speedup_vs_striped": round(ms_striped / ms, 2),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(results, indent=1))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
