"""Speed-of-light audit: measure every hot kernel against its hardware bound.

For each kernel on the query path this times the compiled program on the
current device (in-program fori_loop chaining so per-dispatch/tunnel
overhead cannot pollute the number — same fence discipline as bench.py)
and compares it against the roofline bound implied by the chip's peak
matmul rate and HBM bandwidth:

    t_bound = max(bytes_moved / HBM_BW,  flops / PEAK_FLOPS)

The point is honesty about distance-to-light: a kernel at 80% of the
bandwidth bound is done; one at 10% of the FLOPs bound either has a
structural excuse (tiny matmul tiles, top-k data dependencies) or work
left. The limiting resource is printed per row so the excuse is checkable.

Peak numbers are the public TPU v5e (v5 lite) chip specs: 197 bf16
TFLOP/s, 394 int8 TOP/s, 819 GB/s HBM. Override via ROOFLINE_TFLOPS /
ROOFLINE_INT8_TOPS / ROOFLINE_HBM_GBS for other chips. On a non-TPU
backend the tool still measures but marks bounds as n/a.

Run: python examples/roofline.py [--n-docs 200000] [--out evals_out/roofline.md]
Reference analog: none — the reference publishes no latency numbers at all
(SURVEY.md §6); this tool is the rebuild's performance contract.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chip_specs():
    import jax

    plat = jax.devices()[0].platform.lower()
    if plat in ("tpu", "axon"):
        return {
            "name": "TPU v5e (per chip)",
            "bf16_flops": float(os.getenv("ROOFLINE_TFLOPS", "197")) * 1e12,
            "int8_ops": float(os.getenv("ROOFLINE_INT8_TOPS", "394")) * 1e12,
            # elementwise/select ops peak: (8, 128) VPU lanes x 4 ALUs x
            # ~940 MHz — the honest compute peak for non-matmul kernels
            "vpu_ops": float(os.getenv("ROOFLINE_VPU_TOPS", "3.85")) * 1e12,
            "hbm_bw": float(os.getenv("ROOFLINE_HBM_GBS", "819")) * 1e9,
        }
    return None  # CPU/other: measure only, no bounds


# 100-step differences: on a jittery tunnel a 20-step difference of a
# sub-2ms kernel can be noise-dominated (observed: a Pallas MHA row at
# 3.6 ms in one run vs 1.1-1.7 ms in three others, and one negative
# measurement). Shrunk by --quick for CPU smoke runs.
CHAIN_LO, CHAIN_HI = 10, 110


def timed_chain(step, x0, *, lo: int | None = None, hi: int | None = None,
                fetch=None, reps: int = 3):
    """ms per step of a jitted fori_loop chain of `step`, overhead-free.

    step(x) -> x' must thread a data dependency so XLA cannot hoist or
    elide iterations. The fence is a host readback of real values (fetch),
    not block_until_ready — on the tunneled box the latter can return
    before the computation ran for scalar outputs.

    Methodology: ONE executable with a *dynamic* trip count (so the lo- and
    hi-length runs share every per-executable cost), timed as INTERLEAVED
    (lo, hi) pairs with the median pair-difference reported. Two earlier
    drafts measured negative ms on this box: two separate executables timed
    once each, then one executable with min-of-reps per length — the
    tunnel's RPC jitter (±20-50 ms between adjacent dispatches) beats both;
    pairing adjacent dispatches and taking the median is drift-immune.
    """
    import jax

    lo = CHAIN_LO if lo is None else lo
    hi = CHAIN_HI if hi is None else hi

    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, xx: step(xx), x)

    default_fetch = lambda x: np.asarray(
        jax.tree_util.tree_leaves(x)[0]).ravel()[:2]
    f = fetch or default_fetch

    f(run(x0, 1))  # compile (n is traced: one executable for all lengths)

    def t(n):
        t0 = time.perf_counter()
        f(run(x0, n))
        return time.perf_counter() - t0

    t(lo)
    t(hi)  # warm both lengths
    diffs = sorted(t(hi) - t(lo) for _ in range(max(reps, 5)))
    return diffs[len(diffs) // 2] / (hi - lo) * 1e3


def fmt_bytes(b):
    return f"{b / 2**20:.0f} MiB" if b < 2**30 else f"{b / 2**30:.2f} GiB"


def row(name, ms, flops, bytes_moved, specs, peak_key="bf16_flops",
        note=""):
    r = {"kernel": name, "measured_ms": round(ms, 3),
         "flops": flops, "bytes": bytes_moved, "note": note}
    if specs is not None:
        t_flops = flops / specs[peak_key] * 1e3
        t_bw = bytes_moved / specs["hbm_bw"] * 1e3
        bound = max(t_flops, t_bw)
        r.update({
            "bound_ms": round(bound, 3),
            "flops_bound_ms": round(t_flops, 3),
            "bw_bound_ms": round(t_bw, 3),
            "limiter": "HBM" if t_bw >= t_flops
            else ("VPU" if peak_key == "vpu_ops" else "MXU"),
            "pct_of_light": round(100 * bound / ms, 1) if ms > 0 else 0.0,
        })
    return r


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="evals_out/roofline.md")
    ap.add_argument("--quick", action="store_true",
                    help="tiny chains + small tower shapes (CPU smoke)")
    args = ap.parse_args(argv)

    if args.quick:
        global CHAIN_LO, CHAIN_HI
        CHAIN_LO, CHAIN_HI = 1, 3

    import jax

    if os.environ.get("ROOFLINE_PLATFORM"):
        # e.g. ROOFLINE_PLATFORM=cpu for a smoke run — the image's
        # sitecustomize force-registers the axon TPU plugin and overrides
        # JAX_PLATFORMS, so pin via jax.config (wins over both).
        jax.config.update("jax_platforms", os.environ["ROOFLINE_PLATFORM"])

    import jax.numpy as jnp

    from review_recommender_tpu.ops.dense import (
        dense_striped_topk_scan,
        dense_striped_topk_scan_int8,
        dense_topk_batched,
        quantize_corpus_int8,
        slice_corpus_for_striped,
        slice_corpus_for_striped_int8,
    )
    from review_recommender_tpu.ops.pallas.bm25_kernel import (
        bm25_full_scores_pallas,
    )

    specs = chip_specs()
    n, d, b, pool = args.n_docs, 384, args.batch, 150
    rng = np.random.default_rng(0)

    def mk_emb(dtype):
        e = rng.standard_normal((n, d)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        return jnp.asarray(e, dtype)

    emb = mk_emb(jnp.bfloat16)
    valid = jnp.ones((n,), jnp.bool_)
    qv = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    rows = []

    # ---- 1) fused dense score+pool scan, bf16 -------------------------
    emb_s, valid_s = slice_corpus_for_striped(emb, valid, 8192)
    scan_b = jax.vmap(lambda q: dense_striped_topk_scan(
        emb_s, valid_s, q, pool))

    def step_scan(q):
        s, _ = scan_b(q)
        return q + s[:, :1].astype(q.dtype) * jnp.asarray(1e-6, q.dtype)

    ms = timed_chain(step_scan, qv)
    rows.append(row(
        f"dense fused score+pool scan bf16 (B={b}, N={n}, D={d})",
        ms, flops=2 * b * n * d, bytes_moved=n * d * 2,
        specs=specs,
        note="corpus read once per batch; (B,N) sims never reach HBM"))

    # ---- 2) same, int8 corpus -----------------------------------------
    emb_q, row_scale = quantize_corpus_int8(mk_emb(jnp.float32))
    emb_qs, scale_s, valid_qs = slice_corpus_for_striped_int8(
        emb_q, row_scale, valid, 8192)
    scan_i8 = jax.vmap(lambda q: dense_striped_topk_scan_int8(
        emb_qs, scale_s, valid_qs, q, pool))
    qv8 = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    def step_scan8(q):
        s, _ = scan_i8(q)
        return q + s[:, :1] * 1e-6

    ms = timed_chain(step_scan8, qv8)
    rows.append(row(
        f"dense fused score+pool scan int8 (B={b}, N={n}, D={d})",
        ms, flops=2 * b * n * d, bytes_moved=n * d * 1 + n * 4,
        specs=specs, peak_key="int8_ops",
        note="half the corpus bytes of bf16 + per-row scales; measured at "
             "or below the bf16 scan — XLA's int8 matmul on this chip "
             "doesn't reach the nominal 2x rate (matches the int8-tower "
             "negative result, ROADMAP.md), so int8's win is HBM "
             "footprint (2x corpus per chip), not latency"))

    # ---- 2b) int8 scan, GLOBAL scale (integer-carry epilogue) ----------
    from review_recommender_tpu.ops.dense import (
        dense_striped_topk_scan_int8_global,
        quantize_corpus_int8_global,
    )

    q_glob, g_scale = quantize_corpus_int8_global(
        np.asarray(mk_emb(jnp.float32)))
    emb_gs, _zs, valid_gs = slice_corpus_for_striped_int8(
        jnp.asarray(q_glob), jnp.zeros(n, jnp.float32), valid, 8192)
    scan_g8 = jax.vmap(lambda q: dense_striped_topk_scan_int8_global(
        emb_gs, valid_gs, q, pool, g_scale))

    def step_scan_g8(q):
        s, _ = scan_g8(q)
        return q + s[:, :1] * 1e-6

    ms = timed_chain(step_scan_g8, qv8)
    rows.append(row(
        f"dense fused score+pool scan int8-global (B={b}, N={n}, D={d})",
        ms, flops=2 * b * n * d, bytes_moved=n * d * 1,
        specs=specs, peak_key="int8_ops",
        note="ONE corpus-wide scale: stripe carries compare raw int32 "
             "accumulators, deleting the per-slice int32->f32 convert and "
             "per-row scale multiply of the row-scaled variant "
             "(ops/dense.py:dense_striped_topk_scan_int8_global; "
             "examples/int8_scan_tuning.py for the full A/B)"))

    # ---- 3) exact dense pool (matmul + full-corpus top_k) --------------
    def step_exact(q):
        s, _ = dense_topk_batched(emb, q, valid, pool)
        return q + s[:, :1].astype(q.dtype) * jnp.asarray(1e-6, q.dtype)

    ms = timed_chain(step_exact, qv)
    rows.append(row(
        f"dense exact pool: matmul + lax.top_k (B={b}, N={n})",
        ms, flops=2 * b * n * d,
        # corpus read + (B,N) f32 sims written then re-read by top_k
        bytes_moved=n * d * 2 + 2 * b * n * 4,
        specs=specs,
        note="the scan above exists to delete the 2BN sims traffic"))

    # ---- 4) BM25 single-pass Pallas kernel (TPU only: no CPU lowering) --
    if specs is not None:
        l_terms, n_q_terms = 64, 8
        n_pad = (n + 255) // 256 * 256
        doc_terms = jnp.asarray(
            rng.integers(1, 30000, size=(n_pad, l_terms)), jnp.int32)
        doc_tf = jnp.asarray(
            rng.integers(1, 5, size=(n_pad, l_terms)), jnp.float32)
        doc_len = jnp.full((n_pad,), float(l_terms), jnp.float32)
        q_terms = jnp.asarray(rng.integers(1, 30000, size=(n_q_terms,)),
                              jnp.int32)
        q_idf = jnp.ones((n_q_terms,), jnp.float32)

        def step_bm25(carry):
            avgdl, acc = carry
            s = bm25_full_scores_pallas(doc_terms, doc_tf, doc_len, q_terms,
                                        q_idf, avgdl)
            return avgdl + s[0] * 1e-9, acc

        ms = timed_chain(step_bm25, (jnp.float32(l_terms), jnp.float32(0)),
                         fetch=lambda c: np.asarray(c[0]))
        rows.append(row(
            f"BM25 full-corpus scan, Pallas (N={n_pad}, L={l_terms}, "
            f"Q={n_q_terms}, 1 query)",
            ms, flops=n_pad * l_terms * (3 + 3 * n_q_terms),
            bytes_moved=n_pad * l_terms * 8 + n_pad * 8,
            specs=specs, peak_key="vpu_ops",
            note="VPU compare/accumulate, no MXU; bound is max(postings "
                 "read, VPU select rate)"))

        # packed-transposed variant: one int32 per posting, (L, N) layout
        from review_recommender_tpu.ops.pallas.bm25_kernel import (
            bm25_full_scores_packed_pallas,
            pack_postings,
        )

        pk = pack_postings(np.asarray(doc_terms), np.asarray(doc_tf))
        pk_d = jnp.asarray(pk)
        dl_p = jnp.asarray(
            np.pad(np.asarray(doc_len), (0, pk.shape[1] - n_pad)))

        def step_bm25p(carry):
            avg, acc = carry
            s = bm25_full_scores_packed_pallas(pk_d, dl_p, q_terms, q_idf,
                                               avg)
            return avg + s[0] * 1e-9, acc

        ms = timed_chain(step_bm25p, (jnp.float32(l_terms), jnp.float32(0)),
                         fetch=lambda c: np.asarray(c[0]))
        rows.append(row(
            f"BM25 packed-transposed scan, Pallas (N={pk.shape[1]}, "
            f"L={l_terms}, Q={n_q_terms}, 1 query)",
            ms, flops=pk.shape[1] * l_terms * (3 + 3 * n_q_terms),
            bytes_moved=pk.shape[1] * l_terms * 4 + pk.shape[1] * 8,
            specs=specs, peak_key="vpu_ops",
            note="(tf<<24)|term in ONE int32, corpus on the lane axis: "
                 "half the bytes, full 128-lane occupancy"))

    # ---- 5) fused MHA at the rerank shape -------------------------------
    if specs is not None:
        from review_recommender_tpu.ops.pallas.attention_kernel import (
            mha_pallas,
            mha_xla,
        )

        ab, s_len, heads = 64, 512, 12
        mk = lambda: jnp.asarray(
            rng.standard_normal((ab, s_len, d)), jnp.bfloat16)
        q0, kk, vv = mk(), mk(), mk()
        bias = jnp.zeros((ab, s_len), jnp.float32)
        attn_flops = 4 * ab * s_len * s_len * d
        attn_bytes = 4 * ab * s_len * d * 2  # q,k,v in + out

        for name, f in (("Pallas fused", mha_pallas), ("XLA einsum", mha_xla)):
            def step_mha(q, f=f):
                return q + f(q, kk, vv, bias, heads) * jnp.bfloat16(1e-6)

            ms = timed_chain(step_mha, q0)
            rows.append(row(
                f"MHA {name} (B={ab}, S={s_len}, H={d}, h={heads})",
                ms, flops=attn_flops, bytes_moved=attn_bytes, specs=specs,
                note="hd=32 heads tile the 128-wide MXU at 1/4 occupancy"))

    # ---- 6) tower forwards ----------------------------------------------
    from review_recommender_tpu.models.bert import (
        BertConfig,
        init_biencoder,
        init_crossencoder,
    )

    def tower_cost(cfg, batch, seq):
        t = batch * seq
        h, i = cfg.hidden_size, cfg.intermediate_size
        per_layer = 8 * t * h * h + 4 * batch * seq * seq * h + 4 * t * h * i
        flops = cfg.num_layers * per_layer
        n_params = cfg.num_layers * (4 * h * h + 2 * h * i) \
            + cfg.vocab_size * h
        bytes_moved = n_params * 2 + t * h * 2 * 2  # weights + act in/out
        return flops, bytes_moved

    tb, ts_ce, ts_bi = (4, 64, 32) if args.quick else (64, 512, 128)
    for label, init, cfg, batch, seq in (
        ("cross-encoder 6L forward (rerank)", init_crossencoder,
         BertConfig.minilm_l6_cross(), tb, ts_ce),
        ("bi-encoder 12L forward (query encode)", init_biencoder,
         BertConfig.bge_small(), tb, ts_bi),
    ):
        model, params = init(cfg, seed=0)
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, seq)),
                          jnp.int32)
        mask = jnp.ones((batch, seq), jnp.int32)

        @jax.jit
        def fwd(p, ids, mask, model=model):
            out = model.apply({"params": p}, ids, mask)
            return out if isinstance(out, jax.Array) else out[0]

        def step_tower(carry):
            ids_i = ids + carry.astype(jnp.int32)  # 0 at runtime, unprovable
            out = fwd(params, ids_i, mask)
            return carry + out.sum() * 1e-12

        ms = timed_chain(step_tower, jnp.float32(0),
                         fetch=lambda c: np.asarray(c))
        flops, bts = tower_cost(cfg, batch, seq)
        rows.append(row(f"{label} (B={batch}, S={seq})", ms,
                        flops=flops, bytes_moved=bts, specs=specs))

    # ---- report -----------------------------------------------------------
    lines = ["# Speed-of-light audit", ""]
    if specs is not None:
        lines.append(
            f"Chip: {specs['name']} — "
            f"{specs['bf16_flops'] / 1e12:.0f} bf16 TFLOP/s, "
            f"{specs['int8_ops'] / 1e12:.0f} int8 TOP/s, "
            f"{specs['hbm_bw'] / 1e9:.0f} GB/s HBM. "
            "Measured with in-program chaining (no dispatch overhead); "
            "bound = max(bytes/BW, flops/peak).")
    else:
        lines.append("Non-TPU backend: measured only, no bounds.")
    lines += ["", "| kernel | measured | bound | % of light | limiter | "
              "flops | bytes |", "|---|---|---|---|---|---|---|"]
    for r in rows:
        if "bound_ms" in r:
            lines.append(
                f"| {r['kernel']} | {r['measured_ms']} ms "
                f"| {r['bound_ms']} ms | {r['pct_of_light']}% "
                f"| {r['limiter']} | {r['flops'] / 1e9:.1f} GF "
                f"| {fmt_bytes(r['bytes'])} |")
        else:
            lines.append(
                f"| {r['kernel']} | {r['measured_ms']} ms | n/a | n/a | n/a "
                f"| {r['flops'] / 1e9:.1f} GF | {fmt_bytes(r['bytes'])} |")
    lines.append("")
    for r in rows:
        if r["note"]:
            lines.append(f"- **{r['kernel']}**: {r['note']}")
    report = "\n".join(lines) + "\n"
    print(report)
    print(json.dumps({"roofline": rows}))
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
