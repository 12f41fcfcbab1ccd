#!/usr/bin/env python3
"""Capacity table: corpus size vs per-chip HBM at v5e-8 geometry.

Answers "how many documents fit?" from the SAME cost model the engine's
load-time refusal uses (index/schema.py:footprint_total / check_hbm_fit —
one model, so the table can never disagree with the runtime check). A
small real bundle at production geometry (D=384, L=64 — the bench index
shape) supplies measured per-doc bytes; every per-doc device array scales
linearly in padded rows, so footprint(N) = N * per_doc. VERDICT r4 item 8.

Usage: python examples/capacity_table.py [--out evals_out/capacity_v5e8.md]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_HBM_GIB = 16  # TPU v5e: 16 GiB HBM per chip (public spec)
ROWS = [1, 2, 5, 10, 12, 20, 50, 100]  # millions of docs


def build_table(dim: int = 384, terms_cap: int = 64) -> str:
    import numpy as np

    from review_recommender_tpu.index.schema import (
        IndexBundle,
        ProductIndex,
        check_hbm_fit,
        footprint_total,
    )

    n = 1024  # small but real: per-doc bytes are exact at any n
    rng = np.random.default_rng(0)
    pidx = ProductIndex(
        emb=rng.standard_normal((n, dim)).astype(np.float32),
        n_reviews=np.ones(n, np.float32),
        avg_stars=np.full(n, 4.0, np.float32),
        doc_terms=np.ones((n, terms_cap), np.int32),
        doc_tf=np.ones((n, terms_cap), np.float32),
        doc_len=np.full(n, terms_cap, np.float32),
        gate_bits=np.zeros((n, 67), bool),  # len(GATE_PHRASES)
        valid=np.ones(n, bool),
        skus=[f"S{i}" for i in range(n)],
        agg_texts=[""] * n,
        vocab={}, idf=np.zeros(2, np.float32),
        df=np.zeros(2, np.int32), avgdl=float(terms_cap), n_docs=n,
    )
    bundle = IndexBundle(products=pidx)
    limit = V5E_HBM_GIB * 2**30

    lines = [
        "# Capacity: corpus rows vs per-chip HBM (v5e-8 geometry)",
        "",
        f"Cost model: `index/schema.py:footprint_total` (the load-time "
        f"refusal's own model) at D={dim}, L={terms_cap} postings/doc, "
        "int8 corpus + striped pool (the recommended large-N serving "
        f"config). Per-chip limit: {V5E_HBM_GIB} GiB (TPU v5e public "
        "spec). 'fits' applies `check_hbm_fit` at each shard count; "
        ">80% of HBM is flagged (!). Engine arrays only — excludes XLA "
        "scratch/program memory (~hundreds of MiB).",
        "",
        "| docs | total GiB | 1 chip | v5e-4 (GiB/chip) | v5e-8 (GiB/chip) |",
        "|---|---|---|---|---|",
    ]
    _, total_small = footprint_total(bundle, quantize_int8=True,
                                     striped=True)
    per_doc = total_small / pidx.n_padded

    def cell(total: int, shards: int) -> str:
        rep = check_hbm_fit(total, n_shards=shards, limit_bytes=limit)
        gib = rep["per_device_bytes"] / 2**30
        mark = "yes" if rep["fits"] else "NO"
        if rep["fits"] and rep["warn"]:
            mark = "yes (!)"
        return f"{mark}, {gib:.2f}"

    for m in ROWS:
        total = int(m * 1e6 * per_doc)
        lines.append(
            f"| {m}M | {total / 2**30:.2f} | {cell(total, 1)} | "
            f"{cell(total, 4)} | {cell(total, 8)} |"
        )
    lines += [
        "",
        f"Per-doc bytes at this geometry: {per_doc:.1f} "
        "(int8 emb + scales, int32 postings + f32 tf, scalars, gate "
        "bits; striped pool keeps a second copy of the quantized emb).",
        "Single-chip ceiling ~12M docs; a v5e-8 slice holds ~100M at the "
        "same per-chip load, matching README footnote 3.",
    ]
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evals_out/capacity_v5e8.md")
    args = ap.parse_args()
    table = build_table()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(table)
    print(table)
    return 0


if __name__ == "__main__":
    sys.exit(main())
