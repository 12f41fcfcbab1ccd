"""Single-chip capacity probe: the full hybrid path at multi-million-doc N.

bench.py's driver-run 1M-doc line keeps the round-to-round record; this
standalone probe pushes N as far as the chip's HBM allows (the synthetic
corpus build alone takes ~12 min at N=5M on this box's single host core,
too slow for the driver bench). The engine is the recommended serving
config: int8 corpus + striped scan pool, batch=128.

Measured on one v5e chip (tunnel) 2026-08-19:

    N=5,000,000   6.37 GiB HBM   1636 q/s   (batch=128, pool=150, k=10)
    N=1,000,000   1.27 GiB HBM   4183-4617 q/s   (bench.py BENCH_BIGN line)

The HBM model (index/schema.py:footprint_total) puts the one-chip ceiling
around N~12M at these settings (16 GiB v5e); past that the corpus shards
across the mesh (parallel/sharded.py) — per-chip rows divide by n_shards,
so a v5e-8 slice holds ~100M docs at the same per-chip load.

Run: python examples/scale_probe.py  [PROBE_N=5000000]
Reference analog: none — the reference's corpus lives in host RAM and is
CPU-bound long before these sizes (SURVEY.md §6 "millions of reviews" is
aspirational there).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from bench import _async_read, _batched_qps, _synth_index
    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.index.schema import (
        IndexBundle,
        footprint_total,
    )
    from review_recommender_tpu.ops.fusion import FusionWeights

    n_big = int(os.getenv("PROBE_N", "5000000"))
    dim = int(os.getenv("PROBE_DIM", "384"))
    vocab = 30000
    t0 = time.time()
    pidx = _synth_index(n_big, dim, vocab, terms_per_doc=64, seed=7)
    print(f"synth corpus: {time.time() - t0:.0f}s", file=sys.stderr)
    bundle = IndexBundle(products=pidx)
    _, hbm = footprint_total(bundle, quantize_int8=True, striped=True)
    t0 = time.time()
    engine = SearchEngine(bundle, emb_dtype="int8", gate_mode="device",
                          dense_pool="striped")
    print(f"device placement: {time.time() - t0:.0f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    qvecs = rng.standard_normal((128, dim)).astype(np.float32)
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    qstrings = [f"synthetic query {i} tokens" for i in range(128)]
    w = FusionWeights.make()
    pool, k = 150, 10
    t0 = time.time()
    _async_read([engine.query_fused_batched(qvecs, qstrings, w, pool, k)])
    print(f"compile+warm: {time.time() - t0:.0f}s", file=sys.stderr)
    qps = _batched_qps(engine, qvecs, qstrings, w, pool, k, 128, 128,
                       reps=1)
    print(json.dumps({
        "metric": f"hybrid int8 striped-pool batch=128, N={n_big} (one chip)",
        "qps": round(qps, 2),
        "hbm_bytes": int(hbm),
        "hbm_gib": round(hbm / 2**30, 2),
    }))


if __name__ == "__main__":
    main()
