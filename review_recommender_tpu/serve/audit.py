"""Index-artifact audit: the deploy gate.

Covers the reference's root-level audit surface
(/root/reference/test.py:124-370: required files, schema/required columns,
meta<->embedding row alignment, SKU uniqueness, joinability) translated to
the bundle layout (index/io.py): manifest presence + schema version,
checksum verification, array shape/dtype checks, meta<->array alignment,
SKU uniqueness, vocab/idf alignment, review->product segment validity.

Returns a JSON-safe report; `ok` gates deployment (exit code in the CLI).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List

import numpy as np

REQUIRED_FILES = ["manifest.json", "product_arrays.npz", "product_meta.parquet",
                  "vocab.txt"]
REVIEW_FILES = ["review_arrays.npz", "review_meta.parquet"]


def audit_index_dir(index_dir: str | Path, verify_checksums: bool = True) -> Dict:
    src = Path(index_dir)
    checks: List[Dict] = []
    ok = True

    def check(name: str, passed: bool, detail: str = "") -> bool:
        nonlocal ok
        checks.append({"check": name, "passed": bool(passed), "detail": detail})
        ok = ok and bool(passed)
        return bool(passed)

    # -- files exist --
    missing = [f for f in REQUIRED_FILES if not (src / f).exists()]
    if not check("required_files", not missing, f"missing: {missing}"):
        return {"ok": False, "checks": checks}

    # -- manifest parses & version supported --
    try:
        manifest = json.loads((src / "manifest.json").read_text())
        from review_recommender_tpu.index.schema import SCHEMA_VERSION

        check("schema_version",
              manifest.get("schema_version", 0) <= SCHEMA_VERSION,
              f"v{manifest.get('schema_version')} (supported <= v{SCHEMA_VERSION})")
    except Exception as e:
        check("manifest_parses", False, str(e))
        return {"ok": False, "checks": checks}

    if manifest.get("has_reviews"):
        rmissing = [f for f in REVIEW_FILES if not (src / f).exists()]
        check("review_files", not rmissing, f"missing: {rmissing}")

    # -- checksums --
    if verify_checksums:
        from review_recommender_tpu.index.io import _sha256

        bad = []
        for fname, want in manifest.get("checksums", {}).items():
            if (src / fname).exists() and _sha256(src / fname) != want:
                bad.append(fname)
        check("checksums", not bad, f"mismatched: {bad}")

    # -- load & structural validation --
    try:
        from review_recommender_tpu.index.io import load_bundle

        bundle = load_bundle(src)  # runs ProductIndex.validate()
        p = bundle.products
        check("bundle_loads", True, f"{p.n_docs} docs")
    except Exception as e:
        check("bundle_loads", False, f"{type(e).__name__}: {e}")
        return {"ok": False, "checks": checks}

    # meta <-> arrays row alignment
    check("meta_alignment",
          len(p.skus) == p.n_docs == len(p.agg_texts),
          f"skus={len(p.skus)} texts={len(p.agg_texts)} n_docs={p.n_docs}")
    # SKU uniqueness
    n_unique = len(set(p.skus))
    check("sku_uniqueness", n_unique == p.n_docs,
          f"{n_unique}/{p.n_docs} unique")
    # embeddings normalized
    real = p.emb[: p.n_docs]
    norms = np.linalg.norm(real, axis=1)
    nz = norms > 0
    check("embeddings_normalized",
          bool(np.allclose(norms[nz], 1.0, atol=1e-3)) if nz.any() else True,
          f"norm range [{norms.min():.4f}, {norms.max():.4f}]")
    # vocab/idf alignment
    check("vocab_idf_alignment", p.idf.shape[0] == len(p.vocab) + 1,
          f"idf={p.idf.shape[0]} vocab+1={len(p.vocab) + 1}")
    # term ids within vocab
    check("term_ids_in_range",
          int(p.doc_terms.max(initial=0)) <= len(p.vocab),
          f"max id {int(p.doc_terms.max(initial=0))} vocab {len(p.vocab)}")
    # padding rows invalid
    check("padding_invalid", not p.valid[p.n_docs:].any(),
          "padding rows must be invalid")

    if bundle.reviews is not None:
        r = bundle.reviews
        m = r.n_reviews_total
        seg = np.asarray(r.rev_product[:m])
        check("review_segments_in_range",
              bool(((seg >= 0) & (seg <= p.n_docs)).all()),
              f"seg range [{seg.min(initial=0)}, {seg.max(initial=0)}], "
              f"discard bucket = {p.n_docs}")
        check("review_meta_alignment", len(r.rev_texts) == m,
              f"texts={len(r.rev_texts)} n={m}")

    # -- device footprint + HBM fit (VERDICT r2 item 5) --
    from review_recommender_tpu.config import config
    from review_recommender_tpu.index.schema import (
        check_hbm_fit,
        footprint_total,
    )

    int8 = config.EMB_DTYPE == "int8"
    dtype = "bfloat16" if int8 else config.EMB_DTYPE
    fp, total = footprint_total(
        bundle, dtype, quantize_int8=int8,
        striped=(config.DENSE_POOL_MODE == "striped"),
    )
    fit = check_hbm_fit(total, n_shards=max(config.MESH_SHARDS, 1))
    check("hbm_fit", fit["fits"],
          f"{fit['per_device_bytes'] / 2**20:.1f} MiB/device"
          + (f" of {fit['limit_bytes'] / 2**20:.0f} MiB "
             f"({100 * fit['frac']:.1f}%)" if fit["limit_bytes"]
             else " (backend reports no memory limit)"))

    return {
        "ok": ok,
        "n_docs": p.n_docs,
        "vocab_size": len(p.vocab),
        "has_reviews": bundle.reviews is not None,
        "device_footprint": {
            "emb_dtype": config.EMB_DTYPE,
            "dense_pool_mode": config.DENSE_POOL_MODE,
            "mesh_shards": config.MESH_SHARDS,
            "bytes_per_array": {k: int(v) for k, v in
                                sorted(fp.items(), key=lambda kv: -kv[1])},
            "total_bytes": int(total),
            "per_device_bytes": fit["per_device_bytes"],
            "hbm_limit_bytes": fit["limit_bytes"],
        },
        "checks": checks,
    }
