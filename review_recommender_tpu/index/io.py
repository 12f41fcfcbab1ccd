"""Versioned index-bundle IO.

Layout of an index directory (replaces the reference's pickle blobs —
pickles are unversioned and unsafe; we use npz + parquet + a JSON manifest):

  manifest.json        version, counts, dims, build params, checksums
  product_arrays.npz   all ProductIndex device arrays + idf/df
  product_meta.parquet sku, agg_text, n_reviews, avg_stars (host columns)
  vocab.txt            one term per line, line i = term id i+1
  review_arrays.npz    (optional) ReviewIndex device arrays
  review_meta.parquet  (optional) text, stars
"""
from __future__ import annotations

import hashlib
import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from review_recommender_tpu.index.schema import (
    SCHEMA_VERSION,
    IndexBundle,
    ProductIndex,
    ReviewIndex,
)

logger = logging.getLogger(__name__)


def is_remote(path) -> bool:
    """True for fsspec-style URLs (hf://, s3://, gs://, memory://...) —
    the reference serves production artifacts from HF datasets over fsspec
    (reference config.py:34-35, app_product_search.py:94-101)."""
    return "://" in str(path)


def join_path(base, name: str) -> str:
    """Path join that preserves URL schemes (Path() collapses 'hf://')."""
    b = str(base)
    if is_remote(b):
        return b.rstrip("/") + "/" + name
    return str(Path(b) / name)


def open_artifact(path, mode: str = "rb"):
    """Open a local file or a remote fsspec URL for reading."""
    if is_remote(path):
        import fsspec

        return fsspec.open(str(path), mode).open()
    return open(path, mode)


def _sha256(path) -> str:
    h = hashlib.sha256()
    with open_artifact(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def save_bundle(bundle: IndexBundle, out_dir: str | Path) -> Path:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    p = bundle.products

    arrays = dict(
        emb=p.emb,
        n_reviews=p.n_reviews,
        avg_stars=p.avg_stars,
        doc_terms=p.doc_terms,
        doc_tf=p.doc_tf,
        doc_len=p.doc_len,
        gate_bits=p.gate_bits,
        valid=p.valid,
        idf=p.idf,
        df=p.df,
    )
    if p.doc_tokens is not None:
        arrays["doc_tokens"] = p.doc_tokens
        arrays["doc_token_len"] = p.doc_token_len
    if p.doc_bm25 is not None:
        arrays["doc_bm25"] = p.doc_bm25
    np.savez_compressed(out / "product_arrays.npz", **arrays)
    meta_cols = {
        "sku": p.skus,
        "agg_text": p.agg_texts,
        "n_reviews": p.n_reviews[: p.n_docs],
        "avg_stars": p.avg_stars[: p.n_docs],
    }
    if p.last_ts is not None:
        meta_cols["last_ts"] = p.last_ts
    pd.DataFrame(meta_cols).to_parquet(out / "product_meta.parquet", index=False)
    terms = sorted(p.vocab.items(), key=lambda kv: kv[1])
    with open(out / "vocab.txt", "w") as f:
        for term, tid in terms:
            f.write(term + "\n")

    files = ["product_arrays.npz", "product_meta.parquet", "vocab.txt"]

    if bundle.reviews is not None:
        r = bundle.reviews
        np.savez_compressed(
            out / "review_arrays.npz",
            rev_emb=r.rev_emb,
            rev_product=r.rev_product,
            rev_valid=r.rev_valid,
        )
        pd.DataFrame({"text": r.rev_texts, "stars": r.rev_stars}).to_parquet(
            out / "review_meta.parquet", index=False
        )
        files += ["review_arrays.npz", "review_meta.parquet"]

    manifest = {
        "schema_version": bundle.version,
        "n_docs": p.n_docs,
        "n_padded": p.n_padded,
        "dim": p.dim,
        "terms_cap": p.terms_cap,
        "vocab_size": len(p.vocab),
        "avgdl": p.avgdl,
        "has_reviews": bundle.reviews is not None,
        "n_reviews_total": (
            bundle.reviews.n_reviews_total if bundle.reviews else 0
        ),
        "meta": bundle.meta,
        "checksums": {f: _sha256(out / f) for f in files},
    }
    with open(out / "manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    logger.info("wrote index bundle to %s (%d docs)", out, p.n_docs)
    return out


def load_bundle(in_dir: str | Path, verify_checksums: bool = False) -> IndexBundle:
    """Load a bundle from a local directory OR an fsspec URL
    (e.g. hf://datasets/<org>/<name>/index — the reference's production
    artifact transport, reference config.py:34-35)."""
    src = str(in_dir)
    f = lambda name: join_path(src, name)
    with open_artifact(f("manifest.json"), "r") as fh:
        manifest = json.load(fh)
    if manifest["schema_version"] > SCHEMA_VERSION:
        raise ValueError(
            f"index bundle schema v{manifest['schema_version']} is newer than "
            f"supported v{SCHEMA_VERSION}"
        )
    if verify_checksums:
        for fname, want in manifest.get("checksums", {}).items():
            got = _sha256(f(fname))
            if got != want:
                raise ValueError(f"checksum mismatch for {fname}")

    with open_artifact(f("product_arrays.npz")) as fh:
        arrs = dict(np.load(fh))
    meta = pd.read_parquet(f("product_meta.parquet"))
    with open_artifact(f("vocab.txt"), "r") as fh:
        vocab = {line.rstrip("\n"): i + 1 for i, line in enumerate(fh) if line}

    p = ProductIndex(
        emb=arrs["emb"],
        n_reviews=arrs["n_reviews"],
        avg_stars=arrs["avg_stars"],
        doc_terms=arrs["doc_terms"],
        doc_tf=arrs["doc_tf"],
        doc_len=arrs["doc_len"],
        gate_bits=arrs["gate_bits"],
        valid=arrs["valid"],
        skus=[str(s) for s in meta["sku"].tolist()],
        agg_texts=[str(t) for t in meta["agg_text"].tolist()],
        vocab=vocab,
        idf=arrs["idf"],
        df=arrs["df"],
        avgdl=float(manifest["avgdl"]),
        n_docs=int(manifest["n_docs"]),
        doc_tokens=arrs.get("doc_tokens"),
        doc_token_len=arrs.get("doc_token_len"),
        doc_bm25=arrs.get("doc_bm25"),
        last_ts=(
            [None if pd.isna(t) else str(t) for t in meta["last_ts"]]
            if "last_ts" in meta.columns else None
        ),
    )
    p.validate()

    reviews: Optional[ReviewIndex] = None
    if manifest.get("has_reviews"):
        with open_artifact(f("review_arrays.npz")) as fh:
            rarrs = dict(np.load(fh))
        rmeta = pd.read_parquet(f("review_meta.parquet"))
        reviews = ReviewIndex(
            rev_emb=rarrs["rev_emb"],
            rev_product=rarrs["rev_product"],
            rev_valid=rarrs["rev_valid"],
            rev_texts=[str(t) for t in rmeta["text"].tolist()],
            rev_stars=rmeta["stars"].to_numpy(dtype=np.float32),
            n_reviews_total=int(manifest["n_reviews_total"]),
        )

    return IndexBundle(
        products=p,
        reviews=reviews,
        version=int(manifest["schema_version"]),
        meta=manifest.get("meta", {}),
    )
