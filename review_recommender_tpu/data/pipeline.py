"""End-to-end offline pipeline: raw reviews -> versioned index bundle.

The TPU-native replacement for the reference's 5-script make data-prep chain
(/root/reference/Makefile:108-111: etl/02 -> etl/03 -> nlp/10 -> nlp/11 ->
nlp/12). One process, explicit stages, each checkpointed on disk:

  1. normalize_merge   raw CSV/JSONL -> reviews.parquet     (data/etl.py)
  2. build_products    reviews -> products table            (data/prep.py)
  3. embed products    agg_text -> (N, D) via the JAX tower (data/embed_job.py)
  4. [optional] embed filtered reviews for snippets
  5. build + save      device-ready IndexBundle             (index/build, io)

Also provides import_reference_artifacts(): loads an index from the
reference's artifact formats (product_emb.npy + product_emb_meta.parquet +
product_bm25.pkl + reviews_with_embeddings.parquet) so existing users can
switch without re-running their ETL.
"""
from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from review_recommender_tpu.data.embed_job import run_embed_job
from review_recommender_tpu.data.etl import normalize_merge
from review_recommender_tpu.data.prep import (
    build_products,
    filter_reviews_for_snippets,
)
from review_recommender_tpu.index.build import (
    build_product_index,
    build_review_index,
)
from review_recommender_tpu.index.io import save_bundle
from review_recommender_tpu.index.schema import IndexBundle

logger = logging.getLogger(__name__)


def _resolve_doc_terms_cap(cap):
    """None -> config.DOC_TERMS_CAP; 0 -> "auto" (P99-derived postings
    width, index/build.py:derive_doc_terms_cap)."""
    if cap is None:
        from review_recommender_tpu.config import config

        cap = config.DOC_TERMS_CAP
    return cap if cap else "auto"


#: globals a legitimate product_bm25.pkl may reference ({skus, corpus,
#: tokenizer} of builtins, possibly numpy scalars/arrays for skus). pickle
#: executes arbitrary code via arbitrary find_class, so everything else is
#: refused (ADVICE: untrusted artifact imports must not compromise the host).
_PICKLE_ALLOWED = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    """Unpickler for the reference's product_bm25.pkl: builtins + a numpy
    allowlist only; any other global raises instead of importing."""

    def find_class(self, module, name):
        if (module, name) in _PICKLE_ALLOWED:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name}: product_bm25.pkl "
            "should contain only builtins/numpy ({skus, corpus, tokenizer})"
        )


def _load_bm25_pickle(f) -> dict:
    return _RestrictedUnpickler(f).load()


def build_index_from_reviews(
    reviews: pd.DataFrame,
    encoder,
    out_dir: str | Path,
    *,
    with_snippets: bool = True,
    work_dir: Optional[str | Path] = None,
    doc_terms_cap: Optional[int] = None,  # None -> config.DOC_TERMS_CAP (0 = auto)
    resume: bool = True,
    eager_bm25: bool = True,
) -> IndexBundle:
    """Stages 2-5: aggregation, embedding jobs, bundle build + save.

    eager_bm25 bakes per-(term, doc) BM25 contributions into the index
    (BM25S-style) — query scoring becomes a masked sum."""
    out = Path(out_dir)
    work = Path(work_dir) if work_dir else out / "_work"
    doc_terms_cap = _resolve_doc_terms_cap(doc_terms_cap)

    products = build_products(reviews)
    prod_emb = run_embed_job(
        products["agg_text"].tolist(), encoder, work / "product_emb",
        resume=resume,
    )

    pidx = build_product_index(
        products["sku"].tolist(),
        products["agg_text"].tolist(),
        products["n_reviews"].tolist(),
        products["avg_stars"].tolist(),
        prod_emb,
        doc_terms_cap=doc_terms_cap,
        last_ts=products["last_ts"].tolist() if "last_ts" in products else None,
    )
    if eager_bm25:
        from review_recommender_tpu.index.build import attach_eager_bm25

        attach_eager_bm25(pidx)

    ridx = None
    if with_snippets and len(reviews):
        snip = filter_reviews_for_snippets(reviews)
        rev_emb = run_embed_job(
            snip["text"].tolist(), encoder, work / "review_emb", resume=resume,
        )
        ridx = build_review_index(
            snip["sku"].tolist(), snip["text"].tolist(),
            pd.to_numeric(snip["stars"], errors="coerce").tolist(),
            rev_emb, pidx.skus,
        )

    bundle = IndexBundle(products=pidx, reviews=ridx,
                         meta={"built_from": "pipeline"})
    save_bundle(bundle, out)
    return bundle


def run_full_pipeline(
    inputs: Sequence[tuple],  # (path, "csv"|"jsonl", source_tag)
    encoder,
    out_dir: str | Path,
    **kwargs,
) -> IndexBundle:
    """Stage 1 + build_index_from_reviews."""
    out = Path(out_dir)
    reviews = normalize_merge(inputs, out / "_work" / "reviews_merged.parquet")
    return build_index_from_reviews(reviews, encoder, out, **kwargs)


def import_reference_artifacts(
    emb_npy: str | Path,
    meta_parquet: str | Path,
    bm25_pkl: Optional[str | Path] = None,
    reviews_parquet: Optional[str | Path] = None,
    out_dir: Optional[str | Path] = None,
    doc_terms_cap: Optional[int] = None,  # None -> config.DOC_TERMS_CAP (0 = auto)
) -> IndexBundle:
    """Migration path: reference artifact files -> IndexBundle.

    Formats per SURVEY.md §1 artifact table:
      emb_npy         (N, D) float32, row-aligned with meta
      meta_parquet    sku, n_reviews, avg_stars, last_ts, agg_text
      bm25_pkl        pickle {skus, corpus: [[tok]], tokenizer}
      reviews_parquet id, sku, ts, stars, text, embedding(list<f32>)

    Every path may be a local file or an fsspec URL (hf://datasets/...),
    matching the reference's production artifact transport
    (reference config.py:34-35, app_product_search.py:94-101). The pickle is
    parsed with a restricted unpickler (builtins + numpy allowlist only).
    """
    from review_recommender_tpu.index.io import open_artifact

    doc_terms_cap = _resolve_doc_terms_cap(doc_terms_cap)
    with open_artifact(emb_npy) as f:
        emb = np.load(f)
    meta = pd.read_parquet(meta_parquet)
    assert len(meta) == emb.shape[0], (len(meta), emb.shape)

    token_lists = None
    if bm25_pkl is not None:
        with open_artifact(bm25_pkl) as f:
            blob = _load_bm25_pickle(f)
        corpus, b_skus = blob.get("corpus"), [str(s) for s in blob.get("skus", [])]
        sku_order = [str(s) for s in meta["sku"].tolist()]
        if b_skus and b_skus != sku_order:
            by_sku = dict(zip(b_skus, corpus))
            token_lists = [by_sku.get(s, []) for s in sku_order]
        else:
            token_lists = list(corpus)

    pidx = build_product_index(
        meta["sku"].astype(str).tolist(),
        meta.get("agg_text", pd.Series([""] * len(meta))).astype(str).tolist(),
        pd.to_numeric(meta.get("n_reviews", 0), errors="coerce").fillna(0).tolist(),
        pd.to_numeric(meta.get("avg_stars"), errors="coerce").tolist(),
        emb,
        doc_terms_cap=doc_terms_cap,
        token_lists=token_lists,
        last_ts=(
            meta["last_ts"].astype(str).tolist()
            if "last_ts" in meta.columns else None
        ),
    )

    ridx = None
    if reviews_parquet is not None:
        rdf = pd.read_parquet(reviews_parquet)
        rev_emb = np.stack(rdf["embedding"].to_numpy())
        ridx = build_review_index(
            rdf["sku"].astype(str).tolist(),
            rdf["text"].astype(str).tolist(),
            pd.to_numeric(rdf.get("stars"), errors="coerce").tolist(),
            rev_emb, pidx.skus,
        )

    bundle = IndexBundle(products=pidx, reviews=ridx,
                         meta={"built_from": "reference_artifacts"})
    if out_dir is not None:
        save_bundle(bundle, out_dir)
    return bundle
