"""Product aggregation: reviews table -> per-product rows for indexing.

Parity targets in the reference (/root/reference/nlp/10_product_prep.py:
21-101): dedup by (sku, normalized text), per-SKU KPIs (n_reviews, avg_stars,
last_ts), keep top-K reviews per SKU ranked by stars desc then recency, and
concatenate their text (clipped) into agg_text. Implemented as vectorized
pandas group-bys rather than per-SKU python loops.
"""
from __future__ import annotations

import logging
import re
from typing import Optional

import pandas as pd

logger = logging.getLogger(__name__)

TOP_REVIEWS_PER_SKU = 80
AGG_TEXT_CHAR_CAP = 4000  # matches the embed-time truncation (nlp/11:23,36)
_WS = re.compile(r"\s+")


def normalize_text(s: str) -> str:
    return _WS.sub(" ", str(s)).strip().lower()


def build_products(
    reviews: pd.DataFrame,
    top_k: int = TOP_REVIEWS_PER_SKU,
    agg_char_cap: int = AGG_TEXT_CHAR_CAP,
) -> pd.DataFrame:
    """reviews(id, sku, ts, stars, text, ...) -> products(sku, n_reviews,
    avg_stars, last_ts, agg_text)."""
    df = reviews.copy()
    df["text"] = df["text"].astype(str)
    df["_norm"] = df["text"].map(normalize_text)
    df = df.drop_duplicates(subset=["sku", "_norm"], keep="first")

    df["stars"] = pd.to_numeric(df["stars"], errors="coerce")
    kpis = df.groupby("sku").agg(
        n_reviews=("text", "size"),
        avg_stars=("stars", "mean"),
        last_ts=("ts", "max"),
    )

    # top-K per SKU by (stars desc, ts desc)
    df["_ts_sort"] = df["ts"].fillna("")
    ranked = df.sort_values(
        ["sku", "stars", "_ts_sort"], ascending=[True, False, False],
        kind="stable", na_position="last",
    )
    ranked["_rank"] = ranked.groupby("sku").cumcount()
    top = ranked[ranked["_rank"] < top_k]
    agg_text = top.groupby("sku")["text"].apply(
        lambda texts: " ".join(texts)[:agg_char_cap]
    )

    out = kpis.join(agg_text.rename("agg_text")).reset_index()
    out["agg_text"] = out["agg_text"].fillna("")
    logger.info("aggregated %d reviews -> %d products", len(reviews), len(out))
    return out[["sku", "n_reviews", "avg_stars", "last_ts", "agg_text"]]


# ---- review-side filters for the snippet index (nlp/11:39-44 semantics) ----
_URL = re.compile(r"https?://|www\.")
_PROMO = re.compile(
    r"(discount code|use code|coupon|promo code|affiliate|sponsored)", re.I
)
_REPEAT = re.compile(r"(.)\1{7,}")


def looks_spammy(text: str) -> bool:
    t = str(text)
    return bool(_URL.search(t) or _PROMO.search(t) or _REPEAT.search(t))


def filter_reviews_for_snippets(
    reviews: pd.DataFrame, per_sku_cap: Optional[int] = None
) -> pd.DataFrame:
    """Spam filter + (sku, text) dedup for the review-embedding job.

    per_sku_cap (default config.SNIPPET_REVIEWS_CAP) bounds reviews kept per
    product — newest first, so the snippet index stays HBM-bounded on
    review-heavy SKUs. 0 disables the cap."""
    if per_sku_cap is None:
        from review_recommender_tpu.config import config

        per_sku_cap = config.SNIPPET_REVIEWS_CAP
    df = reviews.copy()
    df["text"] = df["text"].astype(str)
    keep = ~df["text"].map(looks_spammy)
    df = df[keep]
    df["_norm"] = df["text"].map(normalize_text)
    df = df.drop_duplicates(subset=["sku", "_norm"], keep="first")
    df = df.drop(columns=["_norm"])
    if per_sku_cap and per_sku_cap > 0:
        df["_ts_sort"] = df.get("ts", pd.Series([""] * len(df), index=df.index)).fillna("")
        df = df.sort_values(["sku", "_ts_sort"], ascending=[True, False],
                            kind="stable")
        df = df[df.groupby("sku").cumcount() < per_sku_cap]
        df = df.drop(columns=["_ts_sort"]).sort_index()
    return df
