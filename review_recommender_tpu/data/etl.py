"""Review ingestion + normalization: raw dumps -> canonical reviews table.

Behavioral parity with the reference ETL (/root/reference/etl/
02_normalize_merge.py:16-157): column-name canonicalization across dump
variants, stars coerced to int 1..5, timestamps to ISO-8601 UTC, stable
content-addressed ids (sha256 of source|sku|text prefix), (sku, text) dedup,
minimum-text-length filter, chunked streaming for larger-than-RAM inputs.

Output contract (the L2<->L3 "ABI", SURVEY.md §1): columns
  id, sku, ts, stars, text, source
"""
from __future__ import annotations

import hashlib
import json
import logging
from pathlib import Path
from typing import Dict, Iterable, Iterator, Optional, Sequence

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

CANONICAL_COLUMNS = ["id", "sku", "ts", "stars", "text", "source"]
MIN_TEXT_CHARS = 10

# Column-name variants seen across Amazon review dumps.
COLUMN_ALIASES: Dict[str, Sequence[str]] = {
    "sku": ("sku", "asin", "product_id", "productid", "item_id"),
    "stars": ("stars", "rating", "overall", "star_rating", "score"),
    "text": ("text", "review_text", "reviewtext", "review_body", "body",
             "reviews.text"),
    "ts": ("ts", "timestamp", "unixreviewtime", "review_date", "date",
           "reviews.date", "review_time"),
}


def stable_id(source: str, sku: str, text: str) -> str:
    """Content-addressed review id: stable across re-ingests."""
    h = hashlib.sha256()
    h.update(f"{source}|{sku}|{text[:256]}".encode("utf-8", "replace"))
    return h.hexdigest()[:24]


def _find_column(df: pd.DataFrame, aliases: Sequence[str]) -> Optional[str]:
    lower = {c.lower(): c for c in df.columns}
    for a in aliases:
        if a in lower:
            return lower[a]
    return None


def clean_chunk(df: pd.DataFrame, source: str) -> pd.DataFrame:
    """Canonicalize one raw chunk to the contract schema."""
    cols = {}
    for canon, aliases in COLUMN_ALIASES.items():
        found = _find_column(df, aliases)
        if found is not None:
            cols[canon] = df[found]
    if "sku" not in cols or "text" not in cols:
        logger.warning("%s chunk missing sku/text (have %s) — skipped",
                       source, list(df.columns)[:8])
        return pd.DataFrame(columns=CANONICAL_COLUMNS)

    out = pd.DataFrame({
        "sku": cols["sku"].astype(str).str.strip(),
        "text": cols["text"].astype(str).str.strip(),
    })

    stars = cols.get("stars")
    if stars is not None:
        s = pd.to_numeric(stars, errors="coerce").round()
        out["stars"] = s.clip(1, 5).astype("Int64")
    else:
        out["stars"] = pd.array([pd.NA] * len(out), dtype="Int64")

    ts = cols.get("ts")
    if ts is not None:
        if pd.api.types.is_numeric_dtype(ts):
            t = pd.to_datetime(pd.to_numeric(ts, errors="coerce"), unit="s",
                               utc=True, errors="coerce")
        else:
            t = pd.to_datetime(ts, utc=True, errors="coerce", format="mixed")
        out["ts"] = t.dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    else:
        out["ts"] = None

    out = out[(out["sku"] != "") & (out["text"].str.len() >= MIN_TEXT_CHARS)]
    out["source"] = source
    out["id"] = [
        stable_id(source, s, t) for s, t in zip(out["sku"], out["text"])
    ]
    return out[CANONICAL_COLUMNS]


def iter_csv(path: str | Path, source: str, chunksize: int = 100_000
             ) -> Iterator[pd.DataFrame]:
    for chunk in pd.read_csv(path, chunksize=chunksize, low_memory=False):
        yield clean_chunk(chunk, source)


def iter_jsonl(path: str | Path, source: str, chunksize: int = 100_000
               ) -> Iterator[pd.DataFrame]:
    """Stream newline-delimited JSON (SNAP-style dumps) in chunks."""
    rows = []
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
            if len(rows) >= chunksize:
                yield clean_chunk(pd.DataFrame(rows), source)
                rows = []
    if rows:
        yield clean_chunk(pd.DataFrame(rows), source)


def normalize_merge(
    inputs: Iterable[tuple],  # (path, kind "csv"|"jsonl", source_tag)
    out_path: str | Path,
    sample_csv: Optional[str | Path] = None,
    sample_rows: int = 100_000,
) -> pd.DataFrame:
    """Stream all inputs, concat, dedup by id, write one parquet."""
    frames = []
    for path, kind, source in inputs:
        it = iter_csv(path, source) if kind == "csv" else iter_jsonl(path, source)
        for chunk in it:
            if len(chunk):
                frames.append(chunk)
    if frames:
        merged = pd.concat(frames, ignore_index=True)
        merged = merged.drop_duplicates(subset=["id"], keep="first")
    else:
        merged = pd.DataFrame(columns=CANONICAL_COLUMNS)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    merged.to_parquet(out_path, index=False)
    if sample_csv is not None:
        merged.head(sample_rows).to_csv(sample_csv, index=False)
    logger.info("merged %d reviews -> %s", len(merged), out_path)
    return merged
