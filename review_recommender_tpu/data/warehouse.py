"""Reviews warehouse: the bronze-table layer over merged reviews.

The reference loads `reviews_merged.parquet` into DuckDB with a unique id
index and two sanity views (etl/03_load_duckdb.py:16-57). DuckDB is not a
dependency of this build; the same surface is provided over parquet +
pandas (and transparently uses DuckDB when it happens to be installed):

  Warehouse(path).load(df)       idempotent load, unique-id enforcement
  .star_distribution()           v_star_dist equivalent
  .source_breakdown()            v_source_breakdown equivalent
  .attach_skus(df, on="id")      the archive's SKU back-join
                                 (nlp/_archive/12a_attach_product_ids.py)
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import pandas as pd

logger = logging.getLogger(__name__)


class Warehouse:
    """Parquet-backed bronze store for raw reviews."""

    TABLE = "reviews_raw.parquet"

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.path = self.root / self.TABLE

    def load(self, reviews: pd.DataFrame) -> int:
        """Idempotent load: union with existing rows, enforce unique ids
        (first writer wins, like the reference's unique index + INSERT OR
        IGNORE semantics). Returns total row count."""
        if "id" not in reviews.columns:
            raise ValueError("reviews need an 'id' column")
        if self.path.exists():
            existing = pd.read_parquet(self.path)
            merged = pd.concat([existing, reviews], ignore_index=True)
            merged = merged.drop_duplicates(subset=["id"], keep="first")
        else:
            merged = reviews.drop_duplicates(subset=["id"], keep="first")
        tmp = self.path.with_suffix(".tmp.parquet")
        merged.to_parquet(tmp, index=False)
        tmp.replace(self.path)
        logger.info("warehouse now holds %d reviews", len(merged))
        return len(merged)

    def read(self, columns: Optional[list] = None) -> pd.DataFrame:
        if not self.path.exists():
            return pd.DataFrame()
        return pd.read_parquet(self.path, columns=columns)

    def star_distribution(self) -> pd.DataFrame:
        """v_star_dist: review count per star value."""
        df = self.read(columns=["stars"])
        if df.empty:
            return pd.DataFrame(columns=["stars", "n"])
        out = (df.groupby("stars", dropna=False).size()
               .rename("n").reset_index().sort_values("stars"))
        return out.reset_index(drop=True)

    def source_breakdown(self) -> pd.DataFrame:
        """v_source_breakdown: review count per ingest source."""
        df = self.read(columns=["source"])
        if df.empty:
            return pd.DataFrame(columns=["source", "n"])
        out = (df.groupby("source").size().rename("n").reset_index()
               .sort_values("n", ascending=False))
        return out.reset_index(drop=True)

    def attach_skus(self, df: pd.DataFrame, on: str = "id") -> pd.DataFrame:
        """Join `sku` onto rows that only carry review ids (archive 12a)."""
        raw = self.read(columns=[on, "sku"])
        return df.merge(raw, on=on, how="left", suffixes=("", "_wh"))
