"""Reviews warehouse: the bronze-table layer over merged reviews.

The reference loads `reviews_merged.parquet` into DuckDB with a unique id
index and two sanity views (etl/03_load_duckdb.py:16-57). DuckDB is an
optional dependency of this build: `make_warehouse()` returns the
DuckDB-backed `DuckWarehouse` (real `reviews_raw` table + unique index +
`v_star_dist`/`v_source_breakdown` views, the reference's exact schema)
when the package is installed, and the parquet+pandas `Warehouse` with the
identical public surface otherwise:

  make_warehouse(path).load(df)  idempotent load, unique-id enforcement
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


def _import_duckdb():
    try:
        import duckdb  # noqa: PLC0415 — optional dependency

        return duckdb
    except Exception:  # noqa: BLE001 — missing/broken install both mean "no"
        return None


def duckdb_available() -> bool:
    return _import_duckdb() is not None


def make_warehouse(root: str | Path) -> "Warehouse":
    """Factory: DuckDB-backed store when duckdb is installed, else the
    parquet+pandas store. Both expose the same surface."""
    if duckdb_available():
        return DuckWarehouse(root)
    return Warehouse(root)


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


class DuckWarehouse(Warehouse):
    """DuckDB-backed bronze store — the reference's actual warehouse shape
    (etl/03_load_duckdb.py:16-57): a `reviews_raw` table with a unique
    index on id and the `v_star_dist` / `v_source_breakdown` views, with
    this module's idempotent `load()` surface on top (INSERT OR IGNORE
    against the unique index = the reference's first-writer-wins
    uniqueness contract)."""

    DB = "reviews.duckdb"
    TABLE = "reviews_raw"

    def __init__(self, root: str | Path):
        duckdb = _import_duckdb()
        if duckdb is None:  # pragma: no cover - factory guards this
            raise RuntimeError("duckdb is not installed")
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.path = self.root / self.DB
        self._con = duckdb.connect(str(self.path))

    def load(self, reviews: pd.DataFrame) -> int:
        if "id" not in reviews.columns:
            raise ValueError("reviews need an 'id' column")
        # dedupe within the batch first (keep='first', matching Warehouse)
        batch = reviews.drop_duplicates(subset=["id"], keep="first")
        con = self._con
        con.register("_incoming", batch)
        if not self._table_exists():
            # schema from the first batch (etl/03 derives it from the
            # merged parquet the same way)
            con.execute(
                f"CREATE TABLE {self.TABLE} AS "
                "SELECT * FROM _incoming LIMIT 0"
            )
            con.execute(
                f"CREATE UNIQUE INDEX idx_{self.TABLE}_id "
                f"ON {self.TABLE}(id)"
            )
            self._create_views(batch.columns)
        con.execute(
            f"INSERT OR IGNORE INTO {self.TABLE} SELECT * FROM _incoming"
        )
        con.unregister("_incoming")
        n = con.execute(f"SELECT COUNT(*) FROM {self.TABLE}").fetchone()[0]
        logger.info("duckdb warehouse now holds %d reviews", n)
        return int(n)

    def _table_exists(self) -> bool:
        row = self._con.execute(
            "SELECT COUNT(*) FROM information_schema.tables "
            "WHERE table_name = ?",
            [self.TABLE],
        ).fetchone()
        return bool(row[0])

    def _create_views(self, columns) -> None:
        """The reference's sanity views (etl/03_load_duckdb.py:43-57);
        created only when the backing column exists so arbitrary-schema
        loads (the Warehouse contract) stay legal."""
        if "stars" in columns:
            self._con.execute(
                "CREATE OR REPLACE VIEW v_star_dist AS "
                f"SELECT stars, COUNT(*) AS n FROM {self.TABLE} "
                "GROUP BY stars ORDER BY stars"
            )
        if "source" in columns:
            self._con.execute(
                "CREATE OR REPLACE VIEW v_source_breakdown AS "
                f"SELECT source, COUNT(*) AS n FROM {self.TABLE} "
                "GROUP BY source ORDER BY n DESC"
            )

    def read(self, columns: Optional[list] = None) -> pd.DataFrame:
        if not self._table_exists():
            return pd.DataFrame()
        cols = ", ".join(columns) if columns else "*"
        return self._con.execute(
            f"SELECT {cols} FROM {self.TABLE}"
        ).fetchdf()

    def star_distribution(self) -> pd.DataFrame:
        if not self._table_exists():
            return pd.DataFrame(columns=["stars", "n"])
        return self._con.execute("SELECT * FROM v_star_dist").fetchdf()

    def source_breakdown(self) -> pd.DataFrame:
        if not self._table_exists():
            return pd.DataFrame(columns=["source", "n"])
        return self._con.execute(
            "SELECT * FROM v_source_breakdown"
        ).fetchdf()

    def close(self) -> None:
        self._con.close()
