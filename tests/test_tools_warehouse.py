"""Warehouse (bronze table), archiver tool, and LLM aspect-vote tests."""
import json

import pandas as pd
import pytest

from review_recommender_tpu.data.warehouse import (
    DuckWarehouse,
    Warehouse,
    duckdb_available,
    make_warehouse,
)
from review_recommender_tpu.tools.archiver import (
    archive_files,
    should_keep,
    unique_dest,
)
from review_recommender_tpu.topics.naming import classify_aspects_llm

# Both backends share one contract; the duckdb-backed one runs whenever the
# optional package is installed (VERDICT r4 item 7) and is skipped cleanly
# otherwise.
BACKENDS = [Warehouse] + ([DuckWarehouse] if duckdb_available() else [])


def _reviews(ids, source="kaggle"):
    return pd.DataFrame({
        "id": ids,
        "sku": [f"S{i}" for i in range(len(ids))],
        "ts": [None] * len(ids),
        "stars": [5, 4, 3, 2, 1][: len(ids)],
        "text": [f"text {i} long enough here" for i in range(len(ids))],
        "source": source,
    })


@pytest.mark.parametrize("backend", BACKENDS)
class TestWarehouse:
    def test_idempotent_load_unique_ids(self, tmp_path, backend):
        wh = backend(tmp_path)
        assert wh.load(_reviews(["a", "b", "c"])) == 3
        # reload same ids + one new: first writer wins
        assert wh.load(_reviews(["a", "b", "d"], source="snap")) == 4
        df = wh.read()
        assert df[df.id == "a"].iloc[0]["source"] == "kaggle"

    def test_views(self, tmp_path, backend):
        wh = backend(tmp_path)
        wh.load(_reviews(["a", "b", "c"]))
        stars = wh.star_distribution()
        assert stars["n"].sum() == 3
        src = wh.source_breakdown()
        assert src.iloc[0]["source"] == "kaggle" and src.iloc[0]["n"] == 3

    def test_attach_skus(self, tmp_path, backend):
        wh = backend(tmp_path)
        wh.load(_reviews(["a", "b"]))
        out = wh.attach_skus(pd.DataFrame({"id": ["b", "a"], "x": [1, 2]}))
        assert out["sku"].tolist() == ["S1", "S0"]

    def test_missing_id_column(self, tmp_path, backend):
        with pytest.raises(ValueError):
            backend(tmp_path).load(pd.DataFrame({"sku": ["x"]}))

    def test_empty_reads(self, tmp_path, backend):
        wh = backend(tmp_path)
        assert wh.read().empty
        assert list(wh.star_distribution().columns) == ["stars", "n"]
        assert list(wh.source_breakdown().columns) == ["source", "n"]


def test_factory_picks_available_backend(tmp_path):
    wh = make_warehouse(tmp_path)
    expected = DuckWarehouse if duckdb_available() else Warehouse
    assert type(wh) is expected


@pytest.mark.skipif(not duckdb_available(), reason="duckdb not installed")
class TestDuckWarehouseInternals:
    """DuckDB-specific shape: the reference's actual table/index/views
    (etl/03_load_duckdb.py:16-57) must exist inside the database file."""

    def test_unique_index_and_views_exist(self, tmp_path):
        wh = DuckWarehouse(tmp_path)
        wh.load(_reviews(["a", "b", "c"]))
        con = wh._con
        # the unique index physically rejects duplicate ids
        import duckdb

        with pytest.raises(duckdb.ConstraintException):
            con.execute(
                "INSERT INTO reviews_raw SELECT * FROM reviews_raw LIMIT 1"
            )
        views = {
            r[0]
            for r in con.execute(
                "SELECT table_name FROM information_schema.tables "
                "WHERE table_type = 'VIEW'"
            ).fetchall()
        }
        assert {"v_star_dist", "v_source_breakdown"} <= views
        # the views answer directly over SQL, like the reference's
        assert con.execute(
            "SELECT SUM(n) FROM v_star_dist"
        ).fetchone()[0] == 3
        wh.close()


class TestArchiver:
    def test_keep_list_and_globs(self):
        assert should_keep("main.py", ["main.py"])
        assert should_keep("10_prep.py", ["1*_prep.py"])
        assert not should_keep("extra.py", ["main.py"])

    def test_archive_with_dry_run(self, tmp_path):
        for n in ["keep.py", "old1.py", "old2.py", "data.txt"]:
            (tmp_path / n).write_text("x")
        dry = archive_files(tmp_path, keep=["keep.py"], dry_run=True)
        assert {a["src"].split("/")[-1] for a in dry} == {"old1.py", "old2.py"}
        assert (tmp_path / "old1.py").exists()  # nothing moved

        moved = archive_files(tmp_path, keep=["keep.py"])
        assert len(moved) == 2
        assert not (tmp_path / "old1.py").exists()
        assert (tmp_path / "_archive" / "old1.py").exists()
        assert (tmp_path / "keep.py").exists()

    def test_collision_safe_names(self, tmp_path):
        dest = tmp_path / "_archive"
        dest.mkdir()
        (dest / "a.py").write_text("prior")
        u = unique_dest(dest, "a.py")
        assert u.name != "a.py" and u.suffix == ".py"


class TestAspectVote:
    def test_majority_and_cache(self, tmp_path):
        calls = {"n": 0}

        def voter(topic):
            calls["n"] += 1
            return ["battery", "battery", "sound"][calls["n"] % 3]

        topics = {0: {"label": "battery life", "quotes": []}}
        cache = tmp_path / "aspects.json"
        out = classify_aspects_llm(topics, voter, votes=3, cache_path=cache)
        assert out[0] == "battery"
        n = calls["n"]
        out2 = classify_aspects_llm(topics, voter, votes=3, cache_path=cache)
        assert out2[0] == "battery" and calls["n"] == n  # cache resume
        assert json.loads(cache.read_text())["0"] == "battery"

    def test_fallback_to_rules_when_voter_fails(self):
        def bad(topic):
            raise RuntimeError("no model")

        out = classify_aspects_llm({1: {"label": "sound and bass"}}, bad)
        assert out[1] == "sound"
