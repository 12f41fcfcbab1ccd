"""Shard-count invariance sweep (VERDICT r4 item 8).

The "sharding must never change scores" invariant, checked ACROSS shard
counts instead of only at the v5e-8 stand-in's n=8: the fused hybrid path,
the striped-scan mesh pool, and the packed-BM25 mesh kernel run at
n_shards in {2, 4, 8} on submeshes of the 8 virtual CPU devices and must
reproduce the single-chip engine's scores; n=16 runs the same check in a
subprocess with xla_force_host_platform_device_count=16 (device count is
fixed at jax init, so >8 needs its own process).

Capacity side: the 10M-row int8 HBM-fit numbers at v5e-8 geometry come
from the same cost model as examples/capacity_table.py (committed table:
evals_out/capacity_v5e8.md) and are asserted here.
"""
import os
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.ops.fusion import FusionWeights
from review_recommender_tpu.parallel.sharded import ShardedSearchEngine
from tests import oracle
from tests.test_engine_parity import make_corpus

SHARD_COUNTS = (2, 4, 8)


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n=96, dim=64, seed=4)


@pytest.fixture(scope="module")
def bundle(corpus):
    products, emb, reviews, remb = corpus
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64,
    )


@pytest.fixture(scope="module")
def single_df(bundle):
    """Single-chip run_search output — the invariant target."""
    eng = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    q = _qvec(77)
    df, _s, _d = eng.run_search(
        "wireless bluetooth headphones noise cancelling", qvec=q, k=12,
        rerank_k=0, w_dense=0.5, w_bm25=0.3, w_rerank=0.0, w_prior=0.2,
        w_best=0.0, prior_C=20.0, min_reviews=5, gate_penalty=0.3,
    )
    return q, df


def _qvec(seed, dim=64):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


@pytest.mark.integration
@pytest.mark.parametrize("n_shards", SHARD_COUNTS)
class TestShardCountInvariance:
    def test_fused_run_search(self, bundle, single_df, n_shards):
        q, df_s = single_df
        eng = ShardedSearchEngine(bundle, n_shards=n_shards,
                                  emb_dtype="float32")
        assert eng.n_shards == n_shards
        df_m, _snips, dbg = eng.run_search(
            "wireless bluetooth headphones noise cancelling", qvec=q, k=12,
            rerank_k=0, w_dense=0.5, w_bm25=0.3, w_rerank=0.0, w_prior=0.2,
            w_best=0.0, prior_C=20.0, min_reviews=5, gate_penalty=0.3,
        )
        assert dbg["n_shards"] == n_shards
        np.testing.assert_allclose(
            df_m["_final"].to_numpy(), df_s["_final"].to_numpy(),
            rtol=2e-4, atol=2e-5,
        )
        for i, (a, b) in enumerate(zip(df_m["sku"], df_s["sku"])):
            if a != b:  # near-tie swaps only
                assert abs(df_m["_final"][i] - df_s["_final"][i]) < 1e-4

    def test_striped_pool_scores(self, bundle, corpus, n_shards):
        """Striped-scan mesh pool: exact scores at every shard count (the
        tiny corpus keeps per-shard stripes >= local rows, so the pool is
        lossless and must match the dense oracle exactly)."""
        products, emb, *_ = corpus
        eng = ShardedSearchEngine(bundle, n_shards=n_shards,
                                  emb_dtype="float32", dense_pool="striped")
        assert eng.dense_pool == "striped"
        V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        q = _qvec(13)
        idx, scores = eng.dense_topk(q, k=10)
        ref_idx, ref_scores = oracle.cosine_topk_np(q, V, 10)
        np.testing.assert_allclose(
            np.asarray(scores), ref_scores, rtol=1e-5, atol=1e-6
        )
        assert set(np.asarray(idx).tolist()) == set(ref_idx.tolist())

    def test_packed_bm25_scores(self, bundle, corpus, n_shards):
        """Packed-transposed BM25 mesh kernel (interpret mode on the CPU
        mesh) vs the rank_bm25-convention oracle at every shard count."""
        products, *_ = corpus
        from review_recommender_tpu.utils.text import (
            tokenize_document,
            tokenize_query,
        )

        eng = ShardedSearchEngine(bundle, n_shards=n_shards,
                                  emb_dtype="float32")
        eng._pallas_interpret = True
        if not eng._pallas_ok():
            pytest.skip("pallas interpret mode unavailable")
        query = "wireless bluetooth headphones noise cancelling"
        idx, scores = eng.bm25_topk(query, k=15)
        assert eng._bm25_packed_cache is not None
        texts = [p["agg_text"] for p in products]
        bm25 = oracle.BM25OkapiOracle([tokenize_document(t) for t in texts])
        ref = bm25.get_scores(tokenize_query(query))
        order = np.argsort(-ref, kind="stable")[:15]
        np.testing.assert_allclose(
            np.sort(np.asarray(scores))[::-1], np.sort(ref[order])[::-1],
            rtol=1e-4, atol=1e-5,
        )


_SUBPROC_SCRIPT = textwrap.dedent("""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["COMPILE_CACHE_DIR"] = ""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=16").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 16, len(jax.devices())
    import numpy as np
    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.parallel.sharded import ShardedSearchEngine
    from tests.test_engine_parity import make_corpus

    products, emb, reviews, remb = make_corpus(n=96, dim=64, seed=4)
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64)
    rng = np.random.default_rng(77)
    q = rng.standard_normal(64).astype(np.float32)
    q /= np.linalg.norm(q)
    kw = dict(k=12, rerank_k=0, w_dense=0.5, w_bm25=0.3, w_rerank=0.0,
              w_prior=0.2, w_best=0.0, prior_C=20.0, min_reviews=5,
              gate_penalty=0.3)
    query = "wireless bluetooth headphones noise cancelling"
    df_s, _, _ = SearchEngine(
        bundle, emb_dtype="float32", gate_mode="device"
    ).run_search(query, qvec=q, **kw)
    eng = ShardedSearchEngine(bundle, n_shards=16, emb_dtype="float32")
    assert eng.n_shards == 16
    df_m, _, dbg = eng.run_search(query, qvec=q, **kw)
    assert dbg["n_shards"] == 16
    np.testing.assert_allclose(df_m["_final"].to_numpy(),
                               df_s["_final"].to_numpy(),
                               rtol=2e-4, atol=2e-5)
    # striped mesh pool at 16 shards vs oracle
    V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    es = ShardedSearchEngine(bundle, n_shards=16, emb_dtype="float32",
                             dense_pool="striped")
    idx, scores = es.dense_topk(q, k=10)
    sims = V @ q
    ref = np.sort(sims)[::-1][:10]
    np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-5,
                               atol=1e-6)
    print("OK16")
""")


@pytest.mark.integration
@pytest.mark.slow
def test_sixteen_shards_subprocess():
    """16 virtual devices need their own process (xla device count is
    pinned at init; conftest pins this one to 8)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SUBPROC_SCRIPT],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK16" in proc.stdout


class TestCapacityModel:
    def test_10m_int8_fits_v5e8(self):
        """10M rows at D=384/L=64 int8+striped: ~12.7 GiB total — tight on
        ONE chip (79%), comfortable per chip on a v5e-8 (<2 GiB). Same
        cost model as evals_out/capacity_v5e8.md."""
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "examples"))
        from capacity_table import V5E_HBM_GIB, build_table

        from review_recommender_tpu.index.schema import check_hbm_fit

        table = build_table()
        assert "| 10M |" in table
        # the per-doc constant the table derives must match the bench's
        # measured footprints (1M = 1.27 GiB, 5M = 6.37 GiB in
        # BENCH_r04/evals_out/bench_r4_validation.jsonl)
        import re

        m = re.search(r"Per-doc bytes at this geometry: ([0-9.]+)", table)
        per_doc = float(m.group(1))
        assert abs(per_doc * 1e6 / 2**30 - 1.27) < 0.02  # 1M rows
        rep1 = check_hbm_fit(int(10e6 * per_doc), n_shards=1,
                             limit_bytes=V5E_HBM_GIB * 2**30)
        rep8 = check_hbm_fit(int(10e6 * per_doc), n_shards=8,
                             limit_bytes=V5E_HBM_GIB * 2**30)
        assert rep1["fits"] and not rep1["warn"]
        assert rep8["fits"] and rep8["per_device_bytes"] < 2 * 2**30

    def test_committed_table_is_current(self):
        """evals_out/capacity_v5e8.md must match what the script generates
        (stale-artifact guard, same spirit as the roofline doc sweep)."""
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "examples"))
        from capacity_table import build_table

        committed = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "evals_out", "capacity_v5e8.md")
        if not os.path.exists(committed):
            pytest.skip("capacity table not committed yet")
        with open(committed) as f:
            assert f.read() == build_table()
