"""Density clustering (topics/density.py): exact kNN graph on device,
HDBSCAN-semantics labels (data-derived count, noise=-1, min_cluster_size),
and the measured comparison against spherical k-means that justifies the
lane (VERDICT r3 item 4 done-criterion)."""
import json

import numpy as np
import pytest

from review_recommender_tpu.topics.density import density_cluster, knn_graph


def blobs_with_noise(n_per=120, k=3, d=24, noise=60, spread=0.08, seed=0):
    """k tight spherical blobs + uniform-ish noise points. Returns
    (emb L2-normalized, truth with -1 for noise)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # keep blob centers well separated (resample near-duplicates)
    for i in range(1, k):
        while max(centers[i] @ centers[j] for j in range(i)) > 0.3:
            c = rng.standard_normal(d)
            centers[i] = c / np.linalg.norm(c)
    emb, truth = [], []
    for c in range(k):
        pts = centers[c] + spread * rng.standard_normal((n_per, d))
        emb.append(pts)
        truth += [c] * n_per
    emb.append(rng.standard_normal((noise, d)))  # isotropic = far from all
    truth += [-1] * noise
    emb = np.concatenate(emb).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb, np.asarray(truth)


class TestKnnGraph:
    def test_exact_vs_bruteforce(self):
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((73, 12)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        k = 7
        # small chunks force multi-block row AND column paths
        sims, idx = knn_graph(emb, k=k, batch_rows=16, col_chunk=32)
        full = emb @ emb.T
        for i in range(len(emb)):
            want = np.sort(full[i])[::-1][:k]
            np.testing.assert_allclose(sims[i], want, atol=1e-5)
            # indices score-equivalent to the brute-force ranking
            np.testing.assert_allclose(full[i, idx[i]], want, atol=1e-5)

    def test_self_in_graph_at_rank0(self):
        rng = np.random.default_rng(4)
        emb = rng.standard_normal((40, 8)).astype(np.float32)
        sims, idx = knn_graph(emb, k=3)
        assert (idx[:, 0] == np.arange(40)).all()
        np.testing.assert_allclose(sims[:, 0], 1.0, atol=1e-5)

    def test_empty(self):
        sims, idx = knn_graph(np.zeros((0, 8), np.float32), k=4)
        assert sims.shape == (0, 4) and idx.shape == (0, 4)


class TestDensityCluster:
    def test_recovers_count_and_noise(self):
        emb, truth = blobs_with_noise()
        labels, info = density_cluster(emb, min_samples=5,
                                       min_cluster_size=30, knn=12)
        # data-derived cluster count == planted count, NOT passed in
        assert info["n_clusters"] == 3, info
        # blob points cluster; each planted blob maps to ONE label
        for c in range(3):
            pred = labels[truth == c]
            assert (pred >= 0).mean() > 0.9, c
            vals, counts = np.unique(pred[pred >= 0], return_counts=True)
            assert counts.max() / counts.sum() > 0.99, (c, vals, counts)
        # isotropic noise points are mostly labeled -1
        assert (labels[truth == -1] == -1).mean() > 0.8, info

    def test_min_cluster_size_dissolves_runts(self):
        emb, truth = blobs_with_noise(n_per=120, k=3)
        # a size threshold above the blob size dissolves everything
        labels, info = density_cluster(emb, min_samples=5,
                                       min_cluster_size=500, knn=12)
        assert info["n_clusters"] == 0
        assert (labels == -1).all()

    def test_labels_ordered_by_size(self):
        rng = np.random.default_rng(7)
        big = rng.standard_normal((200, 16)) * 0.05 + 1.0
        small = rng.standard_normal((60, 16)) * 0.05 - 1.0
        emb = np.concatenate([small, big]).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        labels, info = density_cluster(emb, min_samples=4,
                                       min_cluster_size=10, knn=8)
        assert info["n_clusters"] == 2
        sizes = np.bincount(labels[labels >= 0])
        assert sizes[0] >= sizes[1]

    def test_deterministic(self):
        emb, _ = blobs_with_noise(seed=9)
        l1, i1 = density_cluster(emb, min_samples=5, min_cluster_size=20)
        l2, i2 = density_cluster(emb, min_samples=5, min_cluster_size=20)
        np.testing.assert_array_equal(l1, l2)
        assert i1 == i2

    def test_explicit_eps_respected(self):
        emb, _ = blobs_with_noise()
        _, info = density_cluster(emb, min_samples=5, min_cluster_size=10,
                                  eps=0.25)
        assert info["eps"] == pytest.approx(0.25)

    def test_empty(self):
        labels, info = density_cluster(np.zeros((0, 8), np.float32))
        assert labels.shape == (0,) and info["n_clusters"] == 0

    def test_small_diverse_corpus_pad_leak(self):
        """Regression (self-review r4): when a row's k-th real neighbor has
        NEGATIVE cosine sim, zero-vector padding columns (sim exactly 0.0)
        enter the top-k; their indices must not leak into edge building
        (crashed with IndexError on is_core[dst])."""
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((24, 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        labels, info = density_cluster(emb, min_samples=3,
                                       min_cluster_size=2)
        assert labels.shape == (24,)

    def test_too_few_neighbors_is_all_noise_not_a_crash(self):
        """Regression (self-review r4, round 2): when every row has fewer
        than min_samples real neighbors (tiny corpus), core distances are
        all non-finite and the eps quantile used to crash on an empty
        array — the corpus is trivially all noise instead."""
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((8, 384)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        labels, info = density_cluster(emb, min_samples=10)
        assert (labels == -1).all()
        assert info["n_clusters"] == 0 and info["noise"] == 8

    def test_single_row_corpus(self):
        """Regression (self-review r4, round 2): a 1-row corpus has width-0
        neighbor rows after the self-strip — all noise, not an IndexError."""
        labels, info = density_cluster(np.ones((1, 8), np.float32))
        assert labels.tolist() == [-1]
        assert info["n_clusters"] == 0

    def test_negative_sim_neighbors_stay_real(self):
        """Regression (self-review r4, round 2 root cause): zero-vector pad
        COLUMNS score sim 0.0 and used to displace real negative-sim
        neighbors from the device top-k; pads are now masked in-program, so
        every returned slot holds a real neighbor whenever one exists."""
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((20, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        sims, idx = knn_graph(emb, k=19, batch_rows=8, col_chunk=16)
        assert np.isfinite(sims).all()  # 19 real neighbors always exist
        assert (idx >= 0).all()

    def test_many_exact_duplicates(self):
        """Regression (self-review r4): > k_graph identical rows (repeated
        review texts) can exclude a row's SELF from its own top-k via the
        top_k index tie-break; the self-strip must still remove exactly one
        column per row (crashed with a reshape ValueError)."""
        rng = np.random.default_rng(1)
        dup = np.tile(rng.standard_normal((1, 12)).astype(np.float32),
                      (25, 1))
        rest = rng.standard_normal((200, 12)).astype(np.float32)
        emb = np.concatenate([dup, rest])
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        labels, info = density_cluster(emb, min_samples=10,
                                       min_cluster_size=20)
        assert labels.shape == (225,)
        # the 25 duplicates are the densest region: one cluster together
        dup_labels = labels[:25]
        assert (dup_labels >= 0).all()
        assert len(set(dup_labels.tolist())) == 1


class TestDensityVsKMeans:
    """The measured justification for keeping both lanes: on a noisy
    corpus, k-means at the WRONG K splits/merges blobs and has no noise
    concept; density clustering derives K and flags the noise — while on
    clustered points its purity matches k-means run at the oracle K."""

    def test_quality_on_noisy_corpus(self):
        from review_recommender_tpu.topics.cluster import spherical_kmeans

        emb, truth = blobs_with_noise(n_per=150, k=4, noise=80, seed=2)
        labels, info = density_cluster(emb, min_samples=5,
                                       min_cluster_size=40, knn=12)

        def purity(pred, tr):
            """mean over predicted clusters of their dominant-truth share
            (clustered points only)."""
            shares = []
            for c in np.unique(pred[pred >= 0]):
                t = tr[pred == c]
                # a cluster of pure noise-truth points scores 0 purity
                dom = np.bincount(t[t >= 0]).max() if (t >= 0).any() else 0
                shares.append(dom / max(len(t), 1))
            return float(np.mean(shares)) if shares else 0.0

        km_oracle, _ = spherical_kmeans(emb, k=4, iters=20, seed=0)
        assert info["n_clusters"] == 4  # derived, not given
        assert purity(labels, truth) >= purity(km_oracle, truth) - 0.02
        # k-means is forced to assign noise somewhere; density is not
        noise_mask = truth == -1
        assert (labels[noise_mask] == -1).mean() > 0.8
        assert (km_oracle[noise_mask] >= 0).all()


class TestShardedKnn:
    """knn_graph_sharded: corpus rows sharded over the (virtual 8-device)
    mesh; scores must match the single-chip graph exactly."""

    def test_parity_vs_single_chip(self):
        import jax

        from review_recommender_tpu.topics.density import knn_graph_sharded

        rng = np.random.default_rng(5)
        emb = rng.standard_normal((83, 16)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        k = 9
        s1, i1 = knn_graph(emb, k=k, batch_rows=32, col_chunk=32)
        n_dev = min(8, len(jax.devices()))
        s2, i2 = knn_graph_sharded(emb, k=k, n_shards=n_dev, batch_rows=32)
        np.testing.assert_allclose(s2, s1, atol=1e-5)
        # indices are score-equivalent (ties may break across shards)
        full = emb @ emb.T
        for r in range(len(emb)):
            np.testing.assert_allclose(full[r, i2[r]], s1[r], atol=1e-5)

    def test_parity_with_negative_sim_tails(self):
        """Regression (self-review r4, round 2): the two paths pad the
        corpus DIFFERENTLY (col_chunk vs per-shard), so any pad leakage
        into the top-k breaks parity exactly where neighbors have negative
        sims — the repro shape that failed before the in-program masks."""
        import jax

        from review_recommender_tpu.topics.density import knn_graph_sharded

        rng = np.random.default_rng(7)
        emb = rng.standard_normal((20, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        s1, _ = knn_graph(emb, k=19, batch_rows=8, col_chunk=16)
        n_dev = min(8, len(jax.devices()))
        s2, _ = knn_graph_sharded(emb, k=19, n_shards=n_dev, batch_rows=8)
        np.testing.assert_allclose(s2, s1, atol=1e-5)

    def test_more_shards_than_rows(self):
        """Degenerate scale: n=3 rows over an 8-device mesh (per-shard=1,
        5 pad rows) must still match the single-chip graph exactly."""
        import jax

        from review_recommender_tpu.topics.density import knn_graph_sharded

        rng = np.random.default_rng(0)
        emb = rng.standard_normal((3, 8)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        s1, _ = knn_graph(emb, k=5)  # k > n clamps to n
        n_dev = min(8, len(jax.devices()))
        s2, _ = knn_graph_sharded(emb, k=5, n_shards=n_dev)
        assert s1.shape == s2.shape == (3, 3)
        np.testing.assert_allclose(s2, s1, atol=1e-5)

    def test_density_cluster_over_mesh_matches(self):
        import jax

        emb, truth = blobs_with_noise(n_per=60, k=3, noise=30, seed=4)
        l1, info1 = density_cluster(emb, min_samples=4, min_cluster_size=20)
        n_dev = min(8, len(jax.devices()))
        l2, info2 = density_cluster(emb, min_samples=4, min_cluster_size=20,
                                    n_shards=n_dev)
        assert info1["n_clusters"] == info2["n_clusters"]
        assert info1["eps"] == pytest.approx(info2["eps"], abs=1e-6)
        # same partition up to label permutation
        for c in np.unique(l1):
            rows = l1 == c
            vals = np.unique(l2[rows])
            assert len(vals) == 1, (c, vals)


class TestDensityCLI:
    def test_topics_density_lane(self, tmp_path):
        """`rrt topics --cluster density` end-to-end: cards written, noise
        reviews excluded from the rollup."""
        from review_recommender_tpu.index.build import (
            build_bundle_from_products,
        )
        from review_recommender_tpu.index.io import save_bundle
        from review_recommender_tpu.serve.cli import main
        from tests.test_engine_parity import make_corpus

        products, emb, reviews, remb = make_corpus(n=24, dim=32, seed=11)
        d = tmp_path / "idx"
        save_bundle(
            build_bundle_from_products(
                products, emb, reviews=reviews, review_embeddings=remb,
                pad_multiple=8, doc_terms_cap=32,
            ),
            d,
        )
        out = tmp_path / "topics_out"
        rc = main(["topics", "--index-dir", str(d), "--out", str(out),
                   "--cluster", "density", "--min-samples", "3",
                   "--min-cluster-size", "4", "--min-reviews", "1"])
        assert rc == 0
        lines = [json.loads(l) for l in
                 (out / "topic_cards.jsonl").read_text().splitlines()]
        assert lines
        assert all(r["topic_id"] >= 0 for r in lines)
