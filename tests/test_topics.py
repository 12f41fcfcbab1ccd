"""Topic subsystem tests: clustering recovers planted structure, TF-IDF
naming, aspect metrics, resume-safe card generation."""
import json

import numpy as np
import pytest

from review_recommender_tpu.topics import (
    aspect_metrics,
    generate_topic_cards,
    kmeans_sanity,
    map_label_to_aspect,
    name_topics,
    name_topics_llm,
    pick_quotes,
    spherical_kmeans,
    tfidf_topic_terms,
)


def planted_clusters(n_per=40, k=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    emb, truth = [], []
    for c in range(k):
        pts = centers[c] + 0.1 * rng.standard_normal((n_per, d))
        emb.append(pts)
        truth += [c] * n_per
    return np.concatenate(emb).astype(np.float32), np.array(truth)


class TestKMeans:
    def test_recovers_planted_clusters(self):
        emb, truth = planted_clusters()
        ids, centers = spherical_kmeans(emb, k=4, iters=20, seed=1)
        assert centers.shape == (4, 16)
        # every planted cluster maps to one dominant predicted cluster
        for c in range(4):
            pred = ids[truth == c]
            dominant = np.bincount(pred).max() / len(pred)
            assert dominant > 0.9, (c, dominant)

    def test_minibatch_matches_shapes(self):
        emb, _ = planted_clusters(n_per=30)
        ids, _ = spherical_kmeans(emb, k=4, iters=5, batch_rows=32)
        assert ids.shape == (120,)
        assert ids.max() < 4

    def test_empty_input(self):
        ids, centers = spherical_kmeans(np.zeros((0, 8), np.float32), k=3)
        assert ids.shape == (0,)

    def test_sanity_report(self):
        emb, _ = planted_clusters()
        rep = kmeans_sanity(emb, k=4, sample=100)
        assert rep["nonempty"] >= 2
        assert 0 < rep["largest_share"] <= 1


class TestNaming:
    TEXTS = [
        "battery life battery charge power great",
        "battery charging power bank charge",
        "sound quality bass audio great sound",
        "audio sound volume bass excellent",
    ]
    TIDS = [0, 0, 1, 1]

    def test_tfidf_terms_discriminate(self):
        terms = tfidf_topic_terms(self.TEXTS, self.TIDS, min_df=1)
        assert "battery" in terms[0][:4]
        assert "sound" in terms[1][:4] or "audio" in terms[1][:4]

    def test_name_topics(self):
        labels = name_topics({0: ["battery", "charge", "power", "x"], 1: []})
        assert labels[0] == "battery charge power"
        assert labels[1] == "topic 1"

    def test_llm_naming_cache_and_fallback(self, tmp_path):
        calls = {"n": 0}

        def flaky(terms):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient")
            return "Battery & Charging"

        cache = tmp_path / "cache.json"
        labels = name_topics_llm({0: ["battery", "charge"]}, flaky,
                                 cache_path=cache)
        assert labels[0] == "Battery & Charging"
        # resume: cached, no new calls
        n = calls["n"]
        labels2 = name_topics_llm({0: ["battery", "charge"]}, flaky,
                                  cache_path=cache)
        assert labels2[0] == "Battery & Charging" and calls["n"] == n

    def test_aspects(self):
        assert map_label_to_aspect("battery charge life") == "battery"
        assert map_label_to_aspect("weird unknown thing") == "other"
        rows = aspect_metrics(
            [0, 0, 1, 1], [1.0, 2.0, 5.0, 5.0],
            {0: "battery charge", 1: "sound bass"},
        )
        battery = [r for r in rows if r["aspect"] == "battery"][0]
        assert battery["n_reviews"] == 2
        assert battery["avg_stars"] == 1.5
        # worst aspect sorts first by lost rating
        assert rows[0]["aspect"] == "battery"


class TestCards:
    def test_pick_quotes_central_and_deduped(self):
        emb, _ = planted_clusters(n_per=10, k=1, d=8)
        texts = [f"quote number {i} about the product" for i in range(10)]
        texts[3] = texts[2]  # duplicate
        center = emb.mean(axis=0)
        quotes = pick_quotes(texts, emb, center, n_quotes=3)
        assert len(quotes) == 3
        assert len(set(q[:60] for q in quotes)) == 3

    def test_resume_safe_generation(self, tmp_path):
        topics = [
            {"topic_id": i, "label": f"label {i}", "n_reviews": i + 1,
             "quotes": [f"quote for {i}"]}
            for i in range(5)
        ]
        out = tmp_path / "cards.jsonl"
        calls = {"n": 0}

        def gen(t):
            calls["n"] += 1
            return {"headline": t["label"].upper(), "summary": "s"}

        df = generate_topic_cards(topics, out, generator=gen,
                                  parquet_out=tmp_path / "cards.parquet")
        assert len(df) == 5 and calls["n"] == 5
        assert (tmp_path / "cards.parquet").exists()

        # resume: nothing regenerated, new topic appended
        df2 = generate_topic_cards(
            topics + [{"topic_id": 9, "label": "new", "quotes": []}],
            out, generator=gen,
        )
        assert len(df2) == 6 and calls["n"] == 6
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) == 6


class TestThroughputBenchmark:
    def test_benchmark_generator_report(self):
        from review_recommender_tpu.topics.cards import benchmark_generator

        topics = [{"topic_id": i, "label": f"t{i}",
                   "quotes": [f"quote {j} for topic {i}" * 4
                              for j in range(6)]}
                  for i in range(20)]
        seen_quote_counts = []

        def gen(topic):
            seen_quote_counts.append(len(topic["quotes"]))
            return {"headline": topic["label"], "summary": "s"}

        report = benchmark_generator(
            topics, gen, n_topics=4, total_topics=100,
            configs={"small": {"n_quotes": 2, "max_chars": 30},
                     "big": {"n_quotes": 6}},
        )
        assert set(report) == {"small", "big"}
        for cfg in report.values():
            assert cfg["n_sampled"] == 4
            assert cfg["s_per_card"] >= 0
            assert cfg["eta_s_for_total"] == pytest.approx(
                cfg["s_per_card"] * 100, rel=0.01)
        # knobs actually applied: first 4 calls saw 2 quotes, next 4 saw 6
        assert seen_quote_counts[:4] == [2, 2, 2, 2]
        assert seen_quote_counts[4:] == [6, 6, 6, 6]


class TestTopicsCLI:
    @pytest.fixture(scope="class")
    def index_dir(self, tmp_path_factory):
        from review_recommender_tpu.index.build import (
            build_bundle_from_products,
        )
        from review_recommender_tpu.index.io import save_bundle
        from tests.test_engine_parity import make_corpus

        products, emb, reviews, remb = make_corpus(n=24, dim=32, seed=11)
        d = tmp_path_factory.mktemp("topics_cli") / "idx"
        save_bundle(
            build_bundle_from_products(
                products, emb, reviews=reviews, review_embeddings=remb,
                pad_multiple=8, doc_terms_cap=32,
            ),
            d,
        )
        return str(d)

    def test_topics_subcommand_writes_cards(self, index_dir, tmp_path,
                                            capsys):
        from review_recommender_tpu.serve.cli import main

        out = tmp_path / "topics_out"
        rc = main(["topics", "--index-dir", index_dir, "--out", str(out),
                   "--k", "4", "--iters", "5", "--min-reviews", "1"])
        assert rc == 0
        lines = [json.loads(l)
                 for l in (out / "topic_cards.jsonl").read_text().splitlines()]
        assert lines and all(
            {"topic_id", "label", "headline", "summary"} <= set(r)
            for r in lines
        )
        metrics = json.loads((out / "aspect_metrics.json").read_text())
        assert metrics and all("lost_rating" in m for m in metrics)
        # resume: a second run appends nothing new
        n_before = len(lines)
        rc = main(["topics", "--index-dir", index_dir, "--out", str(out),
                   "--k", "4", "--iters", "5", "--min-reviews", "1"])
        assert rc == 0
        n_after = len((out / "topic_cards.jsonl").read_text().splitlines())
        assert n_after == n_before

    def test_topics_subcommand_llm_end_to_end(self, index_dir, tmp_path,
                                              monkeypatch):
        """VERDICT r3 item 3 done-criterion: `rrt topics --llm openai:URL`
        works end-to-end against an (in-process fake) OpenAI-wire server —
        LLM labels/aspects land in the cards and aspect metrics, and the
        evidence cache makes the second run network-free."""
        from review_recommender_tpu.serve.cli import main
        from tests.test_llm_clients import FakeLLMServer

        srv = FakeLLMServer()
        monkeypatch.setenv("OPENAI_API_KEY", "sk-fake")
        monkeypatch.delenv("LLM_DRY_RUN", raising=False)
        try:
            out = tmp_path / "topics_llm"
            argv = ["topics", "--index-dir", index_dir, "--out", str(out),
                    "--k", "3", "--iters", "5", "--min-reviews", "1",
                    "--llm", f"openai:{srv.url}", "--llm-model", "fake-m"]
            assert main(argv) == 0
            n_calls = len(srv.httpd.hits)
            assert n_calls >= 1
            rows = [json.loads(l) for l in
                    (out / "topic_cards.jsonl").read_text().splitlines()]
            assert all(r["label"] == "battery life" for r in rows)
            metrics = json.loads((out / "aspect_metrics.json").read_text())
            assert {m["aspect"] for m in metrics} == {"quality"}
            assert (out / "_llm_topic_cache.json").exists()
            # resume: the evidence cache answers everything
            assert main(argv) == 0
            assert len(srv.httpd.hits) == n_calls
        finally:
            srv.close()

    def test_topics_subcommand_llm_dry(self, index_dir, tmp_path):
        """`--llm dry` runs the full LLM code path with zero network."""
        from review_recommender_tpu.serve.cli import main

        out = tmp_path / "topics_dry"
        rc = main(["topics", "--index-dir", index_dir, "--out", str(out),
                   "--k", "3", "--iters", "5", "--min-reviews", "1",
                   "--llm", "dry"])
        assert rc == 0
        rows = [json.loads(l) for l in
                (out / "topic_cards.jsonl").read_text().splitlines()]
        # dry labels derive from each topic's own first quote
        assert rows and all(r["label"] for r in rows)

    def test_topics_subcommand_bench(self, index_dir, capsys):
        from review_recommender_tpu.serve.cli import main

        rc = main(["topics", "--index-dir", index_dir, "--bench",
                   "--k", "4", "--iters", "5", "--min-reviews", "1",
                   "--sample-bench", "2"])
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        assert report["n_topics"] >= 1
        assert set(report["configs"]) == {"default", "fast"}
        for cfg in report["configs"].values():
            assert cfg["eta_s_for_total"] >= 0
