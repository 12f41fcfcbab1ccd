"""End-to-end quality benchmark: build a themed synthetic corpus, index it,
run the four reference method configs, and emit the README-style table
(the reference's evals/run_benchmark.py flow, with honest judgments).

The corpus is generated from themed word banks (headphones / socks / knives
/ shoes / cables / ...), dense embeddings come from the deterministic BoW
projection encoder (models/bow.py) so the dense signal is real, and ground
truth is by construction: each query is generated from one theme and every
product of that theme is relevant.

Run: python examples/quality_table.py [--n-per-theme 40] [--out evals_out]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

THEMES = {
    "headphones": "wireless bluetooth headphones noise cancelling bass sound audio battery over ear comfortable pairing".split(),
    "socks": "socks cotton soft yellow cat kitten design cute warm cozy pair colorful".split(),
    "knives": "kitchen knife stainless steel sharp blade chef cutting handle balanced".split(),
    "shoes": "running shoes lightweight breathable mesh comfortable cushion sole lace support".split(),
    "cables": "usb cable charging fast durable braided connector charger cord port".split(),
    "tea": "green tea organic loose leaf antioxidant brew flavor natural healthy".split(),
    # confusable distractor themes: share vocabulary with a target theme but
    # are never relevant — these force the methods apart
    "speakers": "bluetooth speaker portable bass sound audio loud battery waterproof stereo wireless".split(),
    "boots": "leather boots waterproof hiking comfortable sole lace durable warm shoes".split(),
    "chargers": "wall charger usb fast charging adapter power port compact plug cable".split(),
    "coffee": "coffee beans organic roast ground flavor aroma brew fresh dark".split(),
}
DISTRACTORS = {"speakers", "boots", "chargers", "coffee"}
FILLER = "great good product quality really nice love works perfect recommend value price happy".split()

QUERIES = {
    "headphones": "wireless bluetooth headphones with noise cancelling",
    "socks": "yellow socks with cat design",
    "knives": "stainless steel kitchen knife sharp",
    "shoes": "comfortable running shoes lightweight",
    "cables": "usb fast charging cable durable",
    "tea": "organic green tea loose leaf",
}


def build_corpus(n_per_theme: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    all_words = sorted({w for ws in THEMES.values() for w in ws})
    products, reviews, truth = [], [], {}
    i = 0
    for theme, words in THEMES.items():
        truth[theme] = []
        for _ in range(n_per_theme):
            sku = f"{theme[:3].upper()}{i:04d}"
            truth[theme].append(sku)
            n_words = int(rng.integers(20, 60))
            # theme words + filler + cross-theme contamination (noise that
            # makes the signals disagree, like real review text does)
            toks = (list(rng.choice(words, size=n_words // 2))
                    + list(rng.choice(FILLER, size=n_words // 4))
                    + list(rng.choice(all_words, size=n_words // 4)))
            rng.shuffle(toks)
            products.append({
                "sku": sku,
                "agg_text": " ".join(toks),
                "n_reviews": float(rng.integers(3, 300)),
                "avg_stars": float(np.clip(rng.normal(4.1, 0.6), 1, 5)),
            })
            for _ in range(3):
                rtoks = list(rng.choice(words, size=6)) + list(rng.choice(FILLER, size=6))
                reviews.append({"sku": sku, "text": " ".join(rtoks),
                                "stars": float(rng.integers(1, 6))})
            i += 1
    return products, reviews, truth


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-per-theme", type=int, default=40)
    ap.add_argument("--out", default="evals_out")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.evals.benchmark import (
        format_results_table,
        run_performance_benchmark,
        save_benchmark_results,
    )
    from review_recommender_tpu.evals.queries import BENCHMARK_CONFIGS
    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.models.bow import (
        BowProjectionEncoder,
        OverlapCrossScorer,
    )

    products, reviews, truth = build_corpus(args.n_per_theme, args.seed)
    encoder = BowProjectionEncoder(dim=128, seed=7)
    emb = encoder.encode([p["agg_text"] for p in products])
    remb = encoder.encode([r["text"] for r in reviews])
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        doc_terms_cap=128, pad_multiple=64,
    )
    engine = SearchEngine(
        bundle, query_encoder=encoder, cross_encoder=OverlapCrossScorer(),
        gate_mode="host",
    )

    queries = [
        {"id": theme, "query": q, "relevant_skus": truth[theme]}
        for theme, q in QUERIES.items()  # distractor themes are never queried
    ]

    def search(q, **cfg):
        df, _s, _d = engine.run_search(q, **cfg)
        return df

    results = run_performance_benchmark(search, queries)
    save_benchmark_results(results, args.out)
    print(format_results_table(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
