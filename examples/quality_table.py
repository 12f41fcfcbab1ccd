"""End-to-end quality benchmark: build a large themed synthetic corpus,
index it, run the four reference method configs, and emit the README-style
table (the reference's evals/run_benchmark.py flow, with honest judgments).

Design (round-2 rework — the round-1 400-doc/6-query table hit the metric
ceiling and proved nothing):

  - corpus: `--themes` themes x `--per-theme` products (default 80 x 640 =
    51,200 docs), each theme a word bank drawn from a shared pseudo-word
    vocabulary so themes overlap and confuse the signals, plus filler.
  - judgments: `--queries` anchor FAMILIES. Each family is one anchor
    product plus 4 near-duplicate variants sharing ~60% of its tokens,
    planted among the 51k docs. The query is 5 keywords from the anchor's
    own text; exactly the 5 family members are relevant — honest by
    construction (the reference's recycled-ASIN judgments are not), and at
    5-in-51,200 the task is hard enough that the four methods separate.
  - dense signal: deterministic BoW projection encoder (models/bow.py);
    rerank: token-F1 overlap cross-scorer. Real (if simple) models, so the
    table measures the ENGINE's fusion behavior, not mock output.
  - latency columns are warm (each method config is compiled + run once
    before timing), measured around engine.run_search on whatever device
    JAX selects (the tunneled TPU on the bench box).

Run: python examples/quality_table.py [--themes 80] [--per-theme 640]
     [--queries 60] [--out evals_out]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FILLER = ("great good product quality really nice love works perfect "
          "recommend value price happy bought using daily sturdy arrived "
          "fast packaging exactly described month year still").split()

_CONS = list("bcdfghjklmnpqrstvwz")
_VOW = list("aeiou")


def _pseudo_word(rng) -> str:
    n = int(rng.integers(2, 5))
    return "".join(
        _CONS[int(rng.integers(len(_CONS)))] + _VOW[int(rng.integers(len(_VOW)))]
        for _ in range(n)
    )


def build_corpus(n_themes: int, per_theme: int, n_queries: int,
                 family: int = 5, seed: int = 0):
    rng = np.random.default_rng(seed)
    vocab = sorted({_pseudo_word(rng) for _ in range(3000)})
    theme_words = [
        list(rng.choice(vocab, size=14, replace=False))
        for _ in range(n_themes)
    ]

    products = []
    for t in range(n_themes):
        words = theme_words[t]
        for j in range(per_theme):
            n_words = int(rng.integers(24, 64))
            toks = (list(rng.choice(words, size=n_words // 2))
                    + list(rng.choice(FILLER, size=n_words // 4))
                    + list(rng.choice(vocab, size=n_words // 4)))
            rng.shuffle(toks)
            products.append({
                "sku": f"T{t:03d}P{j:04d}",
                "agg_text": " ".join(toks),
                "n_reviews": float(rng.integers(3, 300)),
                "avg_stars": float(np.clip(rng.normal(4.1, 0.6), 1, 5)),
            })

    # plant anchor families: anchor + (family-1) near-duplicates that share
    # ~60% of the anchor's tokens, overwriting members of the anchor's theme
    queries = []
    n = len(products)
    anchor_rows = rng.choice(n, size=n_queries, replace=False)
    for qi, row in enumerate(anchor_rows):
        anchor = products[int(row)]
        toks = anchor["agg_text"].split()
        fam = [anchor["sku"]]
        theme = int(anchor["sku"][1:4])
        for v in range(family - 1):
            victim = theme * per_theme + int(rng.integers(per_theme))
            while victim == int(row) or "V" in products[victim]["sku"]:
                victim = theme * per_theme + int(rng.integers(per_theme))
            keep = rng.random(len(toks)) < 0.6
            vtoks = ([t for t, k in zip(toks, keep) if k]
                     + list(rng.choice(theme_words[theme],
                                       size=max(1, (~keep).sum() // 2))))
            rng.shuffle(vtoks)
            sku = f"T{theme:03d}V{qi:03d}{v}"
            products[victim] = {**products[victim], "sku": sku,
                                "agg_text": " ".join(vtoks)}
            fam.append(sku)
        kw = sorted({t for t in toks if len(t) >= 4})
        pick = rng.choice(len(kw), size=min(5, len(kw)), replace=False)
        queries.append({
            "id": f"q{qi:03d}",
            "query": " ".join(kw[i] for i in sorted(pick)),
            "relevant_skus": sorted(set(fam)),
        })
    return products, queries


def build_trained_towers(products, queries, *, seed: int = 0,
                         n_pairs: int = 8192, log=print):
    """Train BOTH query towers from scratch on the corpus itself — the
    in-repo answer to 'no pretrained weights can be downloaded here'.

    Self-supervised recipe (the same weak supervision train/data.py mines
    from real review corpora): query = 5 keywords sampled from a document,
    positive = that document; the bi-encoder trains with in-batch-negative
    InfoNCE (train/contrastive.py) and the cross-encoder with pointwise BCE
    over same-theme hard negatives (train/cross_encoder.py) — same-theme
    docs share the query's word bank, so they are exactly the confusables
    the rerank stage must learn to reject.

    Honesty: every document belonging to an eval anchor family
    (queries[*].relevant_skus) is EXCLUDED from pair mining, so the towers
    never see an eval-relevant document paired with anything at train time.
    """
    from collections import defaultdict

    from review_recommender_tpu.models.bert import (
        BertConfig,
        init_biencoder,
        init_crossencoder,
    )
    from review_recommender_tpu.models.encoder import BiEncoder, CrossEncoder
    from review_recommender_tpu.models.tokenizer import HashTokenizer
    from review_recommender_tpu.train import (
        ContrastiveTrainer,
        CrossEncoderTrainer,
        CrossTrainConfig,
        TrainConfig,
        mine_triples,
        train_biencoder,
        train_crossencoder,
    )

    fam: set = set()
    for q in queries:
        fam.update(q["relevant_skus"])
    train_docs = [p for p in products if p["sku"] not in fam]

    rng = np.random.default_rng(seed + 101)
    sample = rng.choice(len(train_docs),
                        size=min(n_pairs, len(train_docs)), replace=False)
    pairs, theme_of = [], {}
    for i in sample:
        p = train_docs[int(i)]
        toks = sorted({t for t in p["agg_text"].split() if len(t) >= 4})
        if len(toks) < 5:
            continue
        pick = rng.choice(len(toks), size=5, replace=False)
        q = " ".join(toks[j] for j in sorted(pick))
        pairs.append((q, p["agg_text"]))
        theme_of[q] = int(p["sku"][1:4])
    # theme-sort + block batching: every in-batch negative shares the
    # positive's theme word bank, so InfoNCE must learn WHICH same-theme
    # doc the keywords came from (doc-level, not topic-level, matching) —
    # globally shuffled batches plateau at topic-level and lose to BoW
    pairs.sort(key=lambda qd: theme_of[qd[0]])

    tok = HashTokenizer(vocab_size=8192)
    batch, bi_epochs = 64, 6

    # --- bi-encoder: 2-layer 256-wide tower, InfoNCE over the MXU
    t0 = time.perf_counter()
    cfg_bi = BertConfig(vocab_size=8192, hidden_size=256, num_layers=2,
                        num_heads=4, intermediate_size=512, max_position=96)
    _, params_bi = init_biencoder(cfg_bi, seed=seed)
    steps = (len(pairs) // batch) * bi_epochs
    tr_bi = ContrastiveTrainer(
        cfg_bi, params_bi,
        train_cfg=TrainConfig(learning_rate=1e-3, seed=seed,
                              total_steps=steps),
    )
    hist = train_biencoder(tr_bi, pairs, tok, batch_size=batch,
                           epochs=bi_epochs, max_len=96, seed=seed,
                           batch_order_only=True)
    log(f"bi-encoder: {len(pairs)} pairs, {len(hist)} steps, "
        f"final loss {hist[-1]['loss']:.3f} "
        f"in-batch acc {hist[-1]['in_batch_acc']:.3f} "
        f"({time.perf_counter() - t0:.1f}s)")
    bi = BiEncoder(cfg_bi, tr_bi.params, tok, max_len=96)

    # --- cross-encoder: 2-layer 128-wide pair scorer, 2 same-theme hard
    # negatives + 1 random negative per positive
    t0 = time.perf_counter()
    by_theme = defaultdict(list)
    for p in train_docs:
        by_theme[int(p["sku"][1:4])].append(p["agg_text"])
    neg_rng = np.random.default_rng(seed + 202)

    def same_theme_negatives(query, k):
        docs = by_theme[theme_of[query]]
        n = min(2, k, len(docs))  # cap at 2: the 3rd slot fills randomly
        idx = neg_rng.choice(len(docs), size=n, replace=False)
        return [docs[int(j)] for j in idx]

    triples = mine_triples(pairs, [p["agg_text"] for p in train_docs],
                           n_negatives=3,
                           hard_negative_fn=same_theme_negatives,
                           seed=seed + 303)
    # same trunk dims as the bi-encoder so its trained encoder grafts in —
    # from a random trunk the BCE head collapses to the label base rate
    # (see train/cross_encoder.py:warm_start_from_biencoder)
    from review_recommender_tpu.train.cross_encoder import (
        warm_start_from_biencoder,
    )

    cfg_xe = BertConfig(vocab_size=8192, hidden_size=256, num_layers=2,
                        num_heads=4, intermediate_size=512, max_position=128)
    _, params_xe = init_crossencoder(cfg_xe, seed=seed)
    params_xe = warm_start_from_biencoder(params_xe, tr_bi.params)
    xe_epochs = 4
    steps = (len(triples) // batch) * xe_epochs
    tr_xe = CrossEncoderTrainer(
        cfg_xe, params_xe,
        train_cfg=CrossTrainConfig(learning_rate=3e-4, seed=seed,
                                   total_steps=steps),
    )
    hist = train_crossencoder(tr_xe, triples, tok, batch_size=batch,
                              epochs=xe_epochs, max_len=128, seed=seed)
    recent = hist[-50:]
    log(f"cross-encoder: {len(triples)} triples, {len(hist)} steps, "
        f"final-50 loss {np.mean([m['loss'] for m in recent]):.3f} "
        f"acc {np.mean([m['acc'] for m in recent]):.3f} "
        f"(base rate 0.75) ({time.perf_counter() - t0:.1f}s)")
    xe = CrossEncoder(cfg_xe, tr_xe.params, tok, max_len=128)
    return bi, xe


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--themes", type=int, default=80)
    ap.add_argument("--per-theme", type=int, default=640)
    ap.add_argument("--queries", type=int, default=60)
    ap.add_argument("--out", default="evals_out")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gate-mode", default="host", choices=["host", "device"])
    ap.add_argument("--dense-pool", default="exact",
                    choices=["exact", "striped"],
                    help="striped = 2-stage stripe-max pool "
                         "(DENSE_POOL_MODE) — run both and diff the table "
                         "to see the quality cost of the ~0.99-recall pool")
    ap.add_argument("--trained", action="store_true",
                    help="train tiny bi-/cross-encoder towers on the corpus "
                         "(eval families held out) instead of the BoW/"
                         "overlap stand-ins — the full train->index->serve "
                         "loop with zero downloads")
    args = ap.parse_args(argv)

    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.evals.benchmark import (
        format_results_table,
        run_performance_benchmark,
        save_benchmark_results,
    )
    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.models.bow import (
        BowProjectionEncoder,
        OverlapCrossScorer,
    )

    t0 = time.perf_counter()
    products, queries = build_corpus(args.themes, args.per_theme,
                                     args.queries, seed=args.seed)
    print(f"corpus: {len(products)} docs, {len(queries)} judged queries "
          f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    log = lambda *a: print(*a, file=sys.stderr)
    if args.trained:
        encoder, cross = build_trained_towers(products, queries,
                                              seed=args.seed, log=log)
    else:
        encoder, cross = BowProjectionEncoder(dim=384, seed=7), None
    t0 = time.perf_counter()
    emb = encoder.encode([p["agg_text"] for p in products])
    print(f"encode: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    bundle = build_bundle_from_products(
        products, emb, doc_terms_cap=128, pad_multiple=256,
    )
    print(f"index: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    if cross is None:
        # idf-weighted overlap rerank: weights from the index vocabulary
        idf_map = {t: float(bundle.products.idf[i])
                   for t, i in bundle.products.vocab.items()}
        cross = OverlapCrossScorer(idf=idf_map)
    engine = SearchEngine(
        bundle, query_encoder=encoder,
        cross_encoder=cross,
        gate_mode=args.gate_mode, dense_pool=args.dense_pool,
    )

    def search(q, **cfg):
        df, _s, _d = engine.run_search(q, **cfg)
        return df

    results = run_performance_benchmark(search, queries, warmup=True)
    save_benchmark_results(results, args.out)
    print(format_results_table(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
