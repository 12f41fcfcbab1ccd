"""Rerank-lane experiment harness: find the recipe where Hybrid+Rerank
WINS the quality table (VERDICT r3 item 1).

Runs the quality_table corpus at a reduced size for fast iteration,
evaluates Hybrid vs Hybrid+Rerank for several rerank scorers / trained
cross-encoder recipes, and prints a comparison table. The winning recipe
graduates into examples/quality_table.py.

Variants:
  overlap       idf-weighted coverage stand-in (round-2 default lane)
  trained       round-2 recipe: 2L trunk, 2000 MLM steps, theme negatives
  trained-big   4L trunk, more MLM steps, more pairs
  trained-eng   trained-big + ENGINE-pool hard negatives (the distractors
                the rerank actually sees at eval time)

Usage: python examples/rerank_experiments.py [--variants overlap,trained-eng]
       [--themes 40] [--per-theme 320] [--queries 30]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.quality_table import build_corpus, keyword_query  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mine_training_pairs(train_docs, *, n_pairs, seed):
    """(5-keyword query, positive doc) pairs in the eval query style."""
    rng = np.random.default_rng(seed)
    sample = rng.choice(len(train_docs), size=min(n_pairs, len(train_docs)),
                        replace=False)
    pairs, theme_of = [], {}
    for i in sample:
        p = train_docs[int(i)]
        q = keyword_query(rng, p["agg_text"])
        if q is None:
            continue
        pairs.append((q, p["agg_text"]))
        theme_of[q] = int(p["sku"][1:4])
    return pairs, theme_of


def make_family_positives(pos_text, theme_vocab, rng, n_variants=2):
    """Synthetic near-duplicates of a positive doc built EXACTLY like the
    corpus's family variants (keep ~60% of tokens, pad with theme words):
    the relevance relation the rerank must score at eval time. Training
    positives without these have 5/5 query-keyword coverage while eval
    family variants have ~3/5 — the distribution mismatch that kept the
    trained rerank at hybrid parity (measured: every recipe won MRR but
    lost nDCG@10 before this augmentation)."""
    toks = pos_text.split()
    out = []
    for _ in range(n_variants):
        keep = rng.random(len(toks)) < 0.6
        kept = [t for t, k in zip(toks, keep) if k]
        pad = list(rng.choice(theme_vocab,
                              size=max(1, int((~keep).sum()) // 2)))
        v = kept + pad
        rng.shuffle(v)
        out.append(" ".join(v))
    return out


def train_ce(products, queries, *, layers, mlm_steps, n_pairs,
             engine_negatives=None, seed=0, hidden=256, epochs_hard=2,
             lr_mlm=5e-4, lr_ft=1e-4, family_positives=0):
    """MLM -> graft -> BCE curriculum cross-encoder.

    engine_negatives: optional {query: [doc_text, ...]} map of engine-pool
    hard negatives (top non-relevant retrievals for the training queries).
    family_positives: add N synthetic near-duplicate positives per pair to
    the hard stage (see make_family_positives) — also balances the BCE
    labels (3 pos : 3 neg instead of 1 : 3).
    """
    from collections import defaultdict

    from review_recommender_tpu.models.bert import (
        BertConfig,
        init_crossencoder,
    )
    from review_recommender_tpu.models.encoder import CrossEncoder
    from review_recommender_tpu.models.tokenizer import HashTokenizer
    from review_recommender_tpu.train import (
        CrossEncoderTrainer,
        CrossTrainConfig,
        MLMTrainConfig,
        MLMTrainer,
        init_mlm,
        mine_triples,
        pretrain_mlm,
        train_crossencoder,
    )
    from review_recommender_tpu.train.cross_encoder import (
        warm_start_from_biencoder,
    )

    fam = set()
    for q in queries:
        fam.update(q["relevant_skus"])
    train_docs = [p for p in products if p["sku"] not in fam]
    texts = [p["agg_text"] for p in train_docs]
    tok = HashTokenizer(vocab_size=8192)
    cfg = BertConfig(vocab_size=8192, hidden_size=hidden, num_layers=layers,
                     num_heads=hidden // 64, intermediate_size=2 * hidden,
                     max_position=128)
    batch = 64

    t0 = time.perf_counter()
    _, mlm_params = init_mlm(cfg, seed=seed)
    mtr = MLMTrainer(cfg, mlm_params,
                     train_cfg=MLMTrainConfig(learning_rate=lr_mlm,
                                              seed=seed,
                                              total_steps=mlm_steps))
    hist = pretrain_mlm(mtr, texts, tok, batch_size=batch, steps=mlm_steps,
                        max_len=96, seed=seed, log_every=0)
    log(f"  mlm {mlm_steps} steps L={layers}: masked acc "
        f"{np.mean([m['masked_acc'] for m in hist[-100:]]):.3f} "
        f"({time.perf_counter() - t0:.0f}s)")

    pairs, theme_of = mine_training_pairs(train_docs, n_pairs=n_pairs,
                                          seed=seed + 101)
    easy = mine_triples(pairs, texts, n_negatives=1, seed=seed + 7)

    by_theme = defaultdict(list)
    for p in train_docs:
        by_theme[int(p["sku"][1:4])].append(p["agg_text"])
    neg_rng = np.random.default_rng(seed + 202)

    if engine_negatives is not None:
        def hard_fn(query, k):
            negs = engine_negatives.get(query, [])
            if len(negs) >= 2:
                idx = neg_rng.choice(len(negs), size=min(2, len(negs)),
                                     replace=False)
                return [negs[int(j)] for j in idx]
            docs = by_theme[theme_of[query]]
            idx = neg_rng.choice(len(docs), size=min(2, len(docs)),
                                 replace=False)
            return [docs[int(j)] for j in idx]
    else:
        def hard_fn(query, k):
            docs = by_theme[theme_of[query]]
            n = min(2, k, len(docs))
            idx = neg_rng.choice(len(docs), size=n, replace=False)
            return [docs[int(j)] for j in idx]

    hard = mine_triples(pairs, texts, n_negatives=3,
                        hard_negative_fn=hard_fn, seed=seed + 303)
    if family_positives:
        fam_rng = np.random.default_rng(seed + 404)
        by_theme_words = {
            t: sorted({w for d in docs for w in d.split()})
            for t, docs in by_theme.items()
        }
        extra = []
        for q, pos in pairs:
            tv = by_theme_words[theme_of[q]]
            for v in make_family_positives(pos, tv, fam_rng,
                                           n_variants=family_positives):
                extra.append((q, v, 1.0))
        hard = list(hard) + extra
        log(f"  +{len(extra)} family-variant positives "
            f"({len(hard)} hard triples)")

    t0 = time.perf_counter()
    _, params_xe = init_crossencoder(cfg, seed=seed)
    params_xe = warm_start_from_biencoder(params_xe, mtr.params)
    tr = CrossEncoderTrainer(
        cfg, params_xe,
        train_cfg=CrossTrainConfig(learning_rate=lr_ft, seed=seed,
                                   total_steps=len(easy) // batch),
    )
    h1 = train_crossencoder(tr, easy, tok, batch_size=batch, epochs=1,
                            max_len=128, seed=seed, log_every=0)
    tr2 = CrossEncoderTrainer(
        cfg, tr.params,
        train_cfg=CrossTrainConfig(
            learning_rate=lr_ft, seed=seed,
            total_steps=(len(hard) // batch) * epochs_hard),
    )
    h2 = train_crossencoder(tr2, hard, tok, batch_size=batch,
                            epochs=epochs_hard, max_len=128, seed=seed,
                            log_every=0)
    log(f"  ce: easy acc {np.mean([m['acc'] for m in h1[-50:]]):.3f}, "
        f"hard acc {np.mean([m['acc'] for m in h2[-50:]]):.3f} "
        f"({time.perf_counter() - t0:.0f}s)")
    return CrossEncoder(cfg, tr2.params, tok, max_len=128)


def mine_engine_negatives(engine, pairs, *, k_neg=6, seed=0):
    """Top engine retrievals (Hybrid config, batched fused path) for each
    training query, minus its positive — the literal distractor set the
    rerank must demote at serving time."""
    from review_recommender_tpu.ops.fusion import FusionWeights

    w = FusionWeights.make(w_dense=0.55, w_bm25=0.25, w_rerank=0.0,
                           w_prior=0.20, w_best=0.0)
    out = {}
    queries = [q for q, _d in pairs]
    B = 128
    t0 = time.perf_counter()
    for lo in range(0, len(queries), B):
        chunk = queries[lo:lo + B]
        qvecs = engine.query_encoder.encode(chunk)
        rows, _scores = engine.query_fused_batched(
            qvecs, chunk, w, pool=150, k=k_neg + 2)
        rows = np.asarray(rows)
        for i, q in enumerate(chunk):
            pos = pairs[lo + i][1]
            negs = []
            for r in rows[i]:
                t = engine.products.agg_texts[int(r)]
                if t != pos:
                    negs.append(t)
            out[q] = negs[:k_neg]
    log(f"  engine negatives: {len(out)} queries "
        f"({time.perf_counter() - t0:.0f}s)")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--themes", type=int, default=40)
    ap.add_argument("--per-theme", type=int, default=320)
    ap.add_argument("--queries", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variants", default="overlap,trained,trained-eng")
    ap.add_argument("--mlm-steps-big", type=int, default=4000)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.evals.benchmark import (
        run_performance_benchmark,
    )
    from review_recommender_tpu.evals.queries import BENCHMARK_CONFIGS
    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.models.bow import (
        BowProjectionEncoder,
        OverlapCrossScorer,
    )

    t0 = time.perf_counter()
    products, queries = build_corpus(args.themes, args.per_theme,
                                     args.queries, seed=args.seed)
    log(f"corpus: {len(products)} docs, {len(queries)} queries "
        f"({time.perf_counter() - t0:.0f}s)")

    encoder = BowProjectionEncoder(dim=384, seed=7)
    emb = encoder.encode([p["agg_text"] for p in products])
    bundle = build_bundle_from_products(products, emb, doc_terms_cap=128,
                                        pad_multiple=256)
    idf_map = {t: float(bundle.products.idf[i])
               for t, i in bundle.products.vocab.items()}

    def make_engine(cross):
        return SearchEngine(bundle, query_encoder=encoder,
                            cross_encoder=cross, gate_mode="host",
                            dense_pool="exact")

    # shared hybrid baseline (rerank-free) — measured once
    base_engine = make_engine(None)

    def run(engine, methods):
        def search(q, **cfg):
            df, _s, _d = engine.run_search(q, **cfg)
            return df
        cfgs = {m: BENCHMARK_CONFIGS[m] for m in methods}
        return run_performance_benchmark(search, queries,
                                         method_configs=cfgs, warmup=True)

    results = {}
    base = run(base_engine, ["Hybrid"])
    results["Hybrid (baseline)"] = base["Hybrid"]

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    fam = set()
    for q in queries:
        fam.update(q["relevant_skus"])
    train_docs = [p for p in products if p["sku"] not in fam]

    for v in variants:
        log(f"== variant {v}")
        if v == "overlap":
            cross = OverlapCrossScorer(idf=idf_map)
        elif v == "trained":
            cross = train_ce(products, queries, layers=2, mlm_steps=2000,
                             n_pairs=8192, seed=args.seed)
        elif v == "trained-big":
            cross = train_ce(products, queries, layers=4,
                             mlm_steps=args.mlm_steps_big, n_pairs=12288,
                             seed=args.seed)
        elif v == "trained-eng":
            pairs, _tm = mine_training_pairs(train_docs, n_pairs=12288,
                                             seed=args.seed + 101)
            engine_negs = mine_engine_negatives(base_engine, pairs,
                                                seed=args.seed)
            cross = train_ce(products, queries, layers=4,
                             mlm_steps=args.mlm_steps_big, n_pairs=12288,
                             engine_negatives=engine_negs, seed=args.seed)
        elif v == "trained-fam":
            cross = train_ce(products, queries, layers=2, mlm_steps=2000,
                             n_pairs=8192, seed=args.seed,
                             family_positives=2)
        elif v == "trained-fam-big":
            # capacity bump on the winning recipe: deeper trunk, longer
            # MLM, more pairs — does scale widen the fam-positive win?
            cross = train_ce(products, queries, layers=4,
                             mlm_steps=args.mlm_steps_big, n_pairs=12288,
                             seed=args.seed, family_positives=2)
        elif v == "trained-fam-eng":
            pairs, _tm = mine_training_pairs(train_docs, n_pairs=12288,
                                             seed=args.seed + 101)
            engine_negs = mine_engine_negatives(base_engine, pairs,
                                                seed=args.seed)
            cross = train_ce(products, queries, layers=2, mlm_steps=2000,
                             n_pairs=12288, engine_negatives=engine_negs,
                             seed=args.seed, family_positives=2)
        else:
            log(f"unknown variant {v!r}; skipping")
            continue
        r = run(make_engine(cross), ["Hybrid + Rerank"])
        results[f"Hybrid+Rerank [{v}]"] = r["Hybrid + Rerank"]

    hy = results["Hybrid (baseline)"]["aggregate"]
    print(f"\n{'lane':38s}  nDCG@10  MRR@10  R@20")
    for name, r in results.items():
        m = r["aggregate"]
        mark = ""
        if name != "Hybrid (baseline)":
            win = (m["ndcg@10"] > hy["ndcg@10"] and m["mrr"] > hy["mrr"])
            mark = "  <-- WIN" if win else ""
        print(f"{name:38s}  {m['ndcg@10']:.4f}   {m['mrr']:.4f}  "
              f"{m['recall@20']:.4f}{mark}")
    if args.out:
        Path(args.out).write_text(json.dumps(
            {k: v["aggregate"] for k, v in results.items()}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
