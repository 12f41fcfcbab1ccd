"""Dense-tower experiments: beat (or bury) the BoW lexical prior
(VERDICT r3 item 4).

Round 2 recorded that from-scratch dense towers lose to the BoW random-
projection encoder (0.08-0.13 vs 0.46 direct nDCG) — but those experiments
predate the MLM-warm-start recipe that rescued the cross-encoder. This
harness re-runs the trained-dense lane properly and adds the corpus that
decides the question:

  lexical corpus     relevance = shared tokens. The hypothesis to test:
                     no learned 384-d tower at 10k-pair scale beats a
                     lexical prior at its own game.
  paraphrase corpus  family variants are synonym-REWRITTEN (quality_table.
                     build_corpus(paraphrase=True)): lexical signals cannot
                     see the relevance relation at all; a trained tower
                     that learns the synonym structure can.

Lanes (Dense Only config, direct dense retrieval quality):
  bow        BowProjectionEncoder (the round-2 standing dense signal)
  trained    MLM-pretrained trunk -> contrastive bi-encoder, with
             synonym-augmented positives on the paraphrase corpus

Usage: python examples/dense_experiments.py [--corpus lexical|paraphrase|both]
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


def train_biencoder_tower(products, queries, syn, *, seed=0, hidden=256,
                          layers=2, mlm_steps=2000, n_pairs=10240,
                          epochs=2, augment_synonyms=False,
                          augment_mlm=False, flip_queries=False):
    """MLM-pretrain -> warm-start -> contrastive bi-encoder on the corpus
    (eval families held out). augment_synonyms adds a synonym-flipped copy
    of each positive doc, teaching the tower that syn(w) ≈ w — the
    augmentation a production system would derive from its query logs or
    a thesaurus; eval documents stay unseen.

    v2 additions (the paraphrase-lane fix): v1's failure mode is that MLM
    pretraining never sees flipped text — synonym partners only occur in
    the held-out eval variants, so the trunk has no distributional basis
    for syn(w) ≈ w and the contrastive stage must learn ~1.5k pairings
    from ~640 steps alone. augment_mlm adds a fully-flipped copy of every
    training document to the MLM corpus, making each synonym pair share
    contexts (the distributional hypothesis does the tying); flip_queries
    adds the symmetric (flip(q), doc) positives so query-side words also
    bind to their partners.

    Measured (evals_out/dense_experiments.json, paraphrase corpus, seed 0):
    v2 lifts contrastive in-batch acc 0.64 -> 0.83 and Dense-Only R@20
    0.173 -> 0.233 — the ONLY lane above the lexical ceiling (best lexical
    method: 0.227; lexical retrieval can only ever find the anchor doc,
    R@20 cap ≈ 1/n_variants). Top-rank metrics stay below BoW (nDCG@10
    0.419 vs 0.930) because eval queries are verbatim anchor tokens, so
    exact lexical match keeps a structural advantage at rank 1; the tower's
    gain is precisely on the synonym-rewritten variants no lexical method
    can see. Conclusion stands: at 10k-pair scale the trained tower buys
    recall beyond the lexical ceiling, not top-rank wins."""
    from review_recommender_tpu.models.bert import BertConfig, init_biencoder
    from review_recommender_tpu.models.encoder import BiEncoder
    from review_recommender_tpu.models.tokenizer import HashTokenizer
    from review_recommender_tpu.train import (
        ContrastiveTrainer,
        MLMTrainConfig,
        MLMTrainer,
        TrainConfig,
        init_mlm,
        pretrain_mlm,
        train_biencoder,
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

    mlm_texts = texts
    if augment_mlm and syn:
        mlm_texts = texts + [
            " ".join(syn.get(t, t) for t in d.split()) for d in texts
        ]
    t0 = time.perf_counter()
    _, mlm_params = init_mlm(cfg, seed=seed)
    mtr = MLMTrainer(cfg, mlm_params,
                     train_cfg=MLMTrainConfig(learning_rate=5e-4, seed=seed,
                                              total_steps=mlm_steps))
    hist = pretrain_mlm(mtr, mlm_texts, tok, batch_size=64, steps=mlm_steps,
                        max_len=96, seed=seed, log_every=0)
    log(f"  mlm {mlm_steps} steps: masked acc "
        f"{np.mean([m['masked_acc'] for m in hist[-100:]]):.3f} "
        f"({time.perf_counter() - t0:.0f}s)")

    rng = np.random.default_rng(seed + 11)
    sample = rng.choice(len(train_docs), size=min(n_pairs, len(train_docs)),
                        replace=False)
    pairs = []
    for i in sample:
        p = train_docs[int(i)]
        q = keyword_query(rng, p["agg_text"])
        if q is None:
            continue
        pairs.append((q, p["agg_text"]))
        if augment_synonyms and syn:
            # same query, positive rewritten in "other words" — the exact
            # transformation the paraphrase families apply
            doc_toks = p["agg_text"].split()
            keep = rng.random(len(doc_toks)) < 0.6
            flipped = [syn.get(t, t) if k else t
                       for t, k in zip(doc_toks, keep)]
            pairs.append((q, " ".join(flipped)))
            if flip_queries:
                # symmetric: flipped query against the ORIGINAL doc, so
                # query-side words bind to their partners too
                fq = " ".join(syn.get(t, t) for t in q.split())
                pairs.append((fq, p["agg_text"]))
    log(f"  {len(pairs)} pairs (augment_synonyms={augment_synonyms})")

    t0 = time.perf_counter()
    _, params_bi = init_biencoder(cfg, seed=seed)
    params_bi = warm_start_from_biencoder(params_bi, mtr.params)
    tr = ContrastiveTrainer(cfg, params_bi,
                            train_cfg=TrainConfig(learning_rate=1e-4,
                                                  seed=seed))
    h = train_biencoder(tr, pairs, tok, batch_size=64, epochs=epochs,
                        max_len=96, seed=seed, log_every=0)
    log(f"  contrastive: {len(h)} steps, in-batch acc "
        f"{np.mean([m['in_batch_acc'] for m in h[-50:]]):.3f} "
        f"({time.perf_counter() - t0:.0f}s)")
    return BiEncoder(cfg, tr.params, tok, max_len=96)


def eval_dense(products, queries, encoder, *, label, out):
    """Dense Only + Hybrid through the real engine with this encoder."""
    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.evals.benchmark import (
        run_performance_benchmark,
    )
    from review_recommender_tpu.evals.queries import BENCHMARK_CONFIGS
    from review_recommender_tpu.index.build import build_bundle_from_products

    t0 = time.perf_counter()
    emb = encoder.encode([p["agg_text"] for p in products])
    log(f"  encode: {time.perf_counter() - t0:.0f}s")
    bundle = build_bundle_from_products(products, emb, doc_terms_cap=128,
                                        pad_multiple=256)
    engine = SearchEngine(bundle, query_encoder=encoder, gate_mode="host",
                          dense_pool="exact")

    def search(q, **cfg):
        df, _s, _d = engine.run_search(q, **cfg)
        return df

    cfgs = {m: BENCHMARK_CONFIGS[m] for m in ("Dense Only", "Hybrid")}
    res = run_performance_benchmark(search, queries, method_configs=cfgs,
                                    warmup=True)
    for m, r in res.items():
        a = r["aggregate"]
        out[f"{label} / {m}"] = a
        log(f"  {label} / {m}: nDCG@10 {a['ndcg@10']:.4f} "
            f"MRR {a['mrr']:.4f} R@20 {a['recall@20']:.4f}")
    return res


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--themes", type=int, default=40)
    ap.add_argument("--per-theme", type=int, default=320)
    ap.add_argument("--queries", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--corpus", default="both",
                    choices=["lexical", "paraphrase", "both"])
    ap.add_argument("--mlm-steps", type=int, default=2000)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    from review_recommender_tpu.models.bow import BowProjectionEncoder

    out = {}
    corpora = (["lexical", "paraphrase"] if args.corpus == "both"
               else [args.corpus])
    for kind in corpora:
        t0 = time.perf_counter()
        products, queries, meta = build_corpus(
            args.themes, args.per_theme, args.queries, seed=args.seed,
            paraphrase=(kind == "paraphrase"), return_meta=True,
        )
        log(f"== {kind} corpus: {len(products)} docs, {len(queries)} "
            f"queries ({time.perf_counter() - t0:.0f}s)")

        log("-- lane: bow")
        eval_dense(products, queries, BowProjectionEncoder(dim=384, seed=7),
                   label=f"{kind}/bow", out=out)

        log("-- lane: trained")
        tower = train_biencoder_tower(
            products, queries, meta["syn"], seed=args.seed,
            mlm_steps=args.mlm_steps,
            augment_synonyms=(kind == "paraphrase"),
        )
        eval_dense(products, queries, tower, label=f"{kind}/trained",
                   out=out)

        if kind == "paraphrase":
            # v2 recipe: synonym-augmented MLM corpus + symmetric query
            # flips + a longer contrastive stage (see the docstring)
            log("-- lane: trained-v2")
            tower2 = train_biencoder_tower(
                products, queries, meta["syn"], seed=args.seed,
                mlm_steps=args.mlm_steps, augment_synonyms=True,
                augment_mlm=True, flip_queries=True, epochs=4,
            )
            eval_dense(products, queries, tower2,
                       label=f"{kind}/trained-v2", out=out)

    print(f"\n{'lane':34s}  nDCG@10  MRR@10  R@20")
    for name, a in out.items():
        print(f"{name:34s}  {a['ndcg@10']:.4f}   {a['mrr']:.4f}  "
              f"{a['recall@20']:.4f}")
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
