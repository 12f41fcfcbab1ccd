"""Unified CLI: ONE engine consumed by search / serve / audit / health /
bench subcommands.

The reference ships a second, divergent engine implementation as its CLI
(/root/reference/app/test.py:228-342 — different pool size, different
weights, no trust multiplier; SURVEY.md §3.2). This build deliberately has a
single engine (engine/search.py) behind every entry point.

  rrt search  --index-dir DIR "query text" [--k 10 ...] [--json-out f.json]
  rrt serve   --index-dir DIR [--host 0.0.0.0 --port 8501]
  rrt audit   --index-dir DIR          (artifact audit; exit code gates deploy)
  rrt health  [--url http://host:port] (liveness probe; exit 0/1)
  rrt bench   --index-dir DIR          (QPS/p50 on the loaded index)
  rrt train   --index-dir DIR --out D  (domain-adapt towers on the reviews)
  rrt eval    --index-dir DIR --queries f.jsonl  (IR metrics, method sweep)
  rrt topics  --index-dir DIR --out D  (cluster reviews -> named topic cards)
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from review_recommender_tpu.config import config


def _load_engine(index_dir: str, gate_mode: Optional[str] = None,
                 with_models: bool = True, with_rerank: bool = False,
                 dense_pool: Optional[str] = None,
                 shards: Optional[int] = None):
    """Build the serving engine: single-chip SearchEngine, or — when
    `shards` (--shards / MESH_SHARDS) is > 1 — the corpus-sharded
    ShardedSearchEngine over a `shards`-device mesh. Both expose the same
    run_search / query_fused_batched_pw surface, so every entry point
    (CLI, HTTP service, micro-batcher) works over either."""
    from review_recommender_tpu.index.io import load_bundle

    bundle = load_bundle(index_dir)
    encoder = None
    cross = None
    if with_models:
        if config.EMB_MODEL_DIR:
            from review_recommender_tpu.models.load import load_biencoder

            encoder = load_biencoder(config.EMB_MODEL_DIR)
        else:
            from review_recommender_tpu.models.encoder import BiEncoder

            # dim-matched random stand-in (set EMB_MODEL_DIR for real weights)
            encoder = BiEncoder.random_for_dim(bundle.products.dim)
    if with_rerank and config.ENABLE_RERANKING:
        if config.RERANK_MODEL_DIR:
            from review_recommender_tpu.models.load import load_crossencoder

            cross = load_crossencoder(config.RERANK_MODEL_DIR)
        else:
            from review_recommender_tpu.models.encoder import CrossEncoder

            cross = CrossEncoder.random_init()
    n_shards = config.MESH_SHARDS if shards is None else int(shards)
    if n_shards > 1:
        import jax

        from review_recommender_tpu.parallel.sharded import ShardedSearchEngine

        avail = len(jax.devices())
        if n_shards > avail:
            print(f"--shards {n_shards} > {avail} available devices; "
                  f"using {avail}", file=sys.stderr)
            n_shards = avail
        return ShardedSearchEngine(
            bundle, n_shards=n_shards, query_encoder=encoder,
            cross_encoder=cross, gate_mode=gate_mode,
            dense_pool=dense_pool,
        )
    from review_recommender_tpu.engine.search import SearchEngine

    return SearchEngine(bundle, query_encoder=encoder, cross_encoder=cross,
                        gate_mode=gate_mode, dense_pool=dense_pool)


def cmd_search(args) -> int:
    engine = _load_engine(args.index_dir, args.gate_mode,
                          with_rerank=args.rerank_k > 0,
                          dense_pool=args.dense_pool)
    t0 = time.perf_counter()
    df, snips, debug = engine.run_search(
        args.query, k=args.k, rerank_k=args.rerank_k,
        w_dense=args.w_dense, w_bm25=args.w_bm25, w_rerank=args.w_rerank,
        w_prior=args.w_prior, w_best=args.w_best, prior_C=args.prior_c,
        use_snips=args.snippets, min_reviews=args.min_reviews,
        gate_penalty=args.gate_penalty,
    )
    took = time.perf_counter() - t0
    for rank, row in enumerate(df.to_dict(orient="records"), 1):
        print(f"{rank:2d}. {row['sku']}  final={row['_final']:.4f} "
              f"dense={row['_dense']:.3f} bm25={row['_bm25']:.3f} "
              f"prior={row['_prior']:.3f} stars={row['avg_stars']:.2f} "
              f"n={int(row['n_reviews'])}")
    print(f"-- {len(df)} results in {took:.3f}s "
          f"(pool={debug['pool']}, bm25_active={debug['bm25_active']})")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps({
            "query": args.query,
            "results": df.to_dict(orient="records"),
            "snippets": snips, "debug": debug, "took_s": took,
        }, indent=2))
    return 0


def cmd_serve(args) -> int:
    from review_recommender_tpu.serve.api import serve

    config.setup_logging()
    engine = _load_engine(args.index_dir, args.gate_mode,
                          with_rerank=args.with_rerank,
                          dense_pool=args.dense_pool, shards=args.shards)
    use_native = args.native or config.SERVE_NATIVE
    if use_native:
        from review_recommender_tpu.native import native_server_available

        if not native_server_available():
            print("native front end unavailable (build with "
                  "`make -C review_recommender_tpu/native`); "
                  "falling back to the stdlib server", flush=True)
            use_native = False
    if use_native:
        import signal
        import threading

        from review_recommender_tpu.serve.native_server import serve_native

        nsrv = serve_native(engine, host=args.host, port=args.port,
                            warmup=True, warmup_async=True)
        print(f"serving on http://{args.host}:{nsrv.port} "
              f"(docs={engine.products.n_docs}, native front end); "
              f"warming up in background", flush=True)
        done = threading.Event()
        signal.signal(signal.SIGINT, lambda *_: done.set())
        signal.signal(signal.SIGTERM, lambda *_: done.set())
        done.wait()
        nsrv.close()
        return 0
    srv = serve(engine, host=args.host, port=args.port, warmup_async=True)
    print(f"serving on http://{args.host}:{args.port} "
          f"(docs={engine.products.n_docs}); warming up in background",
          flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


def cmd_audit(args) -> int:
    from review_recommender_tpu.serve.audit import audit_index_dir

    report = audit_index_dir(args.index_dir)
    print(json.dumps(report, indent=2, default=str))
    return 0 if report["ok"] else 1


def cmd_import(args) -> int:
    """Point a REFERENCE deployment's data dir (local path or fsspec URL,
    e.g. hf://datasets/<org>/<name>) at this engine: discovers the
    reference's standard artifact names (config.py PRODUCT_EMB_FILE etc.,
    mirroring reference config.py:36-39 / app_product_search.py:94-144)
    and converts them into a versioned index bundle."""
    from review_recommender_tpu.config import config as c
    from review_recommender_tpu.data.pipeline import (
        import_reference_artifacts,
    )
    from review_recommender_tpu.index.io import is_remote, join_path

    base = args.data_dir

    def _resolve(name: str, required: bool = False):
        path = join_path(base, name)
        if is_remote(path):
            return path  # existence checked at open time
        if Path(path).exists():
            return path
        if required:
            raise SystemExit(f"missing required artifact: {path}")
        return None

    emb = _resolve(c.PRODUCT_EMB_FILE, required=True)
    meta = _resolve(c.PRODUCT_META_FILE, required=True)
    bm25 = _resolve(c.BM25_FILE)
    reviews = _resolve(c.REVIEWS_EMB_FILE) if not args.no_reviews else None
    bundle = import_reference_artifacts(
        emb, meta, bm25_pkl=bm25, reviews_parquet=reviews,
        out_dir=args.out, doc_terms_cap=args.doc_terms_cap,
    )
    print(json.dumps({
        "out": str(args.out),
        "n_docs": bundle.products.n_docs,
        "has_bm25_tokens": bm25 is not None,
        "n_reviews": (bundle.reviews.n_reviews_total
                      if bundle.reviews is not None else 0),
    }))
    return 0


def cmd_health(args) -> int:
    import urllib.request

    url = args.url.rstrip("/") + "/healthz"
    try:
        with urllib.request.urlopen(url, timeout=args.timeout) as r:
            ok = r.status == 200
    except Exception as e:
        print(f"health check failed: {e}", file=sys.stderr)
        return 1
    print("OK" if ok else "FAIL")
    return 0 if ok else 1


def cmd_bench(args) -> int:
    engine = _load_engine(args.index_dir, gate_mode="device",
                          with_models=False,
                          dense_pool=getattr(args, "dense_pool", None))
    from review_recommender_tpu.ops.fusion import FusionWeights

    dim = engine.products.dim
    rng = np.random.default_rng(0)
    texts = [t for t in engine.products.agg_texts[:64] if t] or ["test query"]
    qvecs = rng.standard_normal((args.n_queries, dim)).astype(np.float32)
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    w = FusionWeights.make()
    engine.query_fused(qvecs[0], texts[0], w, pool=150, k=10)  # compile
    lat = []
    for i in range(args.n_queries):
        t0 = time.perf_counter()
        rows, scores = engine.query_fused(
            qvecs[i], texts[i % len(texts)], w, pool=150, k=10
        )
        np.asarray(rows)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    print(json.dumps({
        "qps": round(1 / lat.mean(), 2),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 3),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 3),
        "n_docs": engine.products.n_docs,
    }))
    return 0


def cmd_train(args) -> int:
    """Domain-adapt the query towers on the index's own review corpus, then
    save serving-loadable native tower dirs (models/load.py native format).

    The loop the reference cannot do (its encoders are frozen HF downloads):
      rrt train --index-dir idx --out towers/
      EMB_MODEL_DIR=towers/biencoder RERANK_MODEL_DIR=towers/crossencoder \
          rrt serve --index-dir idx --with-rerank
    (re-embed the corpus with data/embed_job.py if the bi-encoder changed).

    With EMB_MODEL_DIR set, fine-tunes that checkpoint (HF snapshot or a
    previous native tower); otherwise trains a from-scratch tower sized by
    --hidden/--layers with a hash tokenizer.
    """
    from review_recommender_tpu.index.io import load_bundle
    from review_recommender_tpu.models.bert import (
        BertConfig,
        init_biencoder,
        init_crossencoder,
    )
    from review_recommender_tpu.models.load import save_native_tower
    from review_recommender_tpu.models.tokenizer import HashTokenizer
    from review_recommender_tpu.train import (
        ContrastiveTrainer,
        CrossEncoderTrainer,
        CrossTrainConfig,
        TrainConfig,
        mine_pairs,
        mine_triples,
        train_biencoder,
        train_crossencoder,
    )
    config.setup_logging()
    bundle = load_bundle(args.index_dir)
    if bundle.reviews is None:
        print("train: the index bundle has no review texts to mine pairs "
              "from (rebuild with reviews)", file=sys.stderr)
        return 1
    rev = bundle.reviews
    prod = bundle.products
    valid = np.asarray(rev.rev_valid, bool)
    seg = np.asarray(rev.rev_product, np.int64)
    review_texts = [t for t, v in zip(rev.rev_texts, valid) if v]
    review_skus = [prod.skus[int(s)] for s, v in zip(seg, valid) if v]
    pairs = mine_pairs(review_texts, review_skus, prod.skus, prod.agg_texts,
                       max_pairs_per_product=args.pairs_per_product,
                       seed=args.seed)
    if not pairs:
        print("train: no minable (query, positive) pairs", file=sys.stderr)
        return 1
    print(f"mined {len(pairs)} (query, positive) pairs from "
          f"{len(review_texts)} reviews", file=sys.stderr)

    out = Path(args.out)
    mlm_trunk = None
    if args.mlm_steps > 0:
        # MLM-pretrain a trunk on the corpus documents first — measured to
        # be the difference between a from-scratch cross-encoder that
        # learns and one that never leaves the label base rate
        # (train/mlm.py module docstring)
        from review_recommender_tpu.train import (
            MLMTrainConfig,
            MLMTrainer,
            init_mlm,
            pretrain_mlm,
        )

        heads = max(1, args.hidden // args.head_dim)
        cfg_mlm = BertConfig(
            vocab_size=args.vocab_size, hidden_size=args.hidden,
            num_layers=args.layers, num_heads=heads,
            intermediate_size=2 * args.hidden, max_position=2 * args.max_len,
        )
        _, mlm_params = init_mlm(cfg_mlm, seed=args.seed)
        mtr = MLMTrainer(cfg_mlm, mlm_params,
                         train_cfg=MLMTrainConfig(learning_rate=args.lr,
                                                  seed=args.seed,
                                                  total_steps=args.mlm_steps))
        ckpt_mlm = out / "mlm_trunk.msgpack"
        if args.resume and ckpt_mlm.exists():
            mtr.restore(ckpt_mlm)
            print(f"mlm: resumed from {ckpt_mlm} at step {mtr.step}",
                  file=sys.stderr)
        mhist = pretrain_mlm(mtr, prod.agg_texts,
                             HashTokenizer(vocab_size=args.vocab_size),
                             batch_size=args.batch_size,
                             steps=args.mlm_steps, max_len=args.max_len,
                             seed=args.seed,
                             checkpoint_path=str(ckpt_mlm),
                             checkpoint_every=args.checkpoint_every)
        if mhist:
            print(f"mlm pretrain: {len(mhist)} steps (at {mtr.step}/"
                  f"{args.mlm_steps}), masked acc "
                  f"{np.mean([m['masked_acc'] for m in mhist[-100:]]):.3f}",
                  file=sys.stderr)
        mlm_trunk = mtr.params

    tc = TrainConfig(learning_rate=args.lr, seed=args.seed)
    if config.EMB_MODEL_DIR:
        from review_recommender_tpu.models.load import load_biencoder

        tower = load_biencoder(config.EMB_MODEL_DIR)
        cfg_bi, params_bi, tok = tower.cfg, tower.params, tower.tokenizer
    else:
        heads = max(1, args.hidden // args.head_dim)
        cfg_bi = BertConfig(
            vocab_size=args.vocab_size, hidden_size=args.hidden,
            num_layers=args.layers, num_heads=heads,
            intermediate_size=2 * args.hidden, max_position=args.max_len,
        )
        _, params_bi = init_biencoder(cfg_bi, seed=args.seed)
        tok = HashTokenizer(vocab_size=args.vocab_size)
        if mlm_trunk is not None:
            from review_recommender_tpu.train.cross_encoder import (
                warm_start_from_biencoder,
            )

            params_bi = warm_start_from_biencoder(params_bi, mlm_trunk)
    trainer = ContrastiveTrainer(cfg_bi, params_bi, train_cfg=tc)
    ckpt_bi = out / "biencoder.ckpt"
    if args.resume and ckpt_bi.exists():
        trainer.restore(ckpt_bi)
        print(f"bi-encoder: resumed from {ckpt_bi} at step {trainer.step}",
              file=sys.stderr)
    hist = train_biencoder(trainer, pairs, tok, batch_size=args.batch_size,
                           epochs=args.epochs, max_len=args.max_len,
                           seed=args.seed, checkpoint_path=str(ckpt_bi),
                           checkpoint_every=args.checkpoint_every)
    if hist:
        print(f"bi-encoder: {len(hist)} steps, final loss "
              f"{hist[-1]['loss']:.4f} in-batch acc "
              f"{hist[-1]['in_batch_acc']:.3f}", file=sys.stderr)
    save_native_tower(out / "biencoder", "biencoder", cfg_bi,
                      trainer.params, tok)

    if args.cross:
        triples = mine_triples(pairs, prod.agg_texts,
                               n_negatives=args.negatives,
                               seed=args.seed + 1)
        if config.RERANK_MODEL_DIR:
            from review_recommender_tpu.models.load import load_crossencoder

            xt = load_crossencoder(config.RERANK_MODEL_DIR)
            cfg_xe, params_xe, tok_xe = xt.cfg, xt.params, xt.tokenizer
        elif mlm_trunk is not None:
            # same trunk dims as the MLM model so the pretrained encoder
            # grafts in (the recipe that actually works — train/mlm.py).
            # The tokenizer MUST be the hash tokenizer the trunk was
            # pretrained with — `tok` may be a loaded tower's wordpiece
            # vocab when EMB_MODEL_DIR is set, which would feed the trunk
            # ids from a different id space.
            from review_recommender_tpu.train.cross_encoder import (
                warm_start_from_biencoder,
            )

            cfg_xe = BertConfig(
                vocab_size=args.vocab_size, hidden_size=args.hidden,
                num_layers=args.layers,
                num_heads=max(1, args.hidden // args.head_dim),
                intermediate_size=2 * args.hidden,
                max_position=2 * args.max_len,
            )
            _, params_xe = init_crossencoder(cfg_xe, seed=args.seed)
            params_xe = warm_start_from_biencoder(params_xe, mlm_trunk)
            tok_xe = HashTokenizer(vocab_size=args.vocab_size)
        else:
            cfg_xe = BertConfig(
                vocab_size=args.vocab_size,
                hidden_size=max(64, args.hidden // 2),
                num_layers=args.layers,
                num_heads=max(1, max(64, args.hidden // 2)
                                  // args.head_dim),
                intermediate_size=args.hidden,
                max_position=2 * args.max_len,
            )
            _, params_xe = init_crossencoder(cfg_xe, seed=args.seed)
            tok_xe = tok
        xtr = CrossEncoderTrainer(
            cfg_xe, params_xe,
            train_cfg=CrossTrainConfig(learning_rate=args.lr, seed=args.seed),
        )
        ckpt_xe = out / "crossencoder.ckpt"
        if args.resume and ckpt_xe.exists():
            xtr.restore(ckpt_xe)
            print(f"cross-encoder: resumed from {ckpt_xe} at step "
                  f"{xtr.step}", file=sys.stderr)
        xhist = train_crossencoder(xtr, triples, tok_xe,
                                   batch_size=args.batch_size,
                                   epochs=args.epochs,
                                   max_len=2 * args.max_len, seed=args.seed,
                                   checkpoint_path=str(ckpt_xe),
                                   checkpoint_every=args.checkpoint_every)
        if xhist:
            print(f"cross-encoder: {len(xhist)} steps, final loss "
                  f"{xhist[-1]['loss']:.4f} acc {xhist[-1]['acc']:.3f}",
                  file=sys.stderr)
        save_native_tower(out / "crossencoder", "crossencoder", cfg_xe,
                          xtr.params, tok_xe)

    print(json.dumps({
        "pairs": len(pairs),
        "biencoder": str(out / "biencoder"),
        "crossencoder": str(out / "crossencoder") if args.cross else None,
        "serve_env": {
            "EMB_MODEL_DIR": str(out / "biencoder"),
            **({"RERANK_MODEL_DIR": str(out / "crossencoder")}
               if args.cross else {}),
        },
    }))
    return 0


def cmd_topics(args) -> int:
    """The archived topic pipeline as ONE production command: cluster the
    index's review embeddings (TPU spherical k-means, or HDBSCAN-semantics
    density clustering with --cluster density — topics/density.py),
    TF-IDF-name the clusters (or a real LLM backend with --llm
    ollama|openai[:url] — topics/llm_clients.py), compute aspect impact
    metrics, and generate resume-safe topic cards — the reference ran
    these as five separate scripts over DuckDB
    (/root/reference/nlp/_archive/05_clustering.py, 06_name_topics.py,
    06_cluster_topics_ollama.py, 07_aspect_metrics.py,
    08_generate_topic_cards_qwen3bq4.py). `--bench` runs the throughput
    estimator instead of writing cards (the archive's standalone
    LLM-throughput tool, nlp/_archive/test.py:15-35): times a topic sample
    per knob config and projects the full-run ETA.
    """
    from review_recommender_tpu.index.io import load_bundle
    from review_recommender_tpu.topics.cards import (
        benchmark_generator,
        generate_topic_cards,
        pick_quotes,
    )
    from review_recommender_tpu.topics.cluster import spherical_kmeans
    from review_recommender_tpu.topics.naming import (
        aspect_metrics,
        map_label_to_aspect,
        name_topics,
        tfidf_topic_terms,
    )

    bundle = load_bundle(args.index_dir)
    if bundle.reviews is None:
        print("topics: index has no review embeddings "
              "(build with reviews + review_embeddings)", file=sys.stderr)
        return 1
    rev = bundle.reviews
    # valid marks the first n_reviews_total rows; texts/stars are the
    # unpadded host metadata aligned with those rows (index/build.py)
    m = int(rev.n_reviews_total)
    emb = np.asarray(rev.rev_emb, np.float32)[:m]
    texts = list(rev.rev_texts)[:m]
    stars = np.asarray(rev.rev_stars, np.float32)[:m]
    if len(texts) == 0:
        print("topics: no valid reviews in index", file=sys.stderr)
        return 1

    if getattr(args, "cluster", "kmeans") == "density":
        # HDBSCAN-semantics lane (topics/density.py): data-derived cluster
        # count, noise label -1 (dropped from the rollup), min-cluster-size
        # dissolution. Centers = normalized cluster means, so quote picking
        # works identically to the k-means lane.
        from review_recommender_tpu.topics.density import density_cluster

        topic_ids, dinfo = density_cluster(
            emb, min_samples=args.min_samples,
            min_cluster_size=args.min_cluster_size,
            n_shards=getattr(args, "shards", None))
        k = int(dinfo["n_clusters"])
        print(f"density: {k} clusters, {dinfo['noise']} noise reviews "
              f"(eps={dinfo['eps']:.4f})", file=sys.stderr)
        if k == 0:
            print("topics: density clustering found no clusters "
                  "(corpus too sparse for min_cluster_size="
                  f"{args.min_cluster_size})", file=sys.stderr)
            return 1
        centers = np.zeros((k, emb.shape[1]), np.float32)
        for tid in range(k):
            c = emb[topic_ids == tid].mean(axis=0)
            centers[tid] = c / max(float(np.linalg.norm(c)), 1e-12)
        # noise reviews (-1) leave the pipeline here — naming, metrics and
        # cards all operate on clustered reviews only (the reference writes
        # label -1 to parquet and every downstream 06/07 script drops it)
        clustered = topic_ids >= 0
        emb = emb[clustered]
        stars = stars[clustered]
        texts = [texts[i] for i in np.flatnonzero(clustered)]
        topic_ids = topic_ids[clustered]
    else:
        k = min(int(args.k), len(texts))
        topic_ids, centers = spherical_kmeans(emb, k=k, iters=args.iters,
                                              seed=args.seed)

    terms = tfidf_topic_terms(texts, topic_ids)
    labels = name_topics(terms)

    # per-topic rollup; tiny clusters are dropped like the reference's
    # MIN_REVIEWS_PER_TOPIC filter (nlp/_archive/test.py:30)
    topics = []
    for tid in sorted(labels):
        mask = topic_ids == tid
        n = int(mask.sum())
        if n < args.min_reviews:
            continue
        t_texts = [texts[i] for i in np.flatnonzero(mask)]
        topics.append({
            "topic_id": int(tid),
            "label": labels[tid],
            "aspect": map_label_to_aspect(labels[tid]),
            "n_reviews": n,
            "quotes": pick_quotes(t_texts, emb[mask], centers[tid],
                                  n_quotes=args.n_quotes),
        })

    # optional LLM naming pass over the rolled-up topics (the reference's
    # archived 06_* scripts; adapters in topics/llm_clients.py). TF-IDF
    # labels above stay as the no-LLM default AND the fallback.
    llm_aspects = None
    if getattr(args, "llm", None):
        from review_recommender_tpu.topics.llm_clients import (
            OllamaClient,
            from_spec,
            label_topics,
        )

        client = from_spec(args.llm, model=args.llm_model)
        if isinstance(client, OllamaClient):
            if not client.ping():
                print(f"topics: can't reach Ollama at {client.host} "
                      "(start it with 'ollama serve')", file=sys.stderr)
                return 1
            client.ensure_model()
        cache = args.llm_cache or str(
            Path(args.out) / "_llm_topic_cache.json")
        Path(cache).parent.mkdir(parents=True, exist_ok=True)
        metas = label_topics(
            client, {t["topic_id"]: t["quotes"] for t in topics},
            cache_path=cache)
        llm_aspects = {}
        for t in topics:
            meta = metas.get(t["topic_id"])
            if not meta:
                continue
            t["label"] = meta["topic_label"]
            t["aspect"] = meta["aspect"].lower()
            t["rationale"] = meta.get("rationale", "")
            llm_aspects[t["topic_id"]] = t["aspect"]
        labels = {**labels, **{t["topic_id"]: t["label"] for t in topics}}
        # one vocabulary per run: topics WITHOUT an LLM answer (dropped by
        # --min-reviews, empty meta) would otherwise flow through the
        # rule-based mapping and mix its vocabulary ("price"/"other") with
        # the LLM taxonomy ("pricing"/"misc") inside one aspect_metrics.json
        rule_to_llm = {"price": "pricing", "shipping": "shipping",
                       "quality": "quality", "usability": "usability"}
        for tid, label in labels.items():
            if tid not in llm_aspects:
                llm_aspects[tid] = rule_to_llm.get(
                    map_label_to_aspect(label), "misc")

    metrics = aspect_metrics(topic_ids, stars, labels, aspects=llm_aspects)

    if args.bench:
        report = benchmark_generator(
            topics,
            configs={
                "default": {},
                "fast": {"n_quotes": 1, "max_chars": 120},
            },
            n_topics=args.sample_bench,
            total_topics=len(topics),
        )
        print(json.dumps({"n_topics": len(topics), "configs": report},
                         indent=2))
        return 0

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    df = generate_topic_cards(
        topics, out / "topic_cards.jsonl",
        parquet_out=out / "topic_cards.parquet",
    )
    (out / "aspect_metrics.json").write_text(json.dumps(metrics, indent=2))
    try:
        import pandas as pd

        pd.DataFrame([{k2: t[k2] for k2 in
                       ("topic_id", "label", "aspect", "n_reviews")}
                      for t in topics]).to_parquet(out / "topics.parquet",
                                                   index=False)
    except Exception:  # parquet backend missing: JSONL already on disk
        pass
    print(f"{len(df)} topic cards -> {out}/topic_cards.jsonl "
          f"(+parquet, aspects in aspect_metrics.json)")
    for row in metrics[:5]:
        print(f"  aspect={row['aspect']:<12} n={row['n_reviews']:<6} "
              f"avg_stars={row['avg_stars']} lost={row['lost_rating']}")
    return 0


def cmd_eval(args) -> int:
    """IR-metric evaluation of a live index against judged queries — the
    reference's evals/run_benchmark.py flow as a production command.

    Queries file: JSONL, one {"query": str, "relevant_skus": [str, ...]}
    per line (the /eval HTTP endpoint's schema). Runs the four reference
    method configs (or --method) through run_search and prints the
    markdown table; --out also writes benchmark_results.json + CSV.
    """
    from review_recommender_tpu.evals.benchmark import (
        format_results_table,
        measure_rpc_floor,
        run_performance_benchmark,
        save_benchmark_results,
    )

    queries = []
    with open(args.queries, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            queries.append({"id": row.get("id", f"q{len(queries)}"),
                            "query": row["query"],
                            "relevant_skus": row["relevant_skus"]})
    if not queries:
        print("eval: no queries in file", file=sys.stderr)
        return 1

    engine = _load_engine(args.index_dir, args.gate_mode, with_rerank=True,
                          dense_pool=args.dense_pool)

    method_configs = None
    if args.method:
        from review_recommender_tpu.evals.queries import BENCHMARK_CONFIGS

        if args.method not in BENCHMARK_CONFIGS:
            print(f"eval: unknown method {args.method!r} "
                  f"(have: {sorted(BENCHMARK_CONFIGS)})", file=sys.stderr)
            return 1
        method_configs = {args.method: BENCHMARK_CONFIGS[args.method]}

    def search(q, **cfg):
        df, _s, _d = engine.run_search(q, **cfg)
        return df

    results = run_performance_benchmark(search, queries,
                                        method_configs=method_configs,
                                        warmup=not args.no_warmup,
                                        rpc_floor_ms=measure_rpc_floor())
    print(format_results_table(results))
    if args.out:
        save_benchmark_results(results, args.out)
        print(f"wrote {args.out}/benchmark_results.json", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="rrt", description="TPU review-recommender framework CLI"
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = config
    s = sub.add_parser("search", help="run one query")
    s.add_argument("query")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--k", type=int, default=c.DEFAULT_K)
    s.add_argument("--rerank-k", type=int, default=0)
    s.add_argument("--w-dense", type=float, default=c.DEFAULT_W_DENSE)
    s.add_argument("--w-bm25", type=float, default=c.DEFAULT_W_BM25)
    s.add_argument("--w-rerank", type=float, default=c.DEFAULT_W_RERANK)
    s.add_argument("--w-prior", type=float, default=c.DEFAULT_W_PRIOR)
    s.add_argument("--w-best", type=float, default=c.DEFAULT_W_BEST)
    s.add_argument("--prior-c", type=float, default=c.DEFAULT_PRIOR_C)
    s.add_argument("--min-reviews", type=int, default=c.DEFAULT_MIN_REVIEWS)
    s.add_argument("--gate-penalty", type=float, default=c.DEFAULT_GATE_PENALTY)
    s.add_argument("--gate-mode", default=None, choices=[None, "host", "device"])
    s.add_argument("--dense-pool", default=None, choices=[None, "auto", "exact", "striped", "ivf"],
                   help="striped: 2-stage stripe-max stage-A pool — ~1.5-1.8x "
                        "faster, ~0.99 pool recall, measured quality parity "
                        "(evals_out/striped). Default: DENSE_POOL_MODE env "
                        "(auto — striped from DENSE_POOL_AUTO_MIN padded "
                        "rows up, exact below). ivf: sub-linear clustered "
                        "pool (opt-in; IVF_NPROBE/IVF_BLOCK_ROWS env knobs)")
    s.add_argument("--snippets", action="store_true")
    s.add_argument("--json-out")
    s.set_defaults(fn=cmd_search)

    v = sub.add_parser("serve", help="start the HTTP API")
    v.add_argument("--index-dir", required=True)
    v.add_argument("--host", default=c.APP_HOST)
    v.add_argument("--port", type=int, default=c.APP_PORT)
    v.add_argument("--gate-mode", default=None)
    v.add_argument("--dense-pool", default=None,
                   choices=[None, "auto", "exact", "striped", "ivf"])
    v.add_argument("--with-rerank", action="store_true",
                   help="load the cross-encoder for rerank_k>0 requests")
    v.add_argument("--shards", type=int, default=None,
                   help="serve over an N-device corpus-sharded mesh "
                        "(default: MESH_SHARDS env, 1 = single chip)")
    v.add_argument("--native", action="store_true",
                   help="use the C++ epoll front end (native/server.cc): "
                        "HTTP parse + micro-batch windowing in C++, one "
                        "Python entry per window (also: SERVE_NATIVE env)")
    v.set_defaults(fn=cmd_serve)

    a = sub.add_parser("audit", help="validate index artifacts")
    a.add_argument("--index-dir", required=True)
    a.set_defaults(fn=cmd_audit)

    imp = sub.add_parser(
        "import",
        help="convert a reference deployment's data dir into an index "
             "bundle (product_emb.npy + product_emb_meta.parquet "
             "[+ product_bm25.pkl + reviews_with_embeddings.parquet])",
    )
    imp.add_argument("--data-dir", required=True,
                     help="local dir or fsspec URL (hf://datasets/...)")
    imp.add_argument("--out", required=True, help="bundle output dir")
    imp.add_argument("--doc-terms-cap", type=int, default=None)
    imp.add_argument("--no-reviews", action="store_true",
                     help="skip reviews_with_embeddings.parquet")
    imp.set_defaults(fn=cmd_import)

    h = sub.add_parser("health", help="probe a running server")
    h.add_argument("--url", default=f"http://localhost:{c.APP_PORT}")
    h.add_argument("--timeout", type=float, default=5.0)
    h.set_defaults(fn=cmd_health)

    b = sub.add_parser("bench", help="QPS/p50 on the loaded index")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--n-queries", type=int, default=64)
    b.add_argument("--dense-pool", default=None,
                   choices=[None, "auto", "exact", "striped", "ivf"])
    b.set_defaults(fn=cmd_bench)

    t = sub.add_parser(
        "train", help="domain-adapt query towers on the index's reviews"
    )
    t.add_argument("--index-dir", required=True)
    t.add_argument("--out", required=True,
                   help="output dir; writes biencoder/ (+ crossencoder/)")
    t.add_argument("--cross", action="store_true",
                   help="also train the rerank cross-encoder")
    t.add_argument("--epochs", type=int, default=2)
    t.add_argument("--batch-size", type=int, default=64)
    t.add_argument("--max-len", type=int, default=96)
    t.add_argument("--lr", type=float, default=3e-4)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--pairs-per-product", type=int, default=4)
    t.add_argument("--negatives", type=int, default=3)
    t.add_argument("--vocab-size", type=int, default=8192,
                   help="hash-tokenizer id space (from-scratch towers)")
    t.add_argument("--hidden", type=int, default=256)
    t.add_argument("--head-dim", type=int, default=64,
                   help="attention head dim for from-scratch towers. "
                        "Wider heads tile the 128-wide MXU better: the "
                        "6L/384H forward at B=64 S=512 measures 17.5 / "
                        "10.5 / 7.4 ms at head dim 32/64/128 "
                        "(evals_out/head_geometry.json) — 64 balances "
                        "speed vs head diversity; 128 is the "
                        "serving-speed-optimal choice")
    t.add_argument("--layers", type=int, default=2)
    t.add_argument("--mlm-steps", type=int, default=0,
                   help="MLM-pretrain the trunk on the corpus docs for N "
                        "steps before fine-tuning (from-scratch towers; "
                        "required for a from-scratch cross-encoder to "
                        "learn at all — see train/mlm.py)")
    t.add_argument("--resume", action="store_true",
                   help="restore stage checkpoints from --out and continue "
                        "(a killed run picks up the exact batch stream)")
    t.add_argument("--checkpoint-every", type=int, default=200,
                   help="save each stage's checkpoint every N steps "
                        "(0 = only at stage end)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser(
        "eval", help="IR metrics over judged queries (JSONL) on an index"
    )
    e.add_argument("--index-dir", required=True)
    e.add_argument("--queries", required=True,
                   help='JSONL: {"query", "relevant_skus"} per line')
    e.add_argument("--method", default=None,
                   help="run one BENCHMARK_CONFIGS method instead of all 4")
    e.add_argument("--out", default=None,
                   help="also write benchmark_results.json/CSV here")
    e.add_argument("--gate-mode", default=None)
    e.add_argument("--dense-pool", default=None,
                   choices=[None, "auto", "exact", "striped", "ivf"])
    e.add_argument("--no-warmup", action="store_true")
    e.set_defaults(fn=cmd_eval)

    tp = sub.add_parser(
        "topics", help="cluster reviews into named topics + cards"
    )
    tp.add_argument("--index-dir", required=True)
    tp.add_argument("--out", default="topics_out",
                    help="output dir (cards JSONL/parquet, aspect metrics)")
    tp.add_argument("--k", type=int, default=24, help="number of clusters")
    tp.add_argument("--iters", type=int, default=25)
    tp.add_argument("--seed", type=int, default=0)
    tp.add_argument("--cluster", choices=("kmeans", "density"),
                    default="kmeans",
                    help="kmeans: fixed-K spherical k-means on MXU; "
                         "density: HDBSCAN-semantics kNN-graph clustering "
                         "(data-derived count, noise=-1; topics/density.py)")
    tp.add_argument("--min-samples", type=int, default=10,
                    help="density: core-point neighbor count "
                         "(05_clustering.py MIN_SAMPLES)")
    tp.add_argument("--min-cluster-size", type=int, default=40,
                    help="density: dissolve smaller clusters into noise "
                         "(05_clustering.py MIN_CLUSTER_SIZE)")
    tp.add_argument("--shards", type=int, default=None,
                    help="density: shard the kNN graph's corpus across N "
                         "mesh devices (knn_graph_sharded)")
    tp.add_argument("--min-reviews", type=int, default=5,
                    help="drop topics smaller than this")
    tp.add_argument("--n-quotes", type=int, default=3)
    tp.add_argument("--bench", action="store_true",
                    help="time card generation + project full-run ETA "
                         "instead of writing cards")
    tp.add_argument("--sample-bench", type=int, default=8,
                    help="topics to time with --bench")
    tp.add_argument("--llm", default=None,
                    help="LLM naming backend: dry | ollama[:url] | "
                         "openai[:url] (topics/llm_clients.py; TF-IDF "
                         "naming when omitted)")
    tp.add_argument("--llm-model", default=None,
                    help="model name for --llm (default: OLLAMA_MODEL / "
                         "LLM_MODEL env)")
    tp.add_argument("--llm-cache", default=None,
                    help="resume cache path (default: OUT/"
                         "_llm_topic_cache.json)")
    tp.set_defaults(fn=cmd_topics)
    return ap


def main(argv: Optional[Sequence[str]] = None) -> int:
    from review_recommender_tpu.utils.compile_cache import enable_compile_cache

    args = build_parser().parse_args(argv)
    # every subcommand that touches the engine compiles jitted programs;
    # the persistent cache makes repeat cold starts pay seconds, not minutes
    enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
