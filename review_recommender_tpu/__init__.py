"""review_recommender_tpu — a TPU-native hybrid product-search / review-recommendation engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
Ntropy86/review-recommender reference (see /root/repo/SURVEY.md):

- offline index build (ETL -> product aggregation -> embeddings -> BM25 postings)
  emitting a versioned, device-ready index bundle instead of .npy/.pkl pickles
- an online hybrid query engine (dense cosine top-k, BM25 Okapi, Bayesian rating
  priors, trust scores, attribute gates, cross-encoder rerank, best-review
  snippets) running as fused jitted TPU programs
- corpus sharding over a `jax.sharding.Mesh` with an allgather top-k merge
- JAX-native bi-encoder / cross-encoder transformer models (BERT family)
- an IR-metrics eval harness (nDCG / MRR / Recall / Precision) and a QPS/p50
  latency benchmark

The package is organised as:

    config        env-driven configuration (parity: reference config.py)
    utils         text + numeric kernels    (parity: reference utils.py)
    ops           TPU compute ops (dense top-k, BM25, fusion, segment max)
    ops.pallas    hand-written Pallas kernels for the hot ops
    models        JAX transformer models (bi-encoder, cross-encoder, tokenizer)
    parallel      mesh / sharding / distributed query engine
    index         artifact schema, ETL, offline index build, IO
    engine        the end-to-end search engine (run_search parity API)
    evals         IR metrics, test queries, benchmark runner
    serving       HTTP server + CLI
    tools         artifact audit, health check
    native        C++ runtime components (fast tokenizer), ctypes-bound
"""

__version__ = "0.1.0"

# NOTE: only the class is re-exported; the `config` singleton lives on the
# submodule (`from review_recommender_tpu.config import config`) so the
# package attribute does not shadow the `config` submodule itself.
from review_recommender_tpu.config import Config  # noqa: F401
