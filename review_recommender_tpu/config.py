"""Configuration management for the TPU review-search engine.

Environment-variable driven config with defaults, validation and logging
setup. Mirrors the surface of the reference config system
(/root/reference/config.py:18-131) and extends it with TPU-specific knobs
(mesh shape, device dtypes, candidate-pool sizing, kernel selection).
"""
from __future__ import annotations

import logging
import os
from pathlib import Path


def _load_env_file(path: Path, *, override: bool = False) -> None:
    """Minimal .env loader (python-dotenv semantics for the simple KEY=VALUE
    case, which is all the reference's env files use): '#' comments — full
    line AND inline on unquoted values (python-dotenv strips ' # ...' from
    unquoted values; .env.example relies on this) — and blank lines
    skipped, optional 'export ' prefix, single/double quotes stripped,
    and — like load_dotenv() — existing process env vars are NOT overridden
    unless override=True."""
    if not path.is_file():
        return
    try:
        text = path.read_text(encoding="utf-8")
    except OSError:
        return
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export "):]
        key, _, value = line.partition("=")
        key = key.strip()
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        else:
            # unquoted value: an inline comment starts at ' #' (dotenv
            # semantics — a bare '#' inside a value is kept)
            for i, ch in enumerate(value):
                if ch == "#" and (i == 0 or value[i - 1] in " \t"):
                    value = value[:i].rstrip()
                    break
        if key and (override or key not in os.environ):
            os.environ[key] = value


def load_env_files() -> None:
    """Layered .env loading before Config reads the environment (parity with
    the reference's load_dotenv() at import time, /root/reference/
    config.py:11-16): `.env` first, then `.env.<ENVIRONMENT>` when the
    process env (or `.env` itself) names an environment. Process env vars
    always win over file values."""
    _load_env_file(Path(".env"))
    env = os.getenv("ENVIRONMENT", "")
    if env:
        _load_env_file(Path(f".env.{env.lower()}"))


load_env_files()


def _env_bool(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() == "true"


def _env_int(name: str, default: str) -> int:
    return int(os.getenv(name, default))


def _env_float(name: str, default: str) -> float:
    return float(os.getenv(name, default))


class Config:
    """Application configuration.

    Reads every knob from the environment at class definition time, exactly
    like the reference (`config.py:18-77`); tests may subclass/monkeypatch.
    """

    # Environment
    ENVIRONMENT = os.getenv("ENVIRONMENT", "development")

    # Model configuration (HF ids; weights converted to JAX when available)
    EMB_MODEL = os.getenv("EMB_MODEL", "BAAI/bge-small-en-v1.5")
    RERANK_MODEL = os.getenv("RERANK_MODEL", "cross-encoder/ms-marco-MiniLM-L-6-v2")
    # Local HF snapshot directories (config.json + weights + vocab.txt).
    # When set, serving loads REAL converted weights (models/load.py);
    # otherwise a dim-matched random tower stands in.
    EMB_MODEL_DIR = os.getenv("EMB_MODEL_DIR", "")
    RERANK_MODEL_DIR = os.getenv("RERANK_MODEL_DIR", "")

    # Application configuration
    APP_HOST = os.getenv("APP_HOST", "0.0.0.0")
    APP_PORT = _env_int("APP_PORT", "8501")
    APP_TITLE = os.getenv("APP_TITLE", "Review Search Copilot (TPU)")

    # Data paths. The index bundle replaces the reference's loose artifacts
    # (product_emb.npy + product_emb_meta.parquet + product_bm25.pkl +
    # reviews_with_embeddings.parquet) with one versioned directory.
    DATA_DIR = Path(os.getenv("DATA_DIR", "data/processed"))
    INDEX_DIR = Path(os.getenv("INDEX_DIR", "data/index"))
    RAW_DIR = Path(os.getenv("RAW_DIR", "data/raw"))
    # Loose-artifact names kept for import/export compatibility with the
    # reference pipeline outputs (config.py:36-39).
    PRODUCT_EMB_FILE = os.getenv("PRODUCT_EMB_FILE", "product_emb.npy")
    PRODUCT_META_FILE = os.getenv("PRODUCT_META_FILE", "product_emb_meta.parquet")
    REVIEWS_EMB_FILE = os.getenv("REVIEWS_EMB_FILE", "reviews_with_embeddings.parquet")
    BM25_FILE = os.getenv("BM25_FILE", "product_bm25.pkl")

    # Logging
    LOG_LEVEL = os.getenv("LOG_LEVEL", "INFO").upper()
    LOG_FORMAT = os.getenv(
        "LOG_FORMAT", "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    LOG_FILE = os.getenv("LOG_FILE", "logs/app.log")

    # Performance settings (reference config.py:52-55).
    # MAX_REVIEWS_SCAN is the snippet-scan cap used when a caller opts into
    # the exact host path via run_search(max_scan=-1); the default device
    # path scans everything (engine/search.py docstring). The reference's
    # CACHE_TTL has no equivalent here (nothing is TTL-cached) and was
    # deliberately dropped.
    MAX_REVIEWS_SCAN = _env_int("MAX_REVIEWS_SCAN", "300000")
    DEFAULT_POOL_SIZE = _env_int("DEFAULT_POOL_SIZE", "150")

    # Feature flags (reference config.py:58-61)
    ENABLE_BM25 = _env_bool("ENABLE_BM25", "true")
    ENABLE_RERANKING = _env_bool("ENABLE_RERANKING", "true")
    ENABLE_SNIPPETS = _env_bool("ENABLE_SNIPPETS", "true")
    ENABLE_METRICS_TAB = _env_bool("ENABLE_METRICS_TAB", "true")

    # Search defaults (reference config.py:64-72)
    DEFAULT_K = _env_int("DEFAULT_K", "10")
    DEFAULT_RERANK_K = _env_int("DEFAULT_RERANK_K", "50")
    DEFAULT_MIN_REVIEWS = _env_int("DEFAULT_MIN_REVIEWS", "8")
    DEFAULT_W_DENSE = _env_float("DEFAULT_W_DENSE", "0.55")
    DEFAULT_W_BM25 = _env_float("DEFAULT_W_BM25", "0.20")
    DEFAULT_W_RERANK = _env_float("DEFAULT_W_RERANK", "0.20")
    DEFAULT_W_PRIOR = _env_float("DEFAULT_W_PRIOR", "0.20")
    DEFAULT_W_BEST = _env_float("DEFAULT_W_BEST", "0.10")
    DEFAULT_GATE_PENALTY = _env_float("DEFAULT_GATE_PENALTY", "0.5")
    DEFAULT_PRIOR_C = _env_float("DEFAULT_PRIOR_C", "20.0")

    # ---- TPU-specific knobs (new in the rebuild) ----
    # Device dtype for the corpus embedding matrix. bf16 halves HBM traffic
    # on the N x 384 matmul which is the dominant per-query cost.
    EMB_DTYPE = os.getenv("EMB_DTYPE", "bfloat16")
    # Max padded unique terms kept per document in the device postings
    # arrays. 0 = auto: derive L from the corpus's unique-term P99 at build
    # time (index/build.py:derive_doc_terms_cap) instead of paying a flat
    # 512*8 bytes/doc of HBM.
    DOC_TERMS_CAP = _env_int("DOC_TERMS_CAP", "512")
    # Max query terms (padded) for BM25 / gate device kernels.
    QUERY_TERMS_CAP = _env_int("QUERY_TERMS_CAP", "32")
    # Gate evaluation: "device" (term-membership approximation, no host sync)
    # or "host" (exact substring semantics of the reference, gate computed on
    # the candidate pool host-side). Eval parity runs use "host".
    GATE_MODE = os.getenv("GATE_MODE", "device")
    # Mesh: number of chips the corpus axis is sharded over ("1" = single chip).
    MESH_SHARDS = _env_int("MESH_SHARDS", "1")
    # Name of the corpus-sharding mesh axis.
    MESH_AXIS = os.getenv("MESH_AXIS", "shards")
    # Use Pallas kernels where available ("true") vs plain XLA ops.
    USE_PALLAS = _env_bool("USE_PALLAS", "true")
    # Tower attention implementation: "auto" (fused Pallas MHA on TPU
    # backends, XLA einsum elsewhere), "xla", or "pallas". The fused kernel
    # (ops/pallas/attention_kernel.py) keeps the (S, S) logits in VMEM —
    # the rerank forward at (64, 512) is bandwidth-bound on that tensor.
    ATTN_IMPL = os.getenv("ATTN_IMPL", "auto")
    # Dense candidate-pool selection: "exact" (lax.top_k over the corpus
    # axis — the oracle-parity mode), "striped" (two-stage stripe-max
    # + top-k over stripe maxima, ops/dense.py:striped_topk — ~2x faster
    # stage-A at N=200k; exact scores, ~0.99 pool recall at pool=150), or
    # "auto" (default): striped when the padded corpus reaches
    # DENSE_POOL_AUTO_MIN rows, exact below it. Auto keeps small/test
    # corpora bit-identical to the reference oracle while production-sized
    # corpora get the striped win — interleaved A/B medians at N=200k on
    # one v5e chip: striped/exact = 1.30x at batch 128, 1.34x at batch 256,
    # parity (0.96x, within tunnel noise) at batch 32.
    DENSE_POOL_MODE = os.getenv("DENSE_POOL_MODE", "auto")
    # Corpus-size threshold (padded rows) where "auto" switches to striped.
    # Below ~64k rows the full-corpus lax.top_k is already cheap and exact
    # parity is worth more than the stripe fold's saving.
    DENSE_POOL_AUTO_MIN = _env_int("DENSE_POOL_AUTO_MIN", "65536")
    # Stripe count for DENSE_POOL_MODE=striped. Expected pool-recall loss is
    # about pool / (2 * stripes) — e.g. ~0.9% at pool=150, stripes=8192;
    # corpora with n_padded <= stripes are exact.
    DENSE_POOL_STRIPES = _env_int("DENSE_POOL_STRIPES", "8192")
    # DENSE_POOL_MODE=ivf (opt-in, never chosen by auto): sub-linear
    # clustered pool (ops/ivf.py) — k-means blocks probed by centroid
    # score. The single-query / small-batch latency play: HBM read per
    # query is IVF_NPROBE * IVF_BLOCK_ROWS rows instead of the whole
    # corpus. Scores of scanned rows stay exact; pool membership is
    # probabilistic (the striped contract, but data-dependent).
    # IVF_CENTROIDS=0 auto-sizes to ~4*sqrt(N); IVF_BLOCK_ROWS=0
    # auto-sizes to the mean cluster size (ops/ivf.py:auto_block_rows —
    # oversized blocks waste their HBM read on padding).
    IVF_NPROBE = _env_int("IVF_NPROBE", "64")
    IVF_BLOCK_ROWS = _env_int("IVF_BLOCK_ROWS", "0")
    IVF_CENTROIDS = _env_int("IVF_CENTROIDS", "0")
    # IVF recall is data-dependent (clustered corpora ~0.999, weakly
    # clustered spaces measurably worse — evals_out/ivf/ notes). At init
    # the engine samples corpus rows as queries, measures pool recall vs
    # the exact scan (ops/ivf.py:measure_pool_recall) and WARNS below
    # IVF_SELFCHECK_MIN. 0 queries disables the check.
    IVF_SELFCHECK_QUERIES = _env_int("IVF_SELFCHECK_QUERIES", "16")
    IVF_SELFCHECK_MIN = _env_float("IVF_SELFCHECK_MIN", "0.95")

    @classmethod
    def resolve_pool_mode(cls, mode: str, n_padded: int) -> str:
        """Resolve a dense_pool mode string to 'exact' | 'striped'.
        'auto' picks striped iff the padded corpus has at least
        DENSE_POOL_AUTO_MIN rows (see DENSE_POOL_MODE comment for the
        measured crossover)."""
        if mode != "auto":
            return mode
        return ("striped" if n_padded >= cls.DENSE_POOL_AUTO_MIN
                else "exact")
    # Cross-request micro-batching (serve/api.py:MicroBatcher): concurrent
    # /search requests within the window coalesce into one batched device
    # program. Window ~2 ms trades a little latency for batched throughput.
    ENABLE_MICROBATCH = _env_bool("ENABLE_MICROBATCH", "true")
    # Serve through the C++ epoll front end (native/server.cc): HTTP
    # parsing + micro-batch windowing in native code, ONE Python entry per
    # window. Opt-in; the stdlib server is the default and the automatic
    # fallback when librrt_native.so is absent.
    SERVE_NATIVE = _env_bool("SERVE_NATIVE", "false")
    MICROBATCH_WINDOW_MS = _env_float("MICROBATCH_WINDOW_MS", "2.0")
    MICROBATCH_MAX = _env_int("MICROBATCH_MAX", "128")
    # Per-rider wait bound on the coalesced path. Must cover a COLD
    # compile of a not-yet-warmed program shape (a burst with a novel
    # k/rerank_k compiles inside the window — warmup only pre-builds the
    # default-k buckets), which takes minutes' worth of seconds on a slow
    # host; 30 s was measured to flake exactly there. Warm requests never
    # come near this bound.
    MICROBATCH_TIMEOUT_S = _env_float("MICROBATCH_TIMEOUT_S", "180.0")

    # Persistent XLA compilation cache (utils/compile_cache.py). Compiled
    # executables are written under this directory and reloaded by later
    # processes, so a cold CLI/server start on the TPU pays seconds of
    # cache reads instead of minutes of recompiles (measured on this
    # hardware: 74 s -> 3 s for one program). Empty string disables.
    COMPILE_CACHE_DIR = os.getenv("COMPILE_CACHE_DIR", "data/xla_cache")
    # Only executables whose compile took at least this long are persisted.
    # Default 0 = persist everything: backends that compile server-side
    # (e.g. tunneled TPU plugins) report near-zero CLIENT-side compile
    # times, so any positive gate can silently disable the cache exactly
    # where it matters most (measured here: gate 1.0 -> 0 entries written,
    # gate 0.0 -> 91 entries for one CLI search).
    COMPILE_CACHE_MIN_COMPILE_SECS = _env_float(
        "COMPILE_CACHE_MIN_COMPILE_SECS", "0.0"
    )

    # Max reviews kept per product at snippet-index build time
    # (data/prep.py:filter_reviews_for_snippets) — bounds the review-index
    # HBM footprint. 0 disables the cap.
    SNIPPET_REVIEWS_CAP = _env_int("SNIPPET_REVIEWS_CAP", "256")

    # Security settings (reference config.py:74-77)
    SECRET_KEY = os.getenv("SECRET_KEY")
    ALLOWED_HOSTS = (
        os.getenv("ALLOWED_HOSTS", "").split(",") if os.getenv("ALLOWED_HOSTS") else []
    )
    HTTPS_ONLY = _env_bool("HTTPS_ONLY", "false")

    @classmethod
    def validate(cls) -> None:
        """Validate configuration and create necessary directories."""
        log_dir = Path(cls.LOG_FILE).parent
        log_dir.mkdir(parents=True, exist_ok=True)
        if cls.DOC_TERMS_CAP < 0:
            raise ValueError("DOC_TERMS_CAP must be >= 0 (0 = auto-derive)")
        if cls.QUERY_TERMS_CAP <= 0:
            raise ValueError("QUERY_TERMS_CAP must be positive")
        if cls.GATE_MODE not in ("device", "host"):
            raise ValueError(f"GATE_MODE must be 'device' or 'host', got {cls.GATE_MODE!r}")
        if cls.EMB_DTYPE not in ("bfloat16", "float32", "float16", "int8"):
            raise ValueError(f"Unsupported EMB_DTYPE: {cls.EMB_DTYPE!r}")
        if cls.DENSE_POOL_MODE not in ("auto", "exact", "striped", "ivf"):
            raise ValueError(
                f"DENSE_POOL_MODE must be 'auto', 'exact', 'striped' or "
                f"'ivf', got {cls.DENSE_POOL_MODE!r}"
            )
        if cls.DENSE_POOL_STRIPES <= 0:
            raise ValueError("DENSE_POOL_STRIPES must be positive")
        if cls.IVF_NPROBE <= 0:
            raise ValueError("IVF_NPROBE must be positive")
        if cls.IVF_BLOCK_ROWS < 0 or cls.IVF_CENTROIDS < 0:
            raise ValueError(
                "IVF_BLOCK_ROWS and IVF_CENTROIDS must be >= 0 (0 = auto)"
            )
        if cls.DENSE_POOL_AUTO_MIN <= 0:
            raise ValueError("DENSE_POOL_AUTO_MIN must be positive")
        if cls.is_production():
            if not cls.INDEX_DIR.exists():
                raise FileNotFoundError(
                    f"INDEX_DIR does not exist in production: {cls.INDEX_DIR}"
                )

    @classmethod
    def setup_logging(cls) -> None:
        """Configure application logging (file + stream handlers)."""
        log_dir = Path(cls.LOG_FILE).parent
        log_dir.mkdir(parents=True, exist_ok=True)
        logging.basicConfig(
            level=getattr(logging, cls.LOG_LEVEL, logging.INFO),
            format=cls.LOG_FORMAT,
            handlers=[logging.FileHandler(cls.LOG_FILE), logging.StreamHandler()],
        )

    @classmethod
    def is_production(cls) -> bool:
        return cls.ENVIRONMENT.lower() == "production"

    @classmethod
    def is_development(cls) -> bool:
        return cls.ENVIRONMENT.lower() == "development"


# Global config instance (parity with reference config.py:131)
config = Config()
