"""Persistent XLA compilation cache for the serving/CLI entry points.

Every jitted engine program (fused query path, batched micro-batcher
buckets, training steps) is traced+compiled per process; on the TPU each
compile is tens of seconds. JAX's persistent compilation cache serializes
compiled executables to disk keyed by (HLO, backend, flags), so repeat
process starts — a redeploy, a CLI invocation, a crash-restart — reload
them in seconds instead. This is the TPU-native answer to the reference's
Streamlit `st.cache_resource` model caching (app/app_product_search.py:53,
which caches *Python objects* within one process): here the expensive
artifact is the compiled XLA program, and the cache must survive process
boundaries to matter.

Enabled by default under `COMPILE_CACHE_DIR` (data/xla_cache); disable
with COMPILE_CACHE_DIR="". Safe to call multiple times; first call wins.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

from review_recommender_tpu.config import config

logger = logging.getLogger(__name__)

_STATE = {"dir": None}


def _machine_fingerprint() -> str:
    """Host fingerprint the cache directory is keyed by. XLA's own cache
    key does NOT cover the exact CPU feature set its CPU AOT results were
    compiled for — loading an entry written under a different feature mix
    logs 'machine features ... could lead to execution errors such as
    SIGILL' and was observed here returning silently WRONG results (zeroed
    outputs) rather than crashing. Keying the directory by (jax version,
    arch, cpuinfo flags) makes entries from a differently-featured host
    unreachable instead of subtly poisonous."""
    import hashlib
    import platform

    import jax

    bits = [jax.__version__, platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    bits.append(line.split(":", 1)[1].strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def enable_compile_cache(cache_dir: Optional[str] = None,
                         min_compile_secs: Optional[float] = None,
                         ) -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    config.COMPILE_CACHE_DIR), under a per-host-fingerprint subdirectory
    (see _machine_fingerprint). Returns the active cache directory, or None
    when disabled. Idempotent: once enabled, later calls return the active
    directory without re-configuring (jax_compilation_cache_dir is global
    process state)."""
    if _STATE["dir"] is not None:
        return _STATE["dir"]
    raw = config.COMPILE_CACHE_DIR if cache_dir is None else cache_dir
    if not raw:
        return None
    path = Path(raw) / f"host-{_machine_fingerprint()}"
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as e:  # unwritable target: serve without the cache
        logger.warning("compile cache disabled (%s: %s)", path, e)
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(config.COMPILE_CACHE_MIN_COMPILE_SECS
              if min_compile_secs is None else min_compile_secs),
    )
    _STATE["dir"] = str(path)
    logger.info("persistent XLA compile cache at %s", path)
    return _STATE["dir"]
