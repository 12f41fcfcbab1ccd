"""Persistent XLA compilation cache (utils/compile_cache.py).

The cache dir is process-global JAX state, so the behavioral test runs in
a subprocess: enable -> jit a program -> cache files appear on disk. The
reference has no analog (its st.cache_resource caching dies with the
process, app/app_product_search.py:53); surviving process boundaries is
the point here.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


class TestEnableCompileCache:
    def test_disabled_by_empty_dir(self):
        from review_recommender_tpu.utils.compile_cache import (
            _STATE,
            enable_compile_cache,
        )

        assert _STATE["dir"] is None or isinstance(_STATE["dir"], str)
        if _STATE["dir"] is None:
            assert enable_compile_cache(cache_dir="") is None

    def test_unwritable_dir_degrades_to_disabled(self):
        from review_recommender_tpu.utils.compile_cache import (
            _STATE,
            enable_compile_cache,
        )

        if _STATE["dir"] is None:
            # a path under a file can't be mkdir'd
            bad = Path(__file__).resolve() / "sub"
            assert enable_compile_cache(cache_dir=str(bad)) is None

    def test_subprocess_writes_cache_files(self, tmp_path):
        cache = tmp_path / "xla_cache"
        code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from review_recommender_tpu.utils.compile_cache import enable_compile_cache
active = enable_compile_cache(cache_dir={str(cache)!r}, min_compile_secs=0.0)
# entries land under a per-host-fingerprint subdir (machine-feature
# mismatched executables must never be shared across hosts)
assert active.startswith({str(cache)!r}) and "host-" in active, active
# idempotent: a second call (even with another dir) keeps the first
assert enable_compile_cache(cache_dir="/nonexistent-other") == active
import jax.numpy as jnp
import numpy as np
f = jax.jit(lambda x: (x @ x.T).sum())
f(jnp.asarray(np.random.rand(32, 32), np.float32)).block_until_ready()
import os
entries = os.listdir(active)
assert entries, "no cache entries written"
print("CACHE_OK", len(entries))
"""
        out = subprocess.run(
            [sys.executable, "-c", code], cwd=REPO,
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "CACHE_OK" in out.stdout
