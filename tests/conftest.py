"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices so the sharded engine
(parallel/) can be exercised as if on a v5e-8 mesh without TPU hardware.
Must run before the first `import jax` anywhere in the test process.
"""
import os

# Force-override: the image exports JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run on the virtual 8-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = os.environ.get("RRT_TEST_PLATFORM", "cpu")
# Hermetic tests: never touch the persistent XLA compile cache. In-test
# entry points (__graft_entry__, bench sections) would otherwise point the
# whole process at data/xla_cache — and a stale entry compiled under a
# different CPU feature set loads with an AOT machine-feature mismatch and
# can return silently wrong results (observed: zeroed rerank scores that
# made rerank-lane assertions flake run-to-run).
os.environ["COMPILE_CACHE_DIR"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The image's sitecustomize force-registers the axon TPU plugin and overrides
# JAX_PLATFORMS; jax.config wins over both.
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def pytest_configure(config):
    """Build librrt_native.so from source when a compiler exists and the
    checked-in binary is missing or stale — tests that `skip` on
    native_available() must reflect THIS tree's sources, not a binary from
    an older commit (VERDICT r3 weak #3)."""
    from review_recommender_tpu.native import ensure_native_built

    ensure_native_built()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def sample_embeddings(rng):
    """Small random L2-normalized embedding matrix (32 docs x 64 dims)."""
    x = rng.standard_normal((32, 64)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture
def tiny_corpus():
    """A tiny product corpus with texts exercising gates/BM25/priors."""
    return [
        {
            "sku": "SKU001",
            "agg_text": "yellow socks with cute kittens, soft cotton socks great gift",
            "n_reviews": 42,
            "avg_stars": 4.5,
        },
        {
            "sku": "SKU002",
            "agg_text": "wireless bluetooth headphones with noise cancelling anc",
            "n_reviews": 120,
            "avg_stars": 4.1,
        },
        {
            "sku": "SKU003",
            "agg_text": "mechanical keyboard rgb backlit gaming keyboard usb cable",
            "n_reviews": 7,
            "avg_stars": 3.9,
        },
        {
            "sku": "SKU004",
            "agg_text": "red running shoes comfortable lightweight breathable mesh",
            "n_reviews": 3,
            "avg_stars": 5.0,
        },
        {
            "sku": "SKU005",
            "agg_text": "stainless steel kitchen knife set sharp chef blades",
            "n_reviews": 250,
            "avg_stars": 4.7,
        },
    ]
