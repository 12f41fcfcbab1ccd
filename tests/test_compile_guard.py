"""Compile-payload guard (utils/compile_guard.py): the engine's jitted
programs must take corpus arrays as arguments, never close over them —
closed-over arrays ship inside the (possibly remote) compile payload
(ROADMAP round-1 item #8)."""
import numpy as np
import pytest

import jax.numpy as jnp

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.ops.fusion import FusionWeights
from review_recommender_tpu.utils.compile_guard import (
    assert_no_large_constants,
    large_constants,
    traced_constant_sizes,
)
from tests.test_engine_parity import make_corpus


def test_detects_closure_constant():
    big = jnp.ones((512, 1024), jnp.float32)  # 2 MiB closed-over constant

    def leaky(q):
        return big @ q

    found = large_constants(leaky, jnp.ones(1024), limit_bytes=1 << 20)
    assert found and found[0][1] == big.nbytes
    with pytest.raises(AssertionError, match="closes over"):
        assert_no_large_constants(leaky, jnp.ones(1024))


def test_argument_arrays_are_not_constants():
    def clean(m, q):
        return m @ q

    assert large_constants(clean, jnp.ones((512, 1024)), jnp.ones(1024)) == []


def test_engine_stage_a_closes_over_nothing_big():
    products, emb, _r, _re = make_corpus(n=64, dim=32, seed=3)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=64)
    engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    qf = engine.featurizer.featurize("wireless headphones")
    qvec = jnp.asarray(np.zeros(32, np.float32))

    def run(a, qvec, q_terms, q_idf, gp_mask, gt_ids, g_valid):
        return engine._stage_a_impl(a, qvec, q_terms, q_idf, gp_mask,
                                    gt_ids, g_valid, pool=16)

    # even on this tiny corpus nothing beyond scalar glue may be captured:
    # budget = 4 KiB
    assert_no_large_constants(
        run, engine.arrays, qvec,
        jnp.asarray(qf.q_terms), jnp.asarray(qf.q_idf),
        jnp.asarray(qf.group_phrase_mask), jnp.asarray(qf.group_term_ids),
        jnp.asarray(qf.group_valid),
        limit_bytes=4 << 10, name="_stage_a_impl",
    )


def test_engine_fused_packed_closes_over_nothing_big():
    products, emb, _r, _re = make_corpus(n=64, dim=32, seed=5)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=64)
    engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    qf = engine.featurizer.featurize("kitchen knife")
    w = FusionWeights.make()
    qp = jnp.asarray(engine._combined(np.zeros(32, np.float32), qf.pack()))

    def run(a, qp, w, use_snips):
        return engine._fused_packed1_impl(a, None, qp, w, use_snips,
                                          pool=16, k=8)

    assert_no_large_constants(
        run, engine.arrays, qp, w, jnp.bool_(False),
        limit_bytes=4 << 10, name="_fused_packed1_impl",
    )


def test_sizes_reported():
    big = jnp.ones((16, 16), jnp.float32)

    def f(x):
        return x + big

    sizes = traced_constant_sizes(f, jnp.ones((16, 16)))
    assert ("float32[16, 16]", 1024) in sizes
