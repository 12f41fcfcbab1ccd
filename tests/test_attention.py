"""Fused Pallas attention kernel vs the XLA einsum path.

The kernel (ops/pallas/attention_kernel.py) is an op-for-op transcription of
the XLA math, so parity is tight in f32 and bf16-rounding-bounded in bf16.
Tests run the kernel in interpret mode on the CPU backend.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from review_recommender_tpu.models.bert import (
    BertConfig,
    BiEncoderModel,
    CrossEncoderModel,
    init_biencoder,
    init_crossencoder,
)
from review_recommender_tpu.ops.pallas.attention_kernel import (
    mha_pallas,
    mha_xla,
    multihead_attention,
    resolve_attn_impl,
)


def _rand_qkv(rng, b, s, hd, dtype):
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, s, hd)).astype(np.float32), dtype=dtype
    )
    q, k, v = mk(), mk(), mk()
    # random padding tail per row, at least one live key position
    lens = rng.integers(1, s + 1, size=b)
    mask = (np.arange(s)[None, :] < lens[:, None]).astype(np.float32)
    bias = jnp.asarray(np.where(mask > 0, 0.0, -1e30), dtype=jnp.float32)
    return q, k, v, bias


class TestKernelParity:
    @pytest.mark.parametrize(
        "b,s,heads,head_dim",
        [(2, 16, 4, 32), (3, 64, 12, 32), (1, 128, 6, 64), (4, 32, 2, 16)],
    )
    def test_f32_parity(self, rng, b, s, heads, head_dim):
        q, k, v, bias = _rand_qkv(rng, b, s, heads * head_dim, jnp.float32)
        ref = mha_xla(q, k, v, bias, heads)
        got = mha_pallas(q, k, v, bias, heads, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

    def test_bf16_parity(self, rng):
        # 4 heads x 32 head_dim — the production head width in bf16
        q, k, v, bias = _rand_qkv(rng, 2, 64, 4 * 32, jnp.bfloat16)
        ref = mha_xla(q, k, v, bias, 4)
        got = mha_pallas(q, k, v, bias, 4, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32),
            np.asarray(ref, dtype=np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_fully_masked_rows_match(self, rng):
        """Query rows past the padding boundary produce the same (uniform-
        softmax) output on both paths."""
        b, s, hd = 2, 32, 64
        q, k, v, _ = _rand_qkv(rng, b, s, hd, jnp.float32)
        bias = jnp.full((b, s), -1e30, jnp.float32)  # everything masked
        ref = mha_xla(q, k, v, bias, 4)
        got = mha_pallas(q, k, v, bias, 4, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        assert np.isfinite(np.asarray(got)).all()

    def test_grad_matches_xla(self, rng):
        """custom_vjp backward (rematerialized XLA) == direct XLA grads."""
        q, k, v, bias = _rand_qkv(rng, 2, 32, 8 * 8, jnp.float32)

        def loss_pallas(q_, k_, v_):
            out = multihead_attention(q_, k_, v_, bias, 8, impl="pallas")
            return jnp.sum(out * out)

        def loss_xla(q_, k_, v_):
            return jnp.sum(mha_xla(q_, k_, v_, bias, 8) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4
            )


class TestModelIntegration:
    def test_biencoder_pallas_equals_xla(self, rng):
        cfg = BertConfig.tiny()
        _, params = init_biencoder(cfg, seed=0, dtype=jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (3, 24)), jnp.int32)
        mask = jnp.asarray(
            (np.arange(24)[None, :] < np.array([24, 10, 17])[:, None]),
            jnp.int32,
        )
        out = {}
        for impl in ("xla", "pallas"):
            model = BiEncoderModel(cfg, dtype=jnp.float32, attn_impl=impl)
            out[impl] = np.asarray(
                model.apply({"params": params}, ids, mask)
            )
        np.testing.assert_allclose(
            out["pallas"], out["xla"], rtol=1e-5, atol=1e-5
        )

    def test_crossencoder_pallas_equals_xla(self, rng):
        cfg = BertConfig.tiny()
        _, params = init_crossencoder(cfg, seed=1, dtype=jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 16)), jnp.int32)
        mask = jnp.ones_like(ids)
        out = {}
        for impl in ("xla", "pallas"):
            model = CrossEncoderModel(cfg, dtype=jnp.float32, attn_impl=impl)
            out[impl] = np.asarray(
                model.apply({"params": params}, ids, mask)
            )
        np.testing.assert_allclose(
            out["pallas"], out["xla"], rtol=1e-5, atol=1e-5
        )

    def test_mlm_grad_through_pallas_attention(self, rng):
        """Training-style grad through a model whose attention is the fused
        kernel: custom_vjp keeps optimization on the XLA backward."""
        cfg = BertConfig.tiny()
        model = BiEncoderModel(cfg, dtype=jnp.float32, attn_impl="pallas")
        _, params = init_biencoder(cfg, seed=0, dtype=jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
        mask = jnp.ones_like(ids)

        def loss(p):
            emb = model.apply({"params": p}, ids, mask)
            return jnp.sum(emb**2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


class TestResolve:
    def test_env_override_wins(self, monkeypatch):
        monkeypatch.setenv("ATTN_IMPL", "xla")
        assert resolve_attn_impl("pallas") == "xla"
        monkeypatch.setenv("ATTN_IMPL", "pallas")
        assert resolve_attn_impl("xla") == "pallas"

    def test_explicit_impl(self, monkeypatch):
        monkeypatch.delenv("ATTN_IMPL", raising=False)
        assert resolve_attn_impl("xla") == "xla"
        assert resolve_attn_impl("pallas") == "pallas"

    def test_auto_is_xla_on_cpu(self, monkeypatch):
        monkeypatch.delenv("ATTN_IMPL", raising=False)
        # conftest pins the test backend to CPU
        assert resolve_attn_impl("auto") == "xla"

    def test_use_pallas_off_forces_xla(self, monkeypatch):
        monkeypatch.delenv("ATTN_IMPL", raising=False)
        monkeypatch.setenv("USE_PALLAS", "false")
        assert resolve_attn_impl("auto") == "xla"

    def test_seq_gate_in_auto_mode(self, monkeypatch):
        from review_recommender_tpu.ops.pallas import attention_kernel as ak

        monkeypatch.delenv("ATTN_IMPL", raising=False)
        monkeypatch.delenv("USE_PALLAS", raising=False)
        # pretend the backend picked pallas in auto mode
        monkeypatch.setattr(ak, "resolve_attn_impl", lambda impl: "pallas")
        assert ak._choose_impl("auto", 512) == "pallas"
        assert ak._choose_impl("auto", 256) == "xla"  # below the floor
        # explicit impl skips the gate
        assert ak._choose_impl("pallas", 16) == "pallas"
        # env override skips the gate too
        monkeypatch.setenv("ATTN_IMPL", "pallas")
        assert ak._choose_impl("auto", 16) == "pallas"
        # tunable floor
        monkeypatch.delenv("ATTN_IMPL", raising=False)
        monkeypatch.setenv("ATTN_PALLAS_MIN_SEQ", "128")
        assert ak._choose_impl("auto", 256) == "pallas"
