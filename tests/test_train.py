"""Contrastive trainer tests: loss decreases, dp x tp sharding runs on the
8-virtual-device mesh, checkpoint save/restore round-trips."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from review_recommender_tpu.models.bert import BertConfig, init_biencoder
from review_recommender_tpu.models.tokenizer import HashTokenizer
from review_recommender_tpu.train.contrastive import (
    ContrastiveTrainer,
    TrainConfig,
    make_pair_batch,
    param_specs,
)

PAIRS = [
    ("yellow cat socks", "soft yellow socks with cute kittens print"),
    ("wireless headphones", "bluetooth over-ear headphones noise cancelling"),
    ("kitchen knife", "stainless steel chef knife sharp blade"),
    ("running shoes", "lightweight breathable mesh running shoes"),
]


@pytest.fixture(scope="module")
def setup():
    cfg = BertConfig.tiny(vocab_size=512)
    _, params = init_biencoder(cfg, seed=0, dtype=jnp.float32)
    tok = HashTokenizer(vocab_size=512)
    qs = [q for q, _ in PAIRS]
    ds = [d for _, d in PAIRS]
    batch = make_pair_batch(tok, qs, ds, max_len=32, pad_to=32)
    return cfg, params, batch


def test_loss_decreases(setup):
    cfg, params, batch = setup
    tr = ContrastiveTrainer(
        cfg, params, dtype=jnp.float32,
        train_cfg=TrainConfig(learning_rate=1e-3),
    )
    m0 = tr.train_step(*batch)
    for _ in range(5):
        m = tr.train_step(*batch)
    assert m["loss"] < m0["loss"]
    assert m["step"] == 6


def test_param_specs_cover_tp(setup):
    cfg, params, _ = setup
    from jax.sharding import PartitionSpec as P

    specs = param_specs(params)
    flat = jax.tree_util.tree_leaves_with_path(specs, is_leaf=lambda x: isinstance(x, P))
    named = {"/".join(str(getattr(k, "key", k)) for k in path): s for path, s in flat}
    tp_sharded = [n for n, s in named.items() if any(a == "tp" for a in s)]
    assert any("intermediate/kernel" in n for n in tp_sharded)
    assert any("attention/query/kernel" in n for n in tp_sharded)
    assert any("word_embeddings" in n for n in tp_sharded)


def test_sharded_step_matches_unsharded(setup):
    cfg, params, batch = setup
    devices = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    tr_m = ContrastiveTrainer(cfg, params, mesh=mesh, dtype=jnp.float32)
    tr_1 = ContrastiveTrainer(cfg, params, dtype=jnp.float32)
    m_m = tr_m.train_step(*batch)
    m_1 = tr_1.train_step(*batch)
    assert m_m["loss"] == pytest.approx(m_1["loss"], rel=1e-4)


def test_remat_matches_no_remat(setup):
    cfg, params, batch = setup
    tr_a = ContrastiveTrainer(cfg, params, dtype=jnp.float32,
                              train_cfg=TrainConfig(remat=False))
    tr_b = ContrastiveTrainer(cfg, params, dtype=jnp.float32,
                              train_cfg=TrainConfig(remat=True))
    m_a = tr_a.train_step(*batch)
    m_b = tr_b.train_step(*batch)
    assert m_b["loss"] == pytest.approx(m_a["loss"], rel=1e-5)
    # params updated identically (rematerialization changes memory, not math)
    la = jax.tree.leaves(tr_a.params)[0]
    lb = jax.tree.leaves(tr_b.params)[0]
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


def test_pair_mining_and_training_loop(setup, tmp_path):
    from review_recommender_tpu.models.tokenizer import HashTokenizer
    from review_recommender_tpu.train.data import (
        iterate_batches,
        mine_pairs,
        train_biencoder,
    )

    cfg, params, _batch = setup
    rng = np.random.default_rng(0)
    product_skus = [f"P{i}" for i in range(6)]
    product_texts = [f"product {i} wireless headphone excellent bass sound "
                     f"battery comfort feature{i}" for i in range(6)]
    review_skus, review_texts = [], []
    for i in range(6):
        for j in range(5):
            review_skus.append(f"P{i}")
            review_texts.append(
                f"bought feature{i} headphone bass sound battery works "
                f"comfort number{j} detail{i}{j} quality"
            )
    pairs = mine_pairs(review_texts, review_skus, product_skus, product_texts,
                       max_pairs_per_product=2, seed=1)
    assert 6 <= len(pairs) <= 12
    # query keywords come from the review, positive is the product text
    for q, d in pairs:
        assert d.startswith("product ")
        assert len(q.split()) == 4

    # batches have fixed shapes; training runs and checkpoints
    tok = HashTokenizer(vocab_size=512)
    batches = list(iterate_batches(pairs, tok, batch_size=4, max_len=32,
                                   epochs=2))
    assert all(b[0].shape == (4, 32) for b in batches)

    tr = ContrastiveTrainer(cfg, params, dtype=jnp.float32,
                            train_cfg=TrainConfig(learning_rate=1e-3))
    hist = train_biencoder(tr, pairs, tok, batch_size=4, epochs=1,
                           max_len=32, checkpoint_path=tmp_path / "ck.msgpack")
    assert len(hist) >= 1 and np.isfinite(hist[-1]["loss"])
    assert (tmp_path / "ck.msgpack").exists()


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, params, batch = setup
    tr = ContrastiveTrainer(cfg, params, dtype=jnp.float32)
    tr.train_step(*batch)
    ckpt = tmp_path / "ck" / "state.msgpack"
    tr.save(ckpt)
    loss_before = tr.train_step(*batch)["loss"]

    tr2 = ContrastiveTrainer(cfg, params, dtype=jnp.float32)
    tr2.restore(ckpt)
    assert tr2.step == 1
    loss_after = tr2.train_step(*batch)["loss"]
    assert loss_after == pytest.approx(loss_before, rel=1e-5)
