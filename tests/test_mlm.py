"""MLM pretraining tests: masking contract, loss decreases, dp x tp mesh
parity, checkpoint round-trip, trunk grafts into the cross-encoder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from review_recommender_tpu.models.bert import BertConfig
from review_recommender_tpu.models.tokenizer import HashTokenizer
from review_recommender_tpu.train.mlm import (
    MLMTrainConfig,
    MLMTrainer,
    init_mlm,
    make_mlm_batch,
    pretrain_mlm,
)

TEXTS = [
    "soft yellow socks with cute kittens print",
    "bluetooth over-ear headphones noise cancelling",
    "stainless steel chef knife sharp blade",
    "lightweight breathable mesh running shoes",
] * 4


@pytest.fixture(scope="module")
def setup():
    cfg = BertConfig.tiny(vocab_size=512)
    _, params = init_mlm(cfg, seed=0, dtype=jnp.float32)
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.default_rng(0)
    batch = make_mlm_batch(tok, TEXTS, max_len=16, rng=rng)
    return cfg, params, tok, batch


def test_masking_contract():
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.default_rng(1)
    ids, attn, labels, weights = make_mlm_batch(
        tok, TEXTS, max_len=16, rng=rng, mask_prob=0.3
    )
    assert ids.shape == attn.shape == labels.shape == weights.shape
    # every row has at least one masked position
    assert (weights.sum(axis=1) >= 1).all()
    # labels hold the ORIGINAL ids; where unmasked, input equals labels
    assert (ids[weights == 0] == labels[weights == 0]).all()
    # CLS/SEP/PAD never masked
    special = (labels == tok.cls_id) | (labels == tok.sep_id) | (attn == 0)
    assert (weights[special] == 0).all()
    # most masked positions got the [MASK] id (80% branch)
    masked_ids = ids[weights == 1]
    assert (masked_ids == tok.mask_id).mean() > 0.5


def test_masking_with_wordpiece_vocab():
    """WordPiece vocabs work in make_mlm_batch: [MASK] id when present,
    [UNK] fallback when absent."""
    from review_recommender_tpu.models.tokenizer import WordPieceTokenizer

    words = "[PAD] [UNK] [CLS] [SEP] [MASK] soft yellow socks".split()
    tok = WordPieceTokenizer({w: i for i, w in enumerate(words)})
    assert tok.mask_id == 4
    rng = np.random.default_rng(2)
    ids, attn, labels, weights = make_mlm_batch(
        tok, ["soft yellow socks"] * 4, max_len=8, rng=rng, mask_prob=0.5
    )
    assert (weights.sum(axis=1) >= 1).all()

    no_mask = WordPieceTokenizer(
        {w: i for i, w in enumerate("[PAD] [UNK] [CLS] [SEP] soft".split())}
    )
    assert no_mask.mask_id == no_mask.unk_id


def test_loss_decreases(setup):
    cfg, params, tok, batch = setup
    tr = MLMTrainer(cfg, params, dtype=jnp.float32,
                    train_cfg=MLMTrainConfig(learning_rate=1e-3))
    m0 = tr.train_step(*batch)
    for _ in range(8):
        m = tr.train_step(*batch)
    assert m["loss"] < m0["loss"]
    assert m["step"] == 9


def test_sharded_step_matches_unsharded(setup):
    cfg, params, tok, batch = setup
    devices = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    m_m = MLMTrainer(cfg, params, mesh=mesh,
                     dtype=jnp.float32).train_step(*batch)
    m_1 = MLMTrainer(cfg, params, dtype=jnp.float32).train_step(*batch)
    assert m_m["loss"] == pytest.approx(m_1["loss"], rel=1e-4)


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, params, tok, batch = setup
    tr = MLMTrainer(cfg, params, dtype=jnp.float32)
    tr.train_step(*batch)
    tr.save(tmp_path / "mlm.msgpack")
    loss_before = tr.train_step(*batch)["loss"]
    tr2 = MLMTrainer(cfg, params, dtype=jnp.float32)
    tr2.restore(tmp_path / "mlm.msgpack")
    assert tr2.step == 1
    assert tr2.train_step(*batch)["loss"] == pytest.approx(loss_before,
                                                           rel=1e-5)


def test_pretrain_loop_and_graft(setup, tmp_path):
    from review_recommender_tpu.models.bert import init_crossencoder
    from review_recommender_tpu.train.cross_encoder import (
        warm_start_from_biencoder,
    )

    cfg, params, tok, _ = setup
    tr = MLMTrainer(cfg, params, dtype=jnp.float32,
                    train_cfg=MLMTrainConfig(learning_rate=1e-3))
    hist = pretrain_mlm(tr, TEXTS, tok, batch_size=8, steps=5, max_len=16,
                        seed=0, checkpoint_path=tmp_path / "mlm.msgpack")
    assert len(hist) == 5 and np.isfinite(hist[-1]["loss"])
    assert (tmp_path / "mlm.msgpack").exists()

    # the pretrained trunk grafts into a cross-encoder of the same dims
    _, xe_params = init_crossencoder(cfg, seed=2, dtype=jnp.float32)
    out = warm_start_from_biencoder(xe_params, tr.params)
    np.testing.assert_array_equal(
        np.asarray(out["encoder"]["word_embeddings"]["embedding"]),
        np.asarray(tr.params["encoder"]["word_embeddings"]["embedding"]),
    )
