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


@pytest.fixture(scope="module")
def xe_setup():
    from review_recommender_tpu.models.bert import init_crossencoder

    cfg = BertConfig.tiny(vocab_size=512)
    _, params = init_crossencoder(cfg, seed=0, dtype=jnp.float32)
    tok = HashTokenizer(vocab_size=512)
    from review_recommender_tpu.train.cross_encoder import make_triple_batch

    qs = [q for q, _ in PAIRS] * 2
    ds = [d for _, d in PAIRS] + [d for _, d in reversed(PAIRS)]
    ys = [1.0] * 4 + [0.0] * 4  # matched pairs relevant, shuffled ones not
    batch = make_triple_batch(tok, qs, ds, ys, max_len=32, pad_to=32)
    return cfg, params, batch


def test_crossencoder_loss_decreases(xe_setup):
    from review_recommender_tpu.train.cross_encoder import (
        CrossEncoderTrainer,
        CrossTrainConfig,
    )

    cfg, params, batch = xe_setup
    tr = CrossEncoderTrainer(
        cfg, params, dtype=jnp.float32,
        train_cfg=CrossTrainConfig(learning_rate=1e-3),
    )
    m0 = tr.train_step(*batch)
    for _ in range(8):
        m = tr.train_step(*batch)
    assert m["loss"] < m0["loss"]
    assert m["step"] == 9
    assert m["acc"] >= 0.5


def test_crossencoder_sharded_matches_unsharded(xe_setup):
    from review_recommender_tpu.train.cross_encoder import CrossEncoderTrainer

    cfg, params, batch = xe_setup
    devices = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devices, ("dp", "tp"))
    m_m = CrossEncoderTrainer(cfg, params, mesh=mesh,
                              dtype=jnp.float32).train_step(*batch)
    m_1 = CrossEncoderTrainer(cfg, params,
                              dtype=jnp.float32).train_step(*batch)
    assert m_m["loss"] == pytest.approx(m_1["loss"], rel=1e-4)


def test_crossencoder_checkpoint_roundtrip(xe_setup, tmp_path):
    from review_recommender_tpu.train.cross_encoder import CrossEncoderTrainer

    cfg, params, batch = xe_setup
    tr = CrossEncoderTrainer(cfg, params, dtype=jnp.float32)
    tr.train_step(*batch)
    ckpt = tmp_path / "xe" / "state.msgpack"
    tr.save(ckpt)
    loss_before = tr.train_step(*batch)["loss"]

    tr2 = CrossEncoderTrainer(cfg, params, dtype=jnp.float32)
    tr2.restore(ckpt)
    assert tr2.step == 1
    loss_after = tr2.train_step(*batch)["loss"]
    assert loss_after == pytest.approx(loss_before, rel=1e-5)


def test_iterate_batches_batch_order_only():
    from review_recommender_tpu.train.data import iterate_batches

    # 8 pairs, batch 4, block mode: items 0-3 and 4-7 must stay together
    pairs = [(f"q {i}", f"d {i}") for i in range(8)]
    tok = HashTokenizer(vocab_size=512)
    ids = {}
    for i, (q, d) in enumerate(pairs):
        ids[tuple(tok.token_ids(q))] = i
    seen_blocks = set()
    for b in iterate_batches(pairs, tok, 4, max_len=8, seed=3, epochs=4,
                             batch_order_only=True):
        q_ids = b[0]
        members = frozenset(
            ids[tuple(x for x in row if x not in (tok.cls_id, tok.sep_id,
                                                  tok.pad_id))]
            for row in q_ids.tolist()
        )
        seen_blocks.add(members)
    assert seen_blocks == {frozenset(range(4)), frozenset(range(4, 8))}


def test_lr_schedule():
    from review_recommender_tpu.train.contrastive import TrainConfig, make_lr

    lr = make_lr(TrainConfig(learning_rate=1e-3, total_steps=100,
                             warmup_steps=10))
    assert float(lr(0)) == 0.0
    assert float(lr(10)) == pytest.approx(1e-3)
    assert float(lr(100)) == pytest.approx(5e-5, rel=1e-3)
    assert make_lr(TrainConfig(learning_rate=1e-3)) == 1e-3


def test_mine_triples():
    from review_recommender_tpu.train.data import mine_triples

    pairs = [("q one", "doc one"), ("q two", "doc two")]
    corpus = [f"doc {i}" for i in range(20)] + ["doc one", "doc two"]
    triples = mine_triples(pairs, corpus, n_negatives=3, seed=0)
    assert len(triples) == 2 * (1 + 3)
    # one positive per pair, negatives never equal the positive
    for q, pos in pairs:
        rows = [t for t in triples if t[0] == q]
        assert [t[2] for t in rows].count(1.0) == 1
        assert all(t[1] != pos for t in rows if t[2] == 0.0)
    # deterministic in seed
    assert triples == mine_triples(pairs, corpus, n_negatives=3, seed=0)
    assert triples != mine_triples(pairs, corpus, n_negatives=3, seed=1)


def test_mine_triples_hard_negatives():
    from review_recommender_tpu.train.data import mine_triples

    corpus = [f"doc {i}" for i in range(10)]

    def hard(query, k):
        # engine-style candidate pool: positive first (must be skipped)
        return ["doc one"] + [f"hard {query} {i}" for i in range(k)]

    triples = mine_triples([("q one", "doc one")], corpus, n_negatives=2,
                           hard_negative_fn=hard, seed=0)
    negs = [t[1] for t in triples if t[2] == 0.0]
    assert negs == ["hard q one 0", "hard q one 1"]


def test_warm_start_from_biencoder():
    from review_recommender_tpu.models.bert import init_crossencoder
    from review_recommender_tpu.train.cross_encoder import (
        warm_start_from_biencoder,
    )

    cfg_bi = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64, max_position=16)
    cfg_xe = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64, max_position=24)
    _, bi_params = init_biencoder(cfg_bi, seed=0, dtype=jnp.float32)
    _, xe_params = init_crossencoder(cfg_xe, seed=1, dtype=jnp.float32)
    before_pooler = np.asarray(
        jax.tree.leaves(xe_params["pooler"])[0]
    ).copy()
    before_pos = np.asarray(
        xe_params["encoder"]["position_embeddings"]["embedding"]
    ).copy()

    out = warm_start_from_biencoder(xe_params, bi_params)
    # trunk matches the bi-encoder exactly where shapes agree
    np.testing.assert_array_equal(
        out["encoder"]["word_embeddings"]["embedding"],
        np.asarray(bi_params["encoder"]["word_embeddings"]["embedding"]),
    )
    # position rows beyond the bi-encoder's max_position keep their init
    pos = np.asarray(out["encoder"]["position_embeddings"]["embedding"])
    np.testing.assert_array_equal(
        pos[:16],
        np.asarray(bi_params["encoder"]["position_embeddings"]["embedding"]),
    )
    np.testing.assert_array_equal(pos[16:], before_pos[16:])
    # head untouched, and the input tree not mutated in place
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(out["pooler"])[0]), before_pooler
    )
    np.testing.assert_array_equal(
        np.asarray(xe_params["encoder"]["position_embeddings"]["embedding"]),
        before_pos,
    )


def test_crossencoder_training_loop(xe_setup, tmp_path):
    from review_recommender_tpu.train.cross_encoder import (
        CrossEncoderTrainer,
        CrossTrainConfig,
        train_crossencoder,
    )
    from review_recommender_tpu.train.data import mine_triples

    cfg, params, _ = xe_setup
    tok = HashTokenizer(vocab_size=512)
    pairs = [(q, d) for q, d in PAIRS]
    corpus = [d for _, d in PAIRS] + ["unrelated filler text about gardens"]
    triples = mine_triples(pairs, corpus, n_negatives=2, seed=0)
    tr = CrossEncoderTrainer(cfg, params, dtype=jnp.float32,
                             train_cfg=CrossTrainConfig(learning_rate=1e-3))
    hist = train_crossencoder(tr, triples, tok, batch_size=4, epochs=2,
                              max_len=32,
                              checkpoint_path=tmp_path / "xe.msgpack")
    assert len(hist) == 2 * (len(triples) // 4)
    assert np.isfinite(hist[-1]["loss"])
    assert (tmp_path / "xe.msgpack").exists()


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
