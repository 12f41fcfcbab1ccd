"""Checkpoint/resume for the training loops (VERDICT r2 item 8).

Contract: kill a run mid-way, restore the checkpoint, continue — the
resumed run must see the EXACT batch stream of the uninterrupted run (loss
curve continues), and the final params must match the uninterrupted run's.
"""
import numpy as np
import pytest

from review_recommender_tpu.models.bert import (
    BertConfig,
    init_biencoder,
    init_crossencoder,
)
from review_recommender_tpu.models.tokenizer import HashTokenizer


def _cfg():
    return BertConfig(vocab_size=256, hidden_size=32, num_layers=1,
                      num_heads=2, intermediate_size=64, max_position=64)


def _tree_allclose(a, b):
    import jax

    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(0)
    words = [f"word{i}" for i in range(60)]
    return [" ".join(rng.choice(words, size=12)) for _ in range(40)]


class TestMLMResume:
    def test_resume_continues_exact_stream(self, texts, tmp_path):
        from review_recommender_tpu.train.mlm import (
            MLMTrainConfig,
            MLMTrainer,
            init_mlm,
            pretrain_mlm,
        )

        tok = HashTokenizer(vocab_size=256)
        kw = dict(batch_size=4, max_len=24, seed=3, log_every=0)

        # uninterrupted run: 8 steps
        _, p1 = init_mlm(_cfg(), seed=1)
        t_full = MLMTrainer(_cfg(), p1, train_cfg=MLMTrainConfig(seed=3))
        h_full = pretrain_mlm(t_full, texts, tok, steps=8, **kw)

        # "killed" run: 4 steps, checkpointed every 2
        _, p2 = init_mlm(_cfg(), seed=1)
        t_half = MLMTrainer(_cfg(), p2, train_cfg=MLMTrainConfig(seed=3))
        ckpt = tmp_path / "mlm.ckpt"
        h_half = pretrain_mlm(t_half, texts, tok, steps=4,
                              checkpoint_path=str(ckpt),
                              checkpoint_every=2, **kw)
        assert ckpt.exists() and t_half.step == 4

        # resume into a FRESH trainer and finish
        _, p3 = init_mlm(_cfg(), seed=99)  # different init — restore wins
        t_res = MLMTrainer(_cfg(), p3, train_cfg=MLMTrainConfig(seed=3))
        t_res.restore(ckpt)
        assert t_res.step == 4
        h_res = pretrain_mlm(t_res, texts, tok, steps=8, **kw)

        # the loss curve CONTINUES: steps 5..8 equal the uninterrupted run
        assert [m["step"] for m in h_res] == [5, 6, 7, 8]
        np.testing.assert_allclose(
            [m["loss"] for m in h_res],
            [m["loss"] for m in h_full[4:]], rtol=1e-5,
        )
        _tree_allclose(t_res.params, t_full.params)

    def test_finished_run_is_noop(self, texts, tmp_path):
        from review_recommender_tpu.train.mlm import (
            MLMTrainConfig,
            MLMTrainer,
            init_mlm,
            pretrain_mlm,
        )

        tok = HashTokenizer(vocab_size=256)
        _, p = init_mlm(_cfg(), seed=1)
        tr = MLMTrainer(_cfg(), p, train_cfg=MLMTrainConfig(seed=3))
        pretrain_mlm(tr, texts, tok, steps=3, batch_size=4, max_len=24,
                     seed=3, log_every=0)
        h = pretrain_mlm(tr, texts, tok, steps=3, batch_size=4, max_len=24,
                         seed=3, log_every=0)
        assert h == [] and tr.step == 3


class TestBiencoderResume:
    def test_resume_matches_uninterrupted(self, texts, tmp_path):
        from review_recommender_tpu.train.contrastive import (
            ContrastiveTrainer,
            TrainConfig,
        )
        from review_recommender_tpu.train.data import train_biencoder

        tok = HashTokenizer(vocab_size=256)
        pairs = [(t.split()[0], t) for t in texts]
        kw = dict(batch_size=4, epochs=2, max_len=24, seed=5, log_every=0)

        _, p1 = init_biencoder(_cfg(), seed=1)
        t_full = ContrastiveTrainer(_cfg(), p1,
                                    train_cfg=TrainConfig(seed=5))
        h_full = train_biencoder(t_full, pairs, tok, **kw)
        n_total = len(h_full)
        assert n_total >= 4

        # first epoch only, then resume for the full 2-epoch budget
        _, p2 = init_biencoder(_cfg(), seed=1)
        t_half = ContrastiveTrainer(_cfg(), p2,
                                    train_cfg=TrainConfig(seed=5))
        ckpt = tmp_path / "bi.ckpt"
        train_biencoder(t_half, pairs, tok, checkpoint_path=str(ckpt),
                        **{**kw, "epochs": 1})
        _, p3 = init_biencoder(_cfg(), seed=77)
        t_res = ContrastiveTrainer(_cfg(), p3, train_cfg=TrainConfig(seed=5))
        t_res.restore(ckpt)
        h_res = train_biencoder(t_res, pairs, tok, **kw)
        assert 0 < len(h_res) < n_total
        assert [m["step"] for m in h_res] == \
            [m["step"] for m in h_full[len(h_full) - len(h_res):]]
        np.testing.assert_allclose(
            [m["loss"] for m in h_res],
            [m["loss"] for m in h_full[len(h_full) - len(h_res):]],
            rtol=1e-5,
        )
        _tree_allclose(t_res.params, t_full.params)


class TestCrossEncoderResume:
    def test_resume_matches_uninterrupted(self, texts, tmp_path):
        from review_recommender_tpu.train.cross_encoder import (
            CrossEncoderTrainer,
            CrossTrainConfig,
            train_crossencoder,
        )

        tok = HashTokenizer(vocab_size=256)
        triples = [(t.split()[0], t, float(i % 2))
                   for i, t in enumerate(texts)]
        kw = dict(batch_size=4, epochs=2, max_len=32, seed=5, log_every=0)

        _, p1 = init_crossencoder(_cfg(), seed=1)
        t_full = CrossEncoderTrainer(_cfg(), p1,
                                     train_cfg=CrossTrainConfig(seed=5))
        h_full = train_crossencoder(t_full, triples, tok, **kw)

        _, p2 = init_crossencoder(_cfg(), seed=1)
        t_half = CrossEncoderTrainer(_cfg(), p2,
                                     train_cfg=CrossTrainConfig(seed=5))
        ckpt = tmp_path / "xe.ckpt"
        train_crossencoder(t_half, triples, tok, checkpoint_path=str(ckpt),
                           **{**kw, "epochs": 1})
        _, p3 = init_crossencoder(_cfg(), seed=42)
        t_res = CrossEncoderTrainer(_cfg(), p3,
                                    train_cfg=CrossTrainConfig(seed=5))
        t_res.restore(ckpt)
        h_res = train_crossencoder(t_res, triples, tok, **kw)
        np.testing.assert_allclose(
            [m["loss"] for m in h_res],
            [m["loss"] for m in h_full[len(h_full) - len(h_res):]],
            rtol=1e-5,
        )
        _tree_allclose(t_res.params, t_full.params)
