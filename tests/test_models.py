"""Model-layer tests: JAX BERT vs torch/transformers parity on random weights,
WordPiece tokenizer parity vs transformers.BertTokenizer, and the bucketed
serving wrappers.

The reference has no golden-output model tests at all (SURVEY.md §4); these
go further: the JAX forward is checked numerically against the HF torch
implementation with identical (randomly initialized) weights, which validates
the conversion map AND the architecture in one shot.
"""
import numpy as np
import pytest

from review_recommender_tpu.models.bert import BertConfig
from review_recommender_tpu.models.tokenizer import (
    HashTokenizer,
    WordPieceTokenizer,
    encode_batch,
    pad_bucket,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = dict(
    vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=48, type_vocab_size=2,
)


def _tiny_cfgs():
    hf_cfg = transformers.BertConfig(**TINY)
    from review_recommender_tpu.models.convert import config_from_hf

    return hf_cfg, config_from_hf(hf_cfg)


def _rand_inputs(rng, batch=3, seq=16, vocab=99):
    ids = rng.integers(5, vocab, size=(batch, seq)).astype(np.int64)
    mask = np.ones((batch, seq), dtype=np.int64)
    mask[1, seq // 2 :] = 0  # one padded row
    tt = np.zeros((batch, seq), dtype=np.int64)
    tt[2, seq // 2 :] = 1  # one pair-style row
    return ids, mask, tt


class TestTorchParity:
    def test_biencoder_matches_hf_bert(self):
        import jax.numpy as jnp

        from review_recommender_tpu.models.bert import BiEncoderModel
        from review_recommender_tpu.models.convert import convert_biencoder

        hf_cfg, cfg = _tiny_cfgs()
        torch.manual_seed(0)
        hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()

        rng = np.random.default_rng(0)
        ids, mask, tt = _rand_inputs(rng, vocab=hf_cfg.vocab_size)
        with torch.no_grad():
            out = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                token_type_ids=torch.tensor(tt),
            ).last_hidden_state.numpy()
        cls = out[:, 0, :]
        want = cls / np.maximum(np.linalg.norm(cls, axis=1, keepdims=True), 1e-12)

        params = convert_biencoder(hf.state_dict(), cfg)
        model = BiEncoderModel(cfg, dtype=jnp.float32)
        got = np.asarray(
            model.apply(
                {"params": params}, ids.astype(np.int32),
                mask.astype(np.int32), tt.astype(np.int32),
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_crossencoder_matches_hf_sequence_classifier(self):
        import jax.numpy as jnp

        from review_recommender_tpu.models.bert import CrossEncoderModel
        from review_recommender_tpu.models.convert import convert_crossencoder

        hf_cfg, cfg = _tiny_cfgs()
        hf_cfg.num_labels = 1
        torch.manual_seed(1)
        hf = transformers.BertForSequenceClassification(hf_cfg).eval()

        rng = np.random.default_rng(1)
        ids, mask, tt = _rand_inputs(rng, vocab=hf_cfg.vocab_size)
        with torch.no_grad():
            want = hf(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
                token_type_ids=torch.tensor(tt),
            ).logits.numpy()[:, 0]

        params = convert_crossencoder(hf.state_dict(), cfg)
        model = CrossEncoderModel(cfg, dtype=jnp.float32)
        got = np.asarray(
            model.apply(
                {"params": params}, ids.astype(np.int32),
                mask.astype(np.int32), tt.astype(np.int32),
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed over "
    "lazy dog head ##phone wireless blue ##tooth noise cancel ##ling great "
    "sound quality 99 ! ? , . ' s"
).split()


class TestWordPieceParity:
    @pytest.fixture
    def vocab_file(self, tmp_path):
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(VOCAB) + "\n")
        return str(p)

    @pytest.mark.parametrize(
        "text",
        [
            "The quick brown fox jumps over the lazy dog!",
            "wireless bluetooth headphones, noise cancelling??",
            "GREAT sound-quality... 99s unknownword",
            "jump jumped jumps 's",
            "",
        ],
    )
    def test_matches_transformers(self, vocab_file, text):
        ours = WordPieceTokenizer.from_vocab_file(vocab_file)
        hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
        assert ours.tokenize(text) == hf.tokenize(text)

    def test_pair_encoding_matches_transformers(self, vocab_file):
        ours = WordPieceTokenizer.from_vocab_file(vocab_file)
        hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
        q, d = "wireless headphones", "great sound quality, noise cancelling"
        enc = hf(q, d, return_tensors="np")
        ids, mask, tt = encode_batch(ours, [q], pairs=[d])
        np.testing.assert_array_equal(ids[0], enc["input_ids"][0])
        np.testing.assert_array_equal(tt[0], enc["token_type_ids"][0])
        np.testing.assert_array_equal(mask[0], enc["attention_mask"][0])

    def test_pair_truncation_longest_first(self, vocab_file):
        ours = WordPieceTokenizer.from_vocab_file(vocab_file)
        hf = transformers.BertTokenizer(vocab_file, do_lower_case=True)
        q = "the quick brown fox " * 5
        d = "great sound quality noise cancelling " * 8
        enc = hf(q, d, truncation="longest_first", max_length=32, return_tensors="np")
        ids, _, tt = encode_batch(ours, [q], pairs=[d], max_len=32)
        np.testing.assert_array_equal(ids[0], enc["input_ids"][0])
        np.testing.assert_array_equal(tt[0], enc["token_type_ids"][0])


class TestHashTokenizer:
    def test_deterministic_and_in_range(self):
        tok = HashTokenizer(vocab_size=1000)
        a = tok.token_ids("wireless headphones with Noise Cancelling")
        b = tok.token_ids("wireless headphones with noise cancelling")
        assert a == b  # lowercased
        assert all(5 <= i < 1000 for i in a)

    def test_encode_batch_shapes(self):
        tok = HashTokenizer(vocab_size=1000)
        ids, mask, tt = encode_batch(tok, ["a b c", "a"], pad_to=8)
        assert ids.shape == (2, 8)
        assert mask[0].sum() == 5 and mask[1].sum() == 3  # CLS + toks + SEP
        assert tt.sum() == 0


class TestServingWrappers:
    def test_biencoder_encode_normalized(self):
        from review_recommender_tpu.models.encoder import BiEncoder

        be = BiEncoder.random_init(BertConfig.tiny(), seed=0)
        embs = be.encode(["wireless headphones", "yellow socks", "x"])
        assert embs.shape == (3, 64)
        np.testing.assert_allclose(
            np.linalg.norm(embs, axis=1), np.ones(3), atol=1e-5
        )
        # single-query hook agrees with batch encode (bf16 activations:
        # different batch buckets may fuse differently — tolerance reflects it)
        one = be("wireless headphones")
        np.testing.assert_allclose(one, embs[0], atol=5e-3)

    def test_crossencoder_hook(self):
        from review_recommender_tpu.models.encoder import CrossEncoder

        ce = CrossEncoder.random_init(BertConfig.tiny(), seed=0)
        scores = ce("query text", ["doc one", "doc two", "doc three"])
        assert scores.shape == (3,)
        assert np.isfinite(scores).all()
        # deterministic across calls (cached jit)
        np.testing.assert_allclose(
            scores, ce("query text", ["doc one", "doc two", "doc three"])
        )

    def test_pad_bucket(self):
        assert pad_bucket(1) == 16
        assert pad_bucket(17) == 32
        assert pad_bucket(512) == 512
        assert pad_bucket(9999) == 512

    def test_length_sorted_bucketing_preserves_order(self):
        """Mixed short/long inputs: results come back in ARRIVAL order and
        match a homogeneous (single-bucket) encode of the same items."""
        import jax.numpy as jnp

        from review_recommender_tpu.models.encoder import BiEncoder, CrossEncoder

        be = BiEncoder.random_init(BertConfig.tiny(), seed=0,
                                   dtype=jnp.float32)
        long = "wireless noise cancelling headphones " * 20
        texts = [long, "x", "yellow socks", long + " extra", "b c d"]
        # batch_size=2 forces multiple chunks; sorting reorders items
        got = be.encode(texts, batch_size=2)
        for i, t in enumerate(texts):
            np.testing.assert_allclose(
                got[i], be.encode([t])[0], atol=1e-5,
                err_msg=f"row {i} misaligned after bucketed encode",
            )

        ce = CrossEncoder.random_init(BertConfig.tiny(), seed=1,
                                      dtype=jnp.float32, batch_size=2)
        docs = [long, "tiny", "medium sized doc here", long + " more", "q"]
        scores = ce.score_pairs(["q"] * 5, docs)
        for i, d in enumerate(docs):
            np.testing.assert_allclose(
                scores[i], ce.score_pairs(["q"], [d])[0], atol=1e-5,
                err_msg=f"pair {i} misaligned after bucketed scoring",
            )

    def test_bucketed_chunks_shapes(self):
        from review_recommender_tpu.models.encoder import _bucketed_chunks

        seqs = [([1] * n, [0] * n) for n in (30, 3, 17, 30, 5)]
        chunks = list(_bucketed_chunks(seqs, 2))
        # sorted by length: indices 1(3), 4(5), 2(17), 0(30), 3(30)
        assert [sel for sel, _ in chunks] == [[1, 4], [2, 0], [3]]
        # every item appears exactly once
        flat = [i for sel, _ in chunks for i in sel]
        assert sorted(flat) == list(range(5))
