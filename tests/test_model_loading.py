"""Checkpoint loading tests: save random HF models to disk, load through
models/load.py, and check the JAX tower reproduces the torch forward."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from review_recommender_tpu.models.load import load_biencoder, load_crossencoder  # noqa: E402

TINY = dict(
    vocab_size=40, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
)
VOCAB = ("[PAD] [UNK] [CLS] [SEP] [MASK] wireless head ##phones great sound "
         "the quick brown fox , . !").split()


def _write_vocab(d):
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")


@pytest.fixture
def biencoder_dir(tmp_path):
    cfg = transformers.BertConfig(**TINY)
    torch.manual_seed(3)
    model = transformers.BertModel(cfg, add_pooling_layer=False).eval()
    d = tmp_path / "bge"
    model.save_pretrained(d, safe_serialization=False)
    _write_vocab(d)
    return d, model


@pytest.fixture
def crossencoder_dir(tmp_path):
    cfg = transformers.BertConfig(**TINY, num_labels=1)
    torch.manual_seed(4)
    model = transformers.BertForSequenceClassification(cfg).eval()
    d = tmp_path / "ce"
    model.save_pretrained(d, safe_serialization=False)
    _write_vocab(d)
    return d, model


def test_biencoder_roundtrip(biencoder_dir):
    import jax.numpy as jnp

    d, hf = biencoder_dir
    be = load_biencoder(d, dtype=jnp.float32)
    texts = ["wireless headphones great sound", "the quick brown fox"]
    got = be.encode(texts)
    assert got.shape == (2, 32)

    # reference: torch CLS + L2 norm through the same tokenizer
    tok = transformers.BertTokenizer(str(d / "vocab.txt"))
    enc = tok(texts, return_tensors="pt", padding=True)
    with torch.no_grad():
        cls = hf(**enc).last_hidden_state[:, 0, :].numpy()
    want = cls / np.linalg.norm(cls, axis=1, keepdims=True)
    # bucketed padding widths may differ from torch's exact-length padding;
    # padded lanes are masked so results agree
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_crossencoder_roundtrip(crossencoder_dir):
    import jax.numpy as jnp

    d, hf = crossencoder_dir
    ce = load_crossencoder(d, dtype=jnp.float32)
    q = "wireless headphones"
    docs = ["great sound", "the quick brown fox !"]
    got = ce(q, docs)

    tok = transformers.BertTokenizer(str(d / "vocab.txt"))
    enc = tok([q, q], docs, return_tensors="pt", padding=True)
    with torch.no_grad():
        want = hf(**enc).logits.numpy()[:, 0]
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_missing_files_raise(tmp_path):
    (tmp_path / "config.json").write_text("{}")
    with pytest.raises((FileNotFoundError, KeyError)):
        load_biencoder(tmp_path)
