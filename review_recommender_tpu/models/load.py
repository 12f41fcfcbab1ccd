"""Checkpoint loading: HF-format model directories -> serving-ready towers.

The production path for users migrating from the reference (which downloads
BAAI/bge-small-en-v1.5 and cross-encoder/ms-marco-MiniLM-L-6-v2 through
sentence-transformers at runtime, app/app_product_search.py:53-86): download
those repos once, point this loader at the local directories, and the
forwards run as JAX programs with no torch at serving time (torch is only
imported here if the checkpoint is a .bin pickle; safetensors files load
without it).

Directory layout expected (a standard HF snapshot):
  config.json                      BertConfig fields
  model.safetensors | pytorch_model.bin
  vocab.txt                        WordPiece vocabulary

Second supported layout — the NATIVE tower format written by
save_native_tower (and `rrt train`): what the in-repo trainers
(train/contrastive.py, train/cross_encoder.py) produce, loadable by the
same EMB_MODEL_DIR / RERANK_MODEL_DIR knobs so a trained tower drops into
serving with zero extra plumbing:
  config.json      {"format": "rrt-native-v1", "kind": ..., tokenizer spec,
                    BertConfig fields}
  params.msgpack   flax-serialized model params
  vocab.txt        only for wordpiece tokenizers
load_biencoder / load_crossencoder sniff the format marker and dispatch.
"""
from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Dict

import numpy as np

from review_recommender_tpu.models.bert import BertConfig
from review_recommender_tpu.models.convert import (
    convert_biencoder,
    convert_crossencoder,
)
from review_recommender_tpu.models.encoder import BiEncoder, CrossEncoder
from review_recommender_tpu.models.tokenizer import WordPieceTokenizer

logger = logging.getLogger(__name__)


def _config_from_json(path: Path) -> BertConfig:
    cfg = json.loads(path.read_text())
    return BertConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        max_position=cfg.get("max_position_embeddings", 512),
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        hidden_act=cfg.get("hidden_act", "gelu"),
        pad_token_id=cfg.get("pad_token_id", 0),
    )


def _load_state_dict(model_dir: Path) -> Dict[str, np.ndarray]:
    st = model_dir / "model.safetensors"
    if st.exists():
        try:
            from safetensors.numpy import load_file

            return load_file(st)
        except ImportError:
            logger.info("safetensors not installed; trying torch loader")
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch  # offline conversion only

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    if st.exists():
        import torch
        from safetensors.torch import load_file as torch_load

        return {k: v.numpy() for k, v in torch_load(st).items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin in {model_dir}"
    )


def _tokenizer(model_dir: Path) -> WordPieceTokenizer:
    vocab = model_dir / "vocab.txt"
    if not vocab.exists():
        raise FileNotFoundError(f"no vocab.txt in {model_dir}")
    return WordPieceTokenizer.from_vocab_file(vocab)


def load_biencoder(model_dir: str | Path, pooling: str = "cls",
                   **kw) -> BiEncoder:
    """HF BertModel snapshot dir OR native tower dir -> serving BiEncoder
    (bge-small layout)."""
    model_dir = Path(model_dir)
    if _is_native(model_dir):
        return load_native_biencoder(model_dir, **kw)
    cfg = _config_from_json(model_dir / "config.json")
    params = convert_biencoder(_load_state_dict(model_dir), cfg)
    logger.info("loaded bi-encoder from %s (%dL, H=%d)", model_dir,
                cfg.num_layers, cfg.hidden_size)
    return BiEncoder(cfg, params, _tokenizer(model_dir), pooling=pooling, **kw)


def load_crossencoder(model_dir: str | Path, **kw) -> CrossEncoder:
    """HF BertForSequenceClassification snapshot dir OR native tower dir ->
    CrossEncoder."""
    model_dir = Path(model_dir)
    if _is_native(model_dir):
        return load_native_crossencoder(model_dir, **kw)
    cfg = _config_from_json(model_dir / "config.json")
    params = convert_crossencoder(_load_state_dict(model_dir), cfg)
    logger.info("loaded cross-encoder from %s (%dL)", model_dir, cfg.num_layers)
    return CrossEncoder(cfg, params, _tokenizer(model_dir), **kw)


# --------------------------------------------------------------- native format
NATIVE_FORMAT = "rrt-native-v1"


def _is_native(model_dir: Path) -> bool:
    cfg_path = model_dir / "config.json"
    if not cfg_path.exists():
        return False
    try:
        return json.loads(cfg_path.read_text()).get("format") == NATIVE_FORMAT
    except (json.JSONDecodeError, OSError):
        return False


def _tokenizer_spec(tokenizer) -> dict:
    from review_recommender_tpu.models.tokenizer import HashTokenizer

    if isinstance(tokenizer, HashTokenizer):
        return {"type": "hash", "vocab_size": tokenizer.vocab_size,
                "lowercase": tokenizer.lowercase}
    if isinstance(tokenizer, WordPieceTokenizer):
        return {"type": "wordpiece", "lowercase": tokenizer.lowercase}
    raise TypeError(f"unsupported tokenizer: {type(tokenizer).__name__}")


def _tokenizer_from_spec(spec: dict, model_dir: Path):
    from review_recommender_tpu.models.tokenizer import HashTokenizer

    if spec["type"] == "hash":
        return HashTokenizer(vocab_size=int(spec["vocab_size"]),
                             lowercase=bool(spec.get("lowercase", True)))
    if spec["type"] == "wordpiece":
        return WordPieceTokenizer.from_vocab_file(
            model_dir / "vocab.txt", lowercase=bool(spec.get("lowercase", True))
        )
    raise ValueError(f"unknown tokenizer type: {spec['type']}")


def save_native_tower(out_dir: str | Path, kind: str, cfg: BertConfig,
                      params, tokenizer, pooling: str = "cls") -> Path:
    """Write a trained tower (params from ContrastiveTrainer /
    CrossEncoderTrainer) as a serving-loadable model directory.

    kind: "biencoder" | "crossencoder". Atomic enough for single-writer use
    (params file written to .tmp then renamed)."""
    import flax

    assert kind in ("biencoder", "crossencoder"), kind
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    spec = _tokenizer_spec(tokenizer)
    if spec["type"] == "wordpiece":
        by_id = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
        assert [i for _, i in by_id] == list(range(len(by_id))), \
            "wordpiece vocab ids must be dense 0..V-1"
        (out_dir / "vocab.txt").write_text(
            "\n".join(t for t, _ in by_id) + "\n", encoding="utf-8"
        )
    meta = {"format": NATIVE_FORMAT, "kind": kind, "pooling": pooling,
            "tokenizer": spec, **dataclasses.asdict(cfg)}
    (out_dir / "config.json").write_text(json.dumps(meta, indent=2))
    blob = flax.serialization.to_bytes(jax_to_host(params))
    tmp = out_dir / "params.msgpack.tmp"
    tmp.write_bytes(blob)
    tmp.replace(out_dir / "params.msgpack")
    logger.info("saved native %s tower to %s", kind, out_dir)
    return out_dir


def jax_to_host(params):
    """Device param pytree -> host numpy (msgpack-serializable)."""
    import jax

    return jax.tree.map(np.asarray, params)


def _load_native(model_dir: Path, expect_kind: str):
    import flax

    meta = json.loads((model_dir / "config.json").read_text())
    if meta.get("kind") != expect_kind:
        raise ValueError(
            f"{model_dir} holds a {meta.get('kind')!r} tower, "
            f"expected {expect_kind!r}"
        )
    field_names = {f.name for f in dataclasses.fields(BertConfig)}
    cfg = BertConfig(**{k: v for k, v in meta.items() if k in field_names})
    # template from init, then overwrite with the serialized values
    from review_recommender_tpu.models.bert import (
        init_biencoder,
        init_crossencoder,
    )

    init = init_biencoder if expect_kind == "biencoder" else init_crossencoder
    _, template = init(cfg, seed=0)
    params = flax.serialization.from_bytes(
        template, (model_dir / "params.msgpack").read_bytes()
    )
    tokenizer = _tokenizer_from_spec(meta["tokenizer"], model_dir)
    return cfg, params, tokenizer, meta


def load_native_biencoder(model_dir: str | Path, **kw) -> BiEncoder:
    """Native tower dir (save_native_tower / `rrt train`) -> BiEncoder."""
    model_dir = Path(model_dir)
    cfg, params, tokenizer, meta = _load_native(model_dir, "biencoder")
    kw.setdefault("pooling", meta.get("pooling", "cls"))
    logger.info("loaded native bi-encoder from %s (%dL, H=%d)", model_dir,
                cfg.num_layers, cfg.hidden_size)
    return BiEncoder(cfg, params, tokenizer, **kw)


def load_native_crossencoder(model_dir: str | Path, **kw) -> CrossEncoder:
    """Native tower dir -> CrossEncoder."""
    model_dir = Path(model_dir)
    cfg, params, tokenizer, _meta = _load_native(model_dir, "crossencoder")
    logger.info("loaded native cross-encoder from %s (%dL)", model_dir,
                cfg.num_layers)
    return CrossEncoder(cfg, params, tokenizer, **kw)
