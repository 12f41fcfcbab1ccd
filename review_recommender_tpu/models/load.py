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
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Dict, Tuple

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
    """HF BertModel snapshot dir -> serving BiEncoder (bge-small layout)."""
    model_dir = Path(model_dir)
    cfg = _config_from_json(model_dir / "config.json")
    params = convert_biencoder(_load_state_dict(model_dir), cfg)
    logger.info("loaded bi-encoder from %s (%dL, H=%d)", model_dir,
                cfg.num_layers, cfg.hidden_size)
    return BiEncoder(cfg, params, _tokenizer(model_dir), pooling=pooling, **kw)


def load_crossencoder(model_dir: str | Path, **kw) -> CrossEncoder:
    """HF BertForSequenceClassification snapshot dir -> CrossEncoder."""
    model_dir = Path(model_dir)
    cfg = _config_from_json(model_dir / "config.json")
    params = convert_crossencoder(_load_state_dict(model_dir), cfg)
    logger.info("loaded cross-encoder from %s (%dL)", model_dir, cfg.num_layers)
    return CrossEncoder(cfg, params, _tokenizer(model_dir), **kw)
