"""Torch/HF checkpoint -> JAX params conversion for the BERT family.

The reference loads its two models through sentence-transformers
(app/app_product_search.py:53-86); this build runs them as JAX forwards
(models/bert.py) and only needs torch once, offline, to convert a checkpoint.
Accepts either a live `transformers` module or a raw state-dict mapping
(str -> array-like), so conversion also works from a safetensors file loaded
without torch.

Name mapping (HF BertModel -> models/bert.py):

  embeddings.word_embeddings.weight        encoder/word_embeddings/embedding
  embeddings.position_embeddings.weight    encoder/position_embeddings/embedding
  embeddings.token_type_embeddings.weight  encoder/token_type_embeddings/embedding
  embeddings.LayerNorm.{weight,bias}       encoder/embeddings_layer_norm/{scale,bias}
  encoder.layer.I.attention.self.{query,key,value}.{weight,bias}
                                           encoder/layer_I/attention/{query,key,value}/{kernel^T,bias}
  encoder.layer.I.attention.output.dense   encoder/layer_I/attention/output_dense
  encoder.layer.I.attention.output.LayerNorm
                                           encoder/layer_I/attention_layer_norm
  encoder.layer.I.intermediate.dense       encoder/layer_I/intermediate
  encoder.layer.I.output.dense             encoder/layer_I/output
  encoder.layer.I.output.LayerNorm         encoder/layer_I/output_layer_norm
  pooler.dense.{weight,bias}               pooler/{kernel^T,bias}         (cross-encoder)
  classifier.{weight,bias}                 classifier/{kernel^T,bias}     (cross-encoder)

Torch nn.Linear stores (out, in); flax Dense kernels are (in, out) — all
linear weights are transposed.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from review_recommender_tpu.models.bert import BertConfig


def _np(t) -> np.ndarray:
    """Tensor-like -> float32 numpy (torch tensors expose .detach)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _strip_prefix(sd: Mapping[str, object]) -> Dict[str, object]:
    """Drop a leading 'bert.' (BertForSequenceClassification) prefix."""
    out = {}
    for k, v in sd.items():
        out[k[5:] if k.startswith("bert.") else k] = v
    return out


def _layer_params(sd: Mapping[str, object], i: int) -> dict:
    p = f"encoder.layer.{i}."
    dense = lambda name: {
        "kernel": _np(sd[p + name + ".weight"]).T,
        "bias": _np(sd[p + name + ".bias"]),
    }
    ln = lambda name: {
        "scale": _np(sd[p + name + ".weight"]),
        "bias": _np(sd[p + name + ".bias"]),
    }
    return {
        "attention": {
            "query": dense("attention.self.query"),
            "key": dense("attention.self.key"),
            "value": dense("attention.self.value"),
            "output_dense": dense("attention.output.dense"),
        },
        "attention_layer_norm": ln("attention.output.LayerNorm"),
        "intermediate": dense("intermediate.dense"),
        "output": dense("output.dense"),
        "output_layer_norm": ln("output.LayerNorm"),
    }


def convert_bert_encoder(sd: Mapping[str, object], cfg: BertConfig) -> dict:
    """HF BertModel state dict -> params for models/bert.py:BertEncoder."""
    sd = _strip_prefix(sd)
    enc = {
        "word_embeddings": {"embedding": _np(sd["embeddings.word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": _np(sd["embeddings.position_embeddings.weight"])
        },
        "token_type_embeddings": {
            "embedding": _np(sd["embeddings.token_type_embeddings.weight"])
        },
        "embeddings_layer_norm": {
            "scale": _np(sd["embeddings.LayerNorm.weight"]),
            "bias": _np(sd["embeddings.LayerNorm.bias"]),
        },
    }
    for i in range(cfg.num_layers):
        enc[f"layer_{i}"] = _layer_params(sd, i)
    return enc


def convert_biencoder(sd: Mapping[str, object], cfg: BertConfig) -> dict:
    """HF BertModel state dict -> BiEncoderModel params."""
    return {"encoder": convert_bert_encoder(sd, cfg)}


def convert_crossencoder(sd: Mapping[str, object], cfg: BertConfig) -> dict:
    """HF BertForSequenceClassification state dict -> CrossEncoderModel params."""
    stripped = _strip_prefix(sd)
    params = {"encoder": convert_bert_encoder(sd, cfg)}
    params["pooler"] = {
        "kernel": _np(stripped["pooler.dense.weight"]).T,
        "bias": _np(stripped["pooler.dense.bias"]),
    }
    params["classifier"] = {
        "kernel": _np(stripped["classifier.weight"]).T,
        "bias": _np(stripped["classifier.bias"]),
    }
    return params


def config_from_hf(hf_config) -> BertConfig:
    """transformers BertConfig -> models/bert.py:BertConfig."""
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_act=hf_config.hidden_act,
        pad_token_id=hf_config.pad_token_id,
    )
