"""Topic naming and aspect analytics over clustered reviews.

Covers the reference's archived analysis scripts with deterministic,
dependency-free equivalents:
  - TF-IDF topic naming (nlp/_archive/06_name_topics.py:18-56): per-cluster
    mean TF-IDF, top-8 terms, label = top-3 joined.
  - LLM topic naming hook: the reference has three LLM variants
    (Ollama/Groq/OpenAI); here any callable `labeler(topic_terms) -> str`
    plugs in, with retry + JSON cache resume (the archive scripts' key
    behaviors) — no vendored LLM clients in a zero-egress build.
  - Aspect mapping + metrics (nlp/_archive/07_aspect_metrics.py:12-40):
    rule-based label -> aspect, per-aspect n_reviews / avg_stars /
    lost_rating impact proxy.
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from review_recommender_tpu.utils.text import tokenize_document

logger = logging.getLogger(__name__)


def tfidf_topic_terms(
    texts: Sequence[str],
    topic_ids: Sequence[int],
    top_terms: int = 8,
    min_df: int = 2,
) -> Dict[int, List[str]]:
    """Per-cluster mean TF-IDF top terms (vectorized over a shared vocab)."""
    token_lists = [tokenize_document(t) for t in texts]
    vocab: Dict[str, int] = {}
    rows, cols, vals = [], [], []
    for i, toks in enumerate(token_lists):
        freqs: Dict[str, int] = {}
        for t in toks:
            freqs[t] = freqs.get(t, 0) + 1
        for term, c in freqs.items():
            j = vocab.setdefault(term, len(vocab))
            rows.append(i)
            cols.append(j)
            vals.append(c)
    n, v = len(texts), len(vocab)
    if v == 0:
        return {int(t): [] for t in set(topic_ids)}
    tfm = np.zeros((n, v), np.float32)
    tfm[rows, cols] = vals
    df = (tfm > 0).sum(axis=0)
    keep = df >= min_df
    idf = np.log((1 + n) / (1 + df)) + 1.0
    tfidf = tfm * idf[None, :] * keep[None, :]

    inv = {j: t for t, j in vocab.items()}
    out: Dict[int, List[str]] = {}
    tids = np.asarray(topic_ids)
    for t in np.unique(tids):
        mean = tfidf[tids == t].mean(axis=0)
        top = np.argsort(-mean, kind="stable")[:top_terms]
        out[int(t)] = [inv[j] for j in top if mean[j] > 0]
    return out


def name_topics(topic_terms: Dict[int, List[str]]) -> Dict[int, str]:
    """label = top-3 TF-IDF terms joined (06_name_topics.py behavior)."""
    return {t: " ".join(terms[:3]) if terms else f"topic {t}"
            for t, terms in topic_terms.items()}


def name_topics_llm(
    topic_terms: Dict[int, List[str]],
    labeler: Callable[[List[str]], str],
    cache_path: Optional[str | Path] = None,
    retries: int = 3,
) -> Dict[int, str]:
    """LLM naming with JSON-cache resume + retry (archive 06_* semantics).
    `labeler` is any callable terms -> label (an LLM client, typically)."""
    cache: Dict[str, str] = {}
    if cache_path and Path(cache_path).exists():
        cache = json.loads(Path(cache_path).read_text())
    out: Dict[int, str] = {}
    for t, terms in sorted(topic_terms.items()):
        key = str(t)
        if key in cache:
            out[t] = cache[key]
            continue
        label = None
        for attempt in range(retries):
            try:
                label = str(labeler(terms)).strip()
                break
            except Exception as e:  # retry with backoff semantics
                logger.warning("labeler failed for topic %d (try %d): %s",
                               t, attempt + 1, e)
        out[t] = label or " ".join(terms[:3])
        cache[key] = out[t]
        if cache_path:
            Path(cache_path).write_text(json.dumps(cache, indent=0))
    return out


# Rule-based aspect taxonomy (the 8-aspect scheme of 07_aspect_metrics).
ASPECT_RULES: Dict[str, List[str]] = {
    "quality": ["quality", "durable", "sturdy", "cheap", "broke", "broken",
                "defect", "flimsy"],
    "comfort": ["comfort", "comfortable", "soft", "fit", "fits", "cozy"],
    "sound": ["sound", "audio", "bass", "noise", "volume"],
    "battery": ["battery", "charge", "charging", "power"],
    "shipping": ["shipping", "delivery", "arrived", "package", "packaging"],
    "price": ["price", "value", "worth", "expensive", "cost"],
    "appearance": ["color", "design", "look", "looks", "style", "pattern"],
    "usability": ["easy", "setup", "install", "instructions", "use"],
}


def map_label_to_aspect(label: str) -> str:
    low = str(label).lower()
    for aspect, words in ASPECT_RULES.items():
        if any(w in low for w in words):
            return aspect
    return "other"


def classify_aspects_llm(
    topics: Dict[int, dict],  # topic_id -> {"label", "quotes": [...]}
    voter: Callable[[dict], str],
    votes: int = 3,
    cache_path: Optional[str | Path] = None,
    taxonomy: Optional[Sequence[str]] = None,
) -> Dict[int, str]:
    """LLM aspect classification by majority vote (archive
    07_aspect_ollama.py:22-70 semantics: N votes per topic over the 8-aspect
    taxonomy, JSON-cache resume). `voter(topic) -> aspect` is any callable —
    an LLM client in production; out-of-taxonomy answers fall back to the
    rule-based mapping of the topic label."""
    taxonomy = list(taxonomy or list(ASPECT_RULES) + ["other"])
    cache: Dict[str, str] = {}
    if cache_path and Path(cache_path).exists():
        cache = json.loads(Path(cache_path).read_text())
    out: Dict[int, str] = {}
    for t, topic in sorted(topics.items()):
        key = str(t)
        if key in cache:
            out[t] = cache[key]
            continue
        tally: Dict[str, int] = {}
        for _ in range(votes):
            try:
                a = str(voter(dict(topic))).strip().lower()
            except Exception as e:
                logger.warning("aspect voter failed for topic %d: %s", t, e)
                continue
            if a in taxonomy:
                tally[a] = tally.get(a, 0) + 1
        if tally:
            out[t] = max(tally.items(), key=lambda kv: kv[1])[0]
        else:
            out[t] = map_label_to_aspect(topic.get("label", ""))
        cache[key] = out[t]
        if cache_path:
            Path(cache_path).write_text(json.dumps(cache, indent=0))
    return out


def aspect_metrics(
    topic_ids: Sequence[int],
    stars: Sequence[float],
    labels: Dict[int, str],
    aspects: Optional[Dict[int, str]] = None,
) -> List[dict]:
    """Per-aspect review counts, mean stars and 'lost_rating' impact proxy
    (reviews x (5 - avg_stars)), sorted by impact. `aspects` optionally
    overrides the rule-based label->aspect mapping per topic (e.g. LLM
    classifications from topics.llm_clients)."""
    tids = np.asarray(topic_ids)
    st = np.asarray(stars, np.float64)
    by_aspect: Dict[str, list] = {}
    for t, label in labels.items():
        mask = tids == t
        if not mask.any():
            continue
        aspect = (aspects or {}).get(t) or map_label_to_aspect(label)
        by_aspect.setdefault(aspect, []).append(mask)
    out = []
    for aspect, masks in by_aspect.items():
        m = np.logical_or.reduce(masks)
        s = st[m]
        s = s[~np.isnan(s)]
        avg = float(s.mean()) if len(s) else float("nan")
        n = int(m.sum())
        out.append({
            "aspect": aspect,
            "n_reviews": n,
            "avg_stars": round(avg, 3) if s.size else None,
            "lost_rating": round(n * (5.0 - avg), 1) if s.size else 0.0,
        })
    return sorted(out, key=lambda r: -(r["lost_rating"] or 0))
