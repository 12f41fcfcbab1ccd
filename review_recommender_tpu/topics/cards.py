"""Resume-safe topic-card generation.

The archive's flagship script (nlp/_archive/08_generate_topic_cards_*.py)
generates a headline/summary card per topic via a local LLM with append-only
JSONL + periodic parquet rebuild + ETA meta-cache. This module keeps those
operational behaviors — crash-safe JSONL append, resume by topic id, pace
stats — with a pluggable generator: pass any callable
`generate(topic) -> {"headline", "summary"}` (an LLM client), or use the
default extractive generator (top quotes + TF-IDF terms) which needs no
model at all.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd


def extractive_card(topic: dict) -> Dict[str, str]:
    """Model-free card: headline from the label, summary from the most
    central quotes."""
    quotes = topic.get("quotes", [])[:2]
    summary = " … ".join(q.strip()[:160] for q in quotes) if quotes else ""
    return {
        "headline": str(topic.get("label", f"topic {topic.get('topic_id')}")),
        "summary": summary,
    }


def pick_quotes(
    texts: Sequence[str],
    embeddings: np.ndarray,
    center: np.ndarray,
    n_quotes: int = 3,
    max_chars: int = 300,
) -> List[str]:
    """Most-central, deduplicated quotes for one topic (07_aspect_ollama
    quote-picking semantics: centrality + prefix dedup)."""
    if len(texts) == 0:
        return []
    e = np.asarray(embeddings, np.float32)
    e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    c = np.asarray(center, np.float32)
    c = c / max(np.linalg.norm(c), 1e-12)
    order = np.argsort(-(e @ c), kind="stable")
    out, seen = [], set()
    for i in order:
        t = str(texts[i]).strip()[:max_chars]
        key = t[:60].lower()
        if key in seen or not t:
            continue
        seen.add(key)
        out.append(t)
        if len(out) >= n_quotes:
            break
    return out


def generate_topic_cards(
    topics: Sequence[dict],  # each: topic_id, label, quotes, n_reviews...
    out_jsonl: str | Path,
    generator: Optional[Callable[[dict], Dict[str, str]]] = None,
    flush_every: int = 8,
    parquet_out: Optional[str | Path] = None,
) -> pd.DataFrame:
    """Generate cards resume-safely: topics already present in the JSONL are
    skipped; each new card is appended immediately; the parquet view is
    rebuilt at the end (and every `flush_every` cards)."""
    generator = generator or extractive_card
    out_path = Path(out_jsonl)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    done: Dict[int, dict] = {}
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            if line.strip():
                row = json.loads(line)
                done[int(row["topic_id"])] = row

    def rebuild() -> pd.DataFrame:
        df = pd.DataFrame(sorted(done.values(), key=lambda r: r["topic_id"]))
        if parquet_out is not None and len(df):
            df.to_parquet(parquet_out, index=False)
        return df

    t0 = time.perf_counter()
    n_new = 0
    with open(out_path, "a") as f:
        for topic in topics:
            tid = int(topic["topic_id"])
            if tid in done:
                continue
            card = generator(dict(topic))
            row = {
                "topic_id": tid,
                "label": topic.get("label", ""),
                "n_reviews": int(topic.get("n_reviews", 0)),
                "headline": card.get("headline", ""),
                "summary": card.get("summary", ""),
            }
            f.write(json.dumps(row) + "\n")
            f.flush()
            done[tid] = row
            n_new += 1
            if n_new % flush_every == 0:
                rebuild()

    df = rebuild()
    if n_new:
        pace = (time.perf_counter() - t0) / n_new
        df.attrs["pace_s_per_card"] = round(pace, 4)
    return df


def benchmark_generator(
    topics: Sequence[dict],
    generator: Optional[Callable[[dict], Dict[str, str]]] = None,
    *,
    configs: Optional[Dict[str, dict]] = None,
    n_topics: int = 8,
    total_topics: Optional[int] = None,
) -> Dict[str, dict]:
    """Standalone card-generation throughput benchmark — the archive's
    LLM-throughput tool (nlp/_archive/test.py:15-35) as a library function:
    times `generator` over sample topics for each knob config WITHOUT
    writing any output, and projects an ETA for the full topic set.

    configs: {name: {"n_quotes": int, "max_chars": int}} knob variants
    (the archive swept quotes/ctx/num_predict); each is applied by
    truncating the topic's quote list before generation. Returns
    {config: {s_per_card, cards_per_s, eta_s_for_total, n_sampled}}.
    """
    generator = generator or extractive_card
    configs = configs or {"default": {}}
    sample = list(topics)[: max(1, n_topics)]
    if not sample:  # empty topic set: an empty report, not a divide-by-zero
        return {name: {"s_per_card": 0.0, "cards_per_s": 0.0,
                       "eta_s_for_total": 0.0, "n_sampled": 0}
                for name in configs}
    total = total_topics if total_topics is not None else len(topics)
    report: Dict[str, dict] = {}
    for name, knobs in configs.items():
        nq = int(knobs.get("n_quotes", 0))
        mc = int(knobs.get("max_chars", 0))
        t0 = time.perf_counter()
        for topic in sample:
            t = dict(topic)
            if nq:
                t["quotes"] = list(t.get("quotes", []))[:nq]
            if mc:
                t["quotes"] = [q[:mc] for q in t.get("quotes", [])]
            generator(t)
        dt = time.perf_counter() - t0
        pace = dt / len(sample)
        report[name] = {
            "s_per_card": round(pace, 4),
            "cards_per_s": round(1.0 / pace, 2) if pace > 0 else float("inf"),
            "eta_s_for_total": round(pace * total, 1),
            "n_sampled": len(sample),
        }
    return report
