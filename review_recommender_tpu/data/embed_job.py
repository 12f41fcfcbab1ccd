"""Sharded batch embedding job with checkpoint/resume.

The reference's offline encoder job (/root/reference/nlp/
11_build_product_embeddings.py:46-169) streams 20k-row shards through torch
on CPU with append-mode parquet resume. This is the TPU-native equivalent:
the BiEncoder's bucketed jitted forward keeps the MXU busy with batch-256
bf16 matmuls, and each completed shard is flushed to its own .npy so a
killed job resumes at the first missing shard (idempotent, crash-safe).

For multi-chip offline builds, construct the encoder with a mesh
(`BiEncoder(..., mesh=Mesh(jax.devices(), ("dp",)))`): its jitted forward
shards the batch axis across the chips — pure data parallelism, the right
strategy for an embarrassingly parallel encode (SURVEY.md §2c).
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

SHARD_ROWS = 20_000


def _shard_path(out_dir: Path, i: int) -> Path:
    return out_dir / f"emb_shard_{i:05d}.npy"


def run_embed_job(
    texts: Sequence[str],
    encoder,  # models.encoder.BiEncoder (or any .encode(texts)->np.ndarray)
    out_dir: str | Path,
    *,
    shard_rows: int = SHARD_ROWS,
    batch_size: int = 256,
    resume: bool = True,
    char_cap: int = 4000,
) -> np.ndarray:
    """Encode texts shard-by-shard; returns the (N, D) matrix.

    Layout in out_dir: emb_shard_XXXXX.npy per shard + job.json manifest.
    Resume skips shards whose file already exists with the right row count.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = len(texts)
    n_shards = -(-n // shard_rows) if n else 0

    manifest_path = out / "job.json"
    manifest = {"n_rows": n, "shard_rows": shard_rows, "n_shards": n_shards}
    if manifest_path.exists() and resume:
        old = json.loads(manifest_path.read_text())
        if old.get("n_rows") != n or old.get("shard_rows") != shard_rows:
            logger.warning("job manifest mismatch (%s vs %s) — restarting",
                           old, manifest)
            resume = False
    manifest_path.write_text(json.dumps(manifest))

    parts: List[np.ndarray] = []
    for si in range(n_shards):
        lo, hi = si * shard_rows, min((si + 1) * shard_rows, n)
        path = _shard_path(out, si)
        if resume and path.exists():
            arr = np.load(path)
            if arr.shape[0] == hi - lo:
                logger.info("shard %d/%d: resume hit (%d rows)",
                            si + 1, n_shards, arr.shape[0])
                parts.append(arr)
                continue
        chunk = [str(t)[:char_cap] for t in texts[lo:hi]]
        arr = encoder.encode(chunk, batch_size=batch_size)
        tmp = path.with_suffix(".tmp.npy")
        np.save(tmp, arr)
        tmp.replace(path)  # atomic flush: resume never sees a torn shard
        logger.info("shard %d/%d: encoded %d rows", si + 1, n_shards, len(chunk))
        parts.append(arr)

    if not parts:
        return np.zeros((0, getattr(encoder, "cfg", None).hidden_size
                         if getattr(encoder, "cfg", None) else 0), np.float32)
    return np.concatenate(parts, axis=0)


def job_status(out_dir: str | Path) -> dict:
    """Resume status: which shards exist."""
    out = Path(out_dir)
    if not (out / "job.json").exists():
        return {"started": False}
    manifest = json.loads((out / "job.json").read_text())
    done = sorted(
        int(p.stem.split("_")[-1]) for p in out.glob("emb_shard_*.npy")
    )
    return {
        "started": True,
        "n_shards": manifest["n_shards"],
        "done_shards": len(done),
        "complete": len(done) == manifest["n_shards"],
    }
