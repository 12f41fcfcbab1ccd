"""Multi-seed robustness of the trained-lane quality table.

The canonical table (`evals_out/`, seed 0) shows Hybrid+Rerank leading
Hybrid on every metric — but single-seed margins can be luck (the MRR
margin at seed 0 is 0.0003). This tool aggregates N independent
`examples/quality_table.py --lane trained --seed S` runs (fresh corpus,
fresh towers, fresh judged queries per seed) and reports per-seed and
mean Hybrid vs Hybrid+Rerank so the rerank-wins claim rests on more than
one draw. Reference analog: the reference publishes one table from one
fixed query set (/root/reference/README.md:309, evals/run_benchmark.py);
seed-level replication is this rebuild's addition.

Usage:
  python examples/quality_table.py --lane trained --seed 1 --out evals_out/seed1
  python examples/quality_table.py --lane trained --seed 2 --out evals_out/seed2
  python examples/seed_robustness.py evals_out evals_out/seed1 evals_out/seed2 \
      --out evals_out/seed_robustness.md
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

METRICS = ("ndcg@10", "mrr", "recall@20")
METHODS = ("Hybrid", "Hybrid + Rerank")


def load_tables(dirs):
    rows = []
    for d in dirs:
        path = Path(d) / "benchmark_results.json"
        res = json.loads(path.read_text())
        rows.append({m: res[m]["aggregate"] for m in METHODS})
    return rows


def load_query_deltas(dirs):
    """Per-(seed, query) metric deltas (H+R minus H) from the per-query
    detailed_results.csv each seed dir carries.

    Seeds use fresh corpora/towers/queries, so every (seed, query) pair is
    an independent draw of the same experiment — pooling them is the honest
    unit for the paired tests below.
    """
    import csv

    deltas = {m: [] for m in METRICS}
    for d in dirs:
        path = Path(d) / "detailed_results.csv"
        if not path.exists():
            continue
        per = {}  # query_id -> {method: row}
        with path.open() as fh:
            for row in csv.DictReader(fh):
                per.setdefault(row["query_id"], {})[row["method"]] = row
        for qid, methods in sorted(per.items()):
            if not all(meth in methods for meth in METHODS):
                continue
            for m in METRICS:
                h = float(methods["Hybrid"][m])
                hr = float(methods["Hybrid + Rerank"][m])
                deltas[m].append(hr - h)
    return deltas


def sign_test_p(wins: int, losses: int) -> float:
    """Two-sided exact binomial sign test p-value (ties excluded)."""
    from math import comb

    n = wins + losses
    if n == 0:
        return 1.0
    k = min(wins, losses)
    tail = sum(comb(n, i) for i in range(k + 1)) / 2.0**n
    return min(1.0, 2.0 * tail)


def bootstrap_ci(values, iters: int = 10_000, seed: int = 0,
                 alpha: float = 0.05):
    """Percentile bootstrap CI for the mean of paired deltas."""
    import numpy as np

    x = np.asarray(values, dtype=np.float64)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(x), size=(iters, len(x)))
    means = x[idx].mean(axis=1)
    lo, hi = np.quantile(means, [alpha / 2, 1 - alpha / 2])
    return float(x.mean()), float(lo), float(hi)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+",
                    help="quality-table output dirs, one per seed "
                         "(each holding benchmark_results.json)")
    ap.add_argument("--out", default="",
                    help="write the markdown report here too")
    args = ap.parse_args(argv)

    rows = load_tables(args.dirs)
    lines = ["# Trained-lane rerank win, across seeds", ""]
    lines.append("Per-seed Hybrid vs Hybrid+Rerank (fresh corpus + towers "
                 "+ judged queries per seed; "
                 "`examples/quality_table.py --lane trained --seed S`):")
    lines.append("")
    hdr = "| seed dir | " + " | ".join(
        f"{m} H / H+R" for m in METRICS) + " | rerank wins |"
    lines.append(hdr)
    lines.append("|" + "---|" * (len(METRICS) + 2))
    wins = {m: 0 for m in METRICS}
    ties = {m: 0 for m in METRICS}
    sums = {(meth, m): 0.0 for meth in METHODS for m in METRICS}
    for d, r in zip(args.dirs, rows):
        cells, won = [], []
        for m in METRICS:
            h, hr = r["Hybrid"][m], r["Hybrid + Rerank"][m]
            sums[("Hybrid", m)] += h
            sums[("Hybrid + Rerank", m)] += hr
            cells.append(f"{h:.4f} / {hr:.4f}")
            if hr > h + 1e-9:
                wins[m] += 1
                won.append(m)
            elif abs(hr - h) <= 1e-9:
                ties[m] += 1
        lines.append(f"| {d} | " + " | ".join(cells)
                     + f" | {', '.join(won) or '—'} |")
    n = len(rows)
    mean_cells = []
    for m in METRICS:
        h = sums[("Hybrid", m)] / n
        hr = sums[("Hybrid + Rerank", m)] / n
        mean_cells.append(f"**{h:.4f} / {hr:.4f}**")
    lines.append("| **mean** | " + " | ".join(mean_cells) + " | |")
    lines.append("")
    for m in METRICS:
        lines.append(f"- {m}: rerank leads in {wins[m]}/{n} seeds"
                     + (f" (ties {ties[m]})" if ties[m] else ""))

    # paired per-query statistics, pooled across seeds
    deltas = load_query_deltas(args.dirs)
    if any(deltas[m] for m in METRICS):
        lines.append("")
        lines.append("## Paired per-query statistics (pooled across seeds)")
        lines.append("")
        lines.append("Unit = one judged query on one seed's fresh corpus "
                     "(delta = Hybrid+Rerank minus Hybrid). Exact two-sided "
                     "sign test over non-tied queries; 95% percentile "
                     "bootstrap CI (10k resamples) on the mean delta.")
        lines.append("")
        lines.append("| metric | n | mean Δ | 95% CI | wins/losses/ties "
                     "| sign-test p |")
        lines.append("|---|---|---|---|---|---|")
        for m in METRICS:
            d = deltas[m]
            if not d:
                continue
            w = sum(1 for v in d if v > 1e-12)
            l = sum(1 for v in d if v < -1e-12)
            t = len(d) - w - l
            mean, lo, hi = bootstrap_ci(d)
            p = sign_test_p(w, l)
            lines.append(
                f"| {m} | {len(d)} | {mean:+.4f} | [{lo:+.4f}, {hi:+.4f}] "
                f"| {w}/{l}/{t} | {p:.4g} |")
    report = "\n".join(lines) + "\n"
    print(report)
    if args.out:
        Path(args.out).write_text(report)
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
