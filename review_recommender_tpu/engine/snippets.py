"""Host-side snippet recovery shared by the single-chip and mesh engines.

The device computes only best-snippet SCORES (segment-max over review
embeddings — ops/segment.py); the snippet TEXT shown to users is recovered
on host from a CSR over the review table (reference semantics:
app/app_product_search.py:320-370). Both engines need the same two
recoveries, so they share this mixin:

  _snippet_texts    best review text/stars per candidate product (device
                    full-scan mode — argmax over each product's reviews)
  _exact_snippets   EXACT reference truncation semantics for eval-parity
                    runs: candidate review rows in original file order,
                    truncated at `cap`, host-scored (app:320-346)

Host state: `_rev_order` (review rows stable-sorted by product) and
`_rev_offsets` (CSR offsets per product), built once at engine init.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


class HostSnippetsMixin:
    """Requires: self.products, self.reviews, self.n_docs."""

    def _build_rev_csr(self) -> None:
        """Build the host CSR over reviews (no-op without a review index)."""
        self._rev_order = None
        self._rev_offsets = None
        if self.reviews is not None:
            m = self.reviews.n_reviews_total
            seg = np.asarray(self.reviews.rev_product[:m])
            order = np.argsort(seg, kind="stable")
            counts = np.bincount(seg, minlength=self.n_docs + 1)
            self._rev_order = order
            self._rev_offsets = np.concatenate([[0], np.cumsum(counts)])

    def _snippet_texts(self, qvec, cand_rows) -> Dict[str, dict]:
        """Recover the best snippet text/stars for candidate products
        (host argmax over each product's reviews, CSR-indexed)."""
        out: Dict[str, dict] = {}
        if self._rev_order is None:
            return out
        m = self.reviews.n_reviews_total
        E = self.reviews.rev_emb[:m]
        q = np.asarray(qvec, dtype=np.float32).reshape(-1)
        for row in cand_rows:
            row = int(row)
            lo, hi = self._rev_offsets[row], self._rev_offsets[row + 1]
            if hi <= lo:
                continue
            ridx = self._rev_order[lo:hi]
            sims = E[ridx] @ q
            j = int(np.argmax(sims))
            out[self.products.skus[row]] = {
                "score": float(sims[j]),
                "text": self.reviews.rev_texts[int(ridx[j])][:600],
                "stars": float(self.reviews.rev_stars[int(ridx[j])]),
            }
        return out

    def _exact_snippets(self, qvec, cand_rows, cap: int):
        """EXACT reference snippet semantics (app/app_product_search.py:
        320-361): candidate products' review rows in original file order,
        truncated at `cap` rows, cosine-scored on host, per-product argmax.
        Returns ({product_row: best_score}, {sku: snippet dict})."""
        m = self.reviews.n_reviews_total
        seg = np.asarray(self.reviews.rev_product[:m])
        parts = [
            self._rev_order[self._rev_offsets[int(r)]:
                            self._rev_offsets[int(r) + 1]]
            for r in cand_rows
        ]
        if not parts:
            return {}, {}
        rows = np.concatenate(parts)
        # _rev_order is a stable sort by product, so each slice is ascending;
        # a global sort restores original FILE order across products — the
        # order the reference truncates in (app:334-336)
        rows = np.sort(rows)[: int(cap)]
        if rows.size == 0:
            return {}, {}
        q = np.asarray(qvec, dtype=np.float32).reshape(-1)
        sims = (self.reviews.rev_emb[rows] @ q).astype(np.float32)
        prods = seg[rows]
        # per-product argmax; ties keep the first row in file order
        # (pandas idxmax semantics, app:354-361)
        o = np.lexsort((-sims, prods))
        firsts = np.ones(len(o), dtype=bool)
        firsts[1:] = prods[o[1:]] != prods[o[:-1]]
        scores: Dict[int, float] = {}
        snips: Dict[str, dict] = {}
        for w in o[firsts]:
            prow = int(prods[w])
            ridx = int(rows[w])
            scores[prow] = float(sims[w])
            snips[self.products.skus[prow]] = {
                "score": float(sims[w]),
                "text": self.reviews.rev_texts[ridx][:600],
                "stars": float(self.reviews.rev_stars[ridx]),
            }
        return scores, snips
