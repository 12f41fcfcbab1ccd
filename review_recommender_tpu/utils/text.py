"""Text utilities: tokenization, attribute vocabularies, gate groups.

These run on host (strings never touch the device — the device engine sees
integer term ids and precomputed presence structures built at index time).

Behavioral parity targets in the reference:
  - query tokenizer        /root/reference/utils.py:57-60
  - document tokenizer     /root/reference/nlp/12_product_prep.py:75-78
    ("simple_en_v1": regex token split, 44-word stoplist, len>1, 5000 cap)
  - SYNONYMS / COLORS      /root/reference/utils.py:15-38
  - build_gate_groups      /root/reference/utils.py:62-86
  - calculate_gate_factor  /root/reference/utils.py:88-101

A C++ fast path for document tokenization is provided by
review_recommender_tpu.native (ctypes); this module transparently uses it
when the shared library has been built.
"""
from __future__ import annotations

import re
from typing import Dict, List, Set

# Token pattern: ascii alnum runs with an optional apostrophe-joined tail.
TOKEN_RE = re.compile(r"[a-z0-9]+(?:'[a-z0-9]+)?")

# Query-side stoplist (utils.py:12).
STOP_WORDS = {
    "a", "an", "the", "and", "or", "of", "for", "to", "in", "on", "with",
    "is", "are", "it", "this", "that",
}

# Document-side stoplist for the "simple_en_v1" index tokenizer
# (nlp/12_product_prep.py:43-49 — a larger, minimal-english list).
DOC_STOP_WORDS = {
    "a", "an", "and", "the", "is", "are", "am", "be", "been", "to", "for",
    "of", "in", "on", "at", "by",
    "it", "its", "this", "that", "with", "from", "as", "or", "if", "but",
    "than", "then", "so",
    "i", "you", "he", "she", "we", "they", "my", "your", "our", "their",
    "me", "him", "her", "us", "them",
    "was", "were", "will", "would", "should", "could", "may", "might",
    "can", "cannot", "cant", "won't",
}

DOC_TOKEN_CAP = 5000  # safety cap (nlp/12_product_prep.py:78)

# Attribute vocabularies (utils.py:15-38). Sets preserve the exact membership.
SYNONYMS: Dict[str, Set[str]] = {
    "sock": {"sock", "socks"},
    "headphone": {"headphone", "headphones", "earphone", "earphones",
                  "earbud", "earbuds", "headset"},
    "keyboard": {"keyboard", "keyboards"},
    "wireless": {"wireless", "bluetooth"},
    "noise": {"noise cancelling", "noise-canceling", "noise canceling", "anc"},
    "cat": {"cat", "cats", "kitten", "kittens", "kitty"},
    "dog": {"dog", "dogs", "puppy", "puppies"},
    "design": {"design", "pattern", "print", "graphic", "artwork", "motif",
               "theme"},
}

COLORS: Dict[str, Set[str]] = {
    "yellow": {"yellow", "mustard", "lemon", "gold", "golden"},
    "red": {"red", "scarlet", "crimson", "maroon"},
    "blue": {"blue", "navy", "cobalt", "azure"},
    "green": {"green", "emerald", "olive"},
    "black": {"black"},
    "white": {"white", "ivory"},
    "pink": {"pink", "rose"},
    "purple": {"purple", "violet", "lavender"},
    "orange": {"orange", "amber"},
    "brown": {"brown", "tan", "beige", "khaki"},
    "gray": {"gray", "grey", "charcoal", "slate"},
}

# Flat, ordered phrase vocabulary used for the per-document gate bitsets built
# at index time (ops/fusion + index/build). Order is load-bearing: bit i of a
# doc's gate bitmask corresponds to GATE_PHRASES[i].
GATE_PHRASES: List[str] = sorted(
    {p for group in list(SYNONYMS.values()) + list(COLORS.values()) for p in group}
)
GATE_PHRASE_ID: Dict[str, int] = {p: i for i, p in enumerate(GATE_PHRASES)}


def tokenize_query(query: str) -> List[str]:
    """Tokenize a query string, removing query stop words (utils.py:57-60)."""
    tokens = TOKEN_RE.findall(query.lower())
    return [t for t in tokens if t not in STOP_WORDS]


def _tokenize_document_py(text: str, cap: int = DOC_TOKEN_CAP) -> List[str]:
    toks = [
        t
        for t in TOKEN_RE.findall(text.lower())
        if t not in DOC_STOP_WORDS and len(t) > 1
    ]
    return toks[:cap]


def tokenize_document(text: str, cap: int = DOC_TOKEN_CAP) -> List[str]:
    """Index-side "simple_en_v1" tokenizer (nlp/12_product_prep.py:75-78).

    Uses the native C++ tokenizer when built; falls back to pure Python.
    """
    native = _native_tokenizer()
    if native is not None:
        return native(text, cap)
    return _tokenize_document_py(text, cap)


_NATIVE_TOKENIZER = None
_NATIVE_CHECKED = False


def _native_tokenizer():
    global _NATIVE_TOKENIZER, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from review_recommender_tpu.native import (
                native_available,
                tokenize_document_native,
            )

            # the import succeeds even without the .so — check the lib loads
            _NATIVE_TOKENIZER = (
                tokenize_document_native if native_available() else None
            )
        except Exception:
            _NATIVE_TOKENIZER = None
    return _NATIVE_TOKENIZER


def build_gate_groups(query: str) -> List[Set[str]]:
    """Build gating groups from a query (utils.py:62-86).

    Colors mentioned anywhere in the query (substring test against each color
    synonym), then synonym groups for known tokens, then singleton groups for
    tokens of length >= 4; deduplicated, capped at 6 groups.
    """
    query_lower = query.lower()
    groups: List[Set[str]] = []

    for _color, color_synonyms in COLORS.items():
        if any(word in query_lower for word in color_synonyms):
            groups.append(color_synonyms)

    for token in tokenize_query(query):
        if token in SYNONYMS:
            groups.append(SYNONYMS[token])
        elif len(token) >= 4:
            groups.append({token})

    unique_groups: List[Set[str]] = []
    for group in groups:
        if group not in unique_groups:
            unique_groups.append(group)
    return unique_groups[:6]


def calculate_gate_factor(
    text: str, groups: List[Set[str]], penalty: float = 0.5
) -> tuple[float, int, int]:
    """Exact host gate factor: penalty^(#groups with no substring hit).

    Parity with utils.py:88-101 — raw substring membership against the text.
    """
    text_lower = text.lower()
    hits = 0
    factor = 1.0
    for group in groups:
        if any(syn in text_lower for syn in group):
            hits += 1
        else:
            factor *= penalty
    return factor, hits, len(groups)
