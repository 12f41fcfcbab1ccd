"""ctypes bindings for the native runtime components (librrt_native.so).

Build with `make -C review_recommender_tpu/native`. Everything here degrades
gracefully: if the shared library is missing, callers (utils/text.py) use the
pure-Python implementations with identical semantics.

Parity contract: the native tokenizer is byte-level ASCII; texts containing
non-ASCII are routed to the Python fallback by tokenize_document_native
because Unicode lowercasing can manufacture ASCII letters (e.g. U+212A
KELVIN SIGN lowers to 'k') that a byte scanner cannot see.
"""
from __future__ import annotations

import ctypes
import functools
import logging
from pathlib import Path
from typing import List, Optional

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).parent / "librrt_native.so"


def _stale_sources() -> List[str]:
    """Source files newer than the shared library (empty when fresh or the
    library is absent). A committed .so that predates its .cc silently
    downgrades both perf and test coverage — callers must rebuild or warn."""
    if not _LIB_PATH.exists():
        return []
    so_mtime = _LIB_PATH.stat().st_mtime
    return sorted(
        p.name for p in _LIB_PATH.parent.glob("*.cc")
        if p.stat().st_mtime > so_mtime
    )


def ensure_native_built(timeout_s: float = 180.0) -> bool:
    """Build (or rebuild) librrt_native.so from source when a compiler is
    available and the library is missing or older than any .cc. Returns
    native_available() afterwards. When the library is stale and no build
    is possible, logs a LOUD warning instead of silently serving old code.
    """
    import shutil
    import subprocess

    stale = _stale_sources()
    if _LIB_PATH.exists() and not stale:
        return native_available()
    if shutil.which("g++") is None and shutil.which("c++") is None:
        if stale:
            logger.warning(
                "librrt_native.so is OLDER than source files %s and no C++ "
                "compiler is available to rebuild — the native runtime may "
                "not match the checked-in sources", stale)
        return native_available()
    try:
        proc = subprocess.run(
            ["make", "-C", str(_LIB_PATH.parent)],
            capture_output=True, timeout=timeout_s, check=False, text=True,
        )
        if proc.returncode != 0:
            logger.warning("native build failed (rc=%d): %s",
                           proc.returncode, proc.stderr[-400:])
    except Exception as e:  # noqa: BLE001 — build is best-effort
        logger.warning("native build failed: %s", e)
    _lib.cache_clear()
    return native_available()

# native HTTP server callback signatures (server.cc): the batch callback
# receives a window of raw POST /search bodies; the fallback callback one
# (method, path, body) request. Both reply via rrt_server_reply DURING the
# call (the server copies bytes immediately).
RRT_BATCH_CB = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64,
)
RRT_FALLBACK_CB = ctypes.CFUNCTYPE(
    None, ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_char),
    ctypes.c_int64,
)


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists():
        return None
    stale = _stale_sources()
    if stale:
        logger.warning(
            "loading librrt_native.so that is OLDER than %s — run "
            "`make -C review_recommender_tpu/native` (or "
            "native.ensure_native_built()) to rebuild", stale)
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.rrt_tokenize.restype = ctypes.c_int64
    lib.rrt_tokenize.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.rrt_tokenize_batch.restype = ctypes.c_int64
    lib.rrt_tokenize_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    import numpy as _np
    from numpy.ctypeslib import ndpointer

    lib.rrt_substring_scan.restype = ctypes.c_int64
    lib.rrt_substring_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ndpointer(_np.int32, flags="C,W"), ctypes.c_int64,
    ]
    lib.rrt_build_postings.restype = ctypes.c_int64
    lib.rrt_build_postings.argtypes = [
        ctypes.c_char_p, ndpointer(_np.int64, flags="C"), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ndpointer(_np.int32, flags="C,W"), ndpointer(_np.float32, flags="C,W"),
        ndpointer(_np.float32, flags="C,W"), ndpointer(_np.int32, flags="C,W"),
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rrt_featurizer_create.restype = ctypes.c_void_p
    lib.rrt_featurizer_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ndpointer(_np.int32, flags="C"), ndpointer(_np.float32, flags="C"),
        ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,  # phrases
        ctypes.c_char_p, ctypes.c_int64,  # colors
        ctypes.c_char_p, ctypes.c_int64,  # synonyms
        ctypes.c_char_p, ctypes.c_int64,  # stopwords
        ctypes.c_int64, ctypes.c_int64,   # q_cap, t_cap
    ]
    lib.rrt_featurizer_destroy.restype = None
    lib.rrt_featurizer_destroy.argtypes = [ctypes.c_void_p]
    lib.rrt_featurizer_packed_len.restype = ctypes.c_int64
    lib.rrt_featurizer_packed_len.argtypes = [ctypes.c_void_p]
    lib.rrt_featurize.restype = ctypes.c_int64
    lib.rrt_featurize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ndpointer(_np.float32, flags="C,W"),
    ]
    lib.rrt_featurizer_expand.restype = ctypes.c_int64
    lib.rrt_featurizer_expand.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ndpointer(_np.int32, flags="C,W"), ctypes.c_int64,
    ]
    lib.rrt_featurize_batch.restype = ctypes.c_int64
    lib.rrt_featurize_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ndpointer(_np.int64, flags="C"),
        ctypes.c_int64, ndpointer(_np.float32, flags="C,W"),
    ]
    if hasattr(lib, "rrt_server_start"):  # server.cc (older .so lacks it)
        lib.rrt_server_start.restype = ctypes.c_int64
        lib.rrt_server_start.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_double,
            ctypes.c_int64, RRT_BATCH_CB, RRT_FALLBACK_CB,
        ]
        lib.rrt_server_reply.restype = None
        lib.rrt_server_reply.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.rrt_server_stop.restype = None
        lib.rrt_server_stop.argtypes = []
        lib.rrt_server_port.restype = ctypes.c_int32
        lib.rrt_server_port.argtypes = []
        lib.rrt_server_running.restype = ctypes.c_int32
        lib.rrt_server_running.argtypes = []
        lib.rrt_server_stats.restype = None
        lib.rrt_server_stats.argtypes = [ctypes.POINTER(ctypes.c_int64)]
    return lib


def native_server_available() -> bool:
    lib = _lib()
    return lib is not None and hasattr(lib, "rrt_server_start")


def native_available() -> bool:
    return _lib() is not None


def tokenize_document_native(text: str, cap: int = 5000) -> List[str]:
    """Native "simple_en_v1" tokenization; raises ImportError if the library
    is unavailable and falls back to Python for non-ASCII inputs."""
    lib = _lib()
    if lib is None:
        raise ImportError("librrt_native.so not built")
    if not text.isascii():
        from review_recommender_tpu.utils.text import _tokenize_document_py

        return _tokenize_document_py(text, cap)
    raw = text.encode("ascii")
    out_cap = len(raw) + 2  # tokens never exceed input length + separators
    out = ctypes.create_string_buffer(out_cap)
    n = lib.rrt_tokenize(raw, len(raw), out, out_cap, cap)
    if n < 0:  # pragma: no cover - buffer sized to make this impossible
        raise RuntimeError("native tokenizer buffer overflow")
    if n == 0:
        return []
    return out.value.decode("ascii").split("\n")[: int(n)]


def tokenize_corpus_native(texts: List[str], cap: int = 5000) -> List[List[str]]:
    """Batch tokenization: one FFI crossing for the whole corpus (ASCII docs),
    Python fallback per non-ASCII doc."""
    lib = _lib()
    if lib is None:
        raise ImportError("librrt_native.so not built")

    from review_recommender_tpu.utils.text import _tokenize_document_py

    ascii_idx, blobs = [], []
    results: List[Optional[List[str]]] = [None] * len(texts)
    for i, t in enumerate(texts):
        t = str(t)
        if t.isascii():
            ascii_idx.append(i)
            blobs.append(t.encode("ascii"))
        else:
            results[i] = _tokenize_document_py(t, cap)

    if ascii_idx:
        blob = b"".join(blobs)
        offsets = (ctypes.c_int64 * (len(blobs) + 1))()
        pos = 0
        for j, b in enumerate(blobs):
            offsets[j] = pos
            pos += len(b)
        offsets[len(blobs)] = pos
        out_cap = pos + 2 * len(blobs) + 16
        out = ctypes.create_string_buffer(out_cap)
        counts = (ctypes.c_int64 * len(blobs))()
        total = lib.rrt_tokenize_batch(
            blob, offsets, len(blobs), out, out_cap, cap, counts
        )
        if total < 0:  # pragma: no cover
            raise RuntimeError("native tokenizer buffer overflow")
        toks = out.value.decode("ascii").split("\n") if total else []
        p = 0
        for j, i in enumerate(ascii_idx):
            c = int(counts[j])
            results[i] = toks[p : p + c]
            p += c
    return results  # type: ignore[return-value]


def substring_scan_native(vocab_blob: bytes, token: str, max_hits: int = 4096):
    """int32 ids (1-based line index) of vocab terms containing `token` —
    the C fast path for the featurizer's dynamic-gate expansion."""
    import numpy as np

    lib = _lib()
    if lib is None:
        raise ImportError("librrt_native.so not built")
    needle = token.encode("utf-8", "replace")
    # Double the buffer until the hits fit: every vocab line can match (a
    # 1-char token on a large vocab), so the hard ceiling is the line count,
    # at which point the scan cannot return -1.
    cap = max_hits
    while True:
        out = np.zeros(cap, np.int32)
        n = lib.rrt_substring_scan(vocab_blob, len(vocab_blob), needle,
                                   len(needle), out, cap)
        if n >= 0:
            return out[: int(n)].copy()
        cap *= 2


def build_postings_native(texts, doc_terms_cap: int, cap: int = 5000):
    """Full postings build in one native pass: tokenize + global vocab +
    per-doc (term id, tf) CSR packing + doc frequencies.

    Returns (doc_terms (N, L) i32, doc_tf (N, L) f32, doc_len (N,) f32,
    df (V+1,) i32, vocab {term: id}, n_truncated).

    Non-ASCII documents are pre-tokenized in Python and re-joined with
    spaces — tokens themselves are always ASCII ([a-z0-9']), so the native
    re-scan reproduces them exactly and global vocab order is preserved.
    """
    import numpy as np

    lib = _lib()
    if lib is None:
        raise ImportError("librrt_native.so not built")
    from review_recommender_tpu.utils.text import _tokenize_document_py

    blobs = []
    for t in texts:
        t = str(t)
        if not t.isascii():
            t = " ".join(_tokenize_document_py(t, cap))
        blobs.append(t.encode("ascii"))

    n = len(blobs)
    blob = b"".join(blobs)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])

    L = int(doc_terms_cap)
    doc_terms = np.zeros((max(n, 1), L), np.int32)
    doc_tf = np.zeros((max(n, 1), L), np.float32)
    doc_len = np.zeros(max(n, 1), np.float32)
    vocab_cap = max(len(blob) // 2 + 16, 1024)
    df = np.zeros(vocab_cap + 1, np.int32)
    vocab_out = ctypes.create_string_buffer(len(blob) + 16)
    n_trunc = ctypes.c_int64(0)

    v = lib.rrt_build_postings(
        blob, offsets, n, cap, L, doc_terms, doc_tf, doc_len, df,
        vocab_out, len(blob) + 16, vocab_cap, ctypes.byref(n_trunc),
    )
    if v < 0:
        raise RuntimeError("native postings build overflow")
    v = int(v)
    terms = vocab_out.value.decode("ascii").split("\n")[:v] if v else []
    vocab = {t: i + 1 for i, t in enumerate(terms)}
    return (doc_terms[:n], doc_tf[:n], doc_len[:n], df[: v + 1].copy(),
            vocab, int(n_trunc.value))


class NativeQueryFeaturizer:
    """C++ query featurizer handle: one FFI crossing per query (or batch)
    replaces the whole Python host hot path — tokenize, vocab/idf lookup,
    gate-group construction, dynamic-token expansion, feature packing
    (engine/featurize.py semantics; reference utils.py:57-86).

    The attribute tables are serialized from utils/text.py at construction so
    Python remains the single source of truth. ASCII queries only — callers
    route non-ASCII to the Python fallback."""

    def __init__(self, vocab_blob: bytes, df, idf, query_terms_cap: int,
                 gate_terms_cap: int):
        import weakref

        import numpy as np

        from review_recommender_tpu.utils.text import (
            COLORS,
            GATE_PHRASES,
            STOP_WORDS,
            SYNONYMS,
        )

        lib = _lib()
        if lib is None:
            raise ImportError("librrt_native.so not built")
        self._lib = lib
        self._df = np.ascontiguousarray(df, dtype=np.int32)
        self._idf = np.ascontiguousarray(idf, dtype=np.float32)
        phrases = ("\n".join(GATE_PHRASES)).encode()
        colors = ("\n".join(
            "\t".join(sorted(m)) for m in COLORS.values())).encode()
        synonyms = ("\n".join(
            t + "\t" + "\t".join(sorted(m)) for t, m in SYNONYMS.items()
        )).encode()
        stop = ("\n".join(sorted(STOP_WORDS))).encode()
        self._h = lib.rrt_featurizer_create(
            vocab_blob, len(vocab_blob), self._df, self._idf, len(self._df),
            phrases, len(phrases), colors, len(colors),
            synonyms, len(synonyms), stop, len(stop),
            query_terms_cap, gate_terms_cap,
        )
        self.packed_len = int(lib.rrt_featurizer_packed_len(self._h))
        self.gate_terms_cap = int(gate_terms_cap)
        self._finalizer = weakref.finalize(
            self, lib.rrt_featurizer_destroy, self._h
        )

    def expand_token(self, token: str):
        """Trigram-index dynamic-gate expansion (<= gate_terms_cap int32
        ids) — same semantics/order as the Python scan, ~50x faster cold."""
        import numpy as np

        out = np.empty(self.gate_terms_cap, np.int32)
        raw = token.encode("ascii")
        n = self._lib.rrt_featurizer_expand(self._h, raw, len(raw), out,
                                            self.gate_terms_cap)
        return out[: int(n)].copy()

    def featurize_packed(self, query: str):
        import numpy as np

        out = np.empty(self.packed_len, np.float32)
        raw = query.encode("ascii")
        self._lib.rrt_featurize(self._h, raw, len(raw), out)
        return out

    def featurize_packed_batch(self, queries):
        import numpy as np

        blobs = [q.encode("ascii") for q in queries]
        blob = b"".join(blobs)
        offsets = np.zeros(len(blobs) + 1, np.int64)
        np.cumsum([len(b) for b in blobs], out=offsets[1:])
        out = np.empty((len(blobs), self.packed_len), np.float32)
        self._lib.rrt_featurize_batch(self._h, blob, offsets, len(blobs), out)
        return out
