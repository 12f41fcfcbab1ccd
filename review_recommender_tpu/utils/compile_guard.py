"""Guard against accidental large-closure jits.

Any array a jitted function CLOSES OVER (rather than takes as an argument)
is baked into the traced program as a constant. On a remote/tunneled TPU
backend the constant travels inside the compile payload — a closed-over
200k x 384 corpus turns every compile into a hundreds-of-MB RPC (the
HTTP-413 class of failure seen in round 1), and on any backend it bloats
the executable and defeats donation. The engine therefore passes corpus
arrays as ARGUMENTS (engine/search.py `_stage_a_impl` note); this module
makes that invariant checkable in CI.

Usage:
    from review_recommender_tpu.utils.compile_guard import (
        assert_no_large_constants)
    assert_no_large_constants(fn, *example_args, limit_bytes=1 << 20)
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax

#: default per-constant budget: 1 MiB — big enough for lookup tables
#: (IDF vectors, gate vocab bitsets on small corpora), far below any
#: corpus-sized array.
DEFAULT_LIMIT_BYTES = 1 << 20


def traced_constant_sizes(fn, *args, **kwargs) -> List[Tuple[str, int]]:
    """Trace ``fn(*args, **kwargs)`` (without compiling or running it) and
    return ``(description, nbytes)`` for every closure-captured constant.

    Static/python kwargs of a to-be-jitted function should be passed here as
    ordinary kwargs; arrays passed as arguments never show up — only values
    the function closed over do.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    out = []
    for c in closed.consts:
        arr = np.asarray(c)
        out.append((f"{arr.dtype}{list(arr.shape)}", int(arr.nbytes)))
    return out


def large_constants(fn, *args, limit_bytes: int = DEFAULT_LIMIT_BYTES,
                    **kwargs) -> List[Tuple[str, int]]:
    """Constants above the budget, largest first."""
    found = [(d, n) for d, n in traced_constant_sizes(fn, *args, **kwargs)
             if n > limit_bytes]
    return sorted(found, key=lambda t: -t[1])


def assert_no_large_constants(fn, *args,
                              limit_bytes: int = DEFAULT_LIMIT_BYTES,
                              name: str | None = None, **kwargs) -> None:
    """Raise ``AssertionError`` naming every oversized closed-over constant."""
    bad = large_constants(fn, *args, limit_bytes=limit_bytes, **kwargs)
    if bad:
        label = name or getattr(fn, "__name__", repr(fn))
        listing = ", ".join(f"{d} = {n / 1e6:.1f} MB" for d, n in bad)
        raise AssertionError(
            f"{label} closes over {len(bad)} constant(s) above "
            f"{limit_bytes / 1e6:.1f} MB: {listing}. Pass corpus arrays as "
            f"jit ARGUMENTS, not closures — closed-over arrays ship inside "
            f"the (possibly remote) compile payload."
        )
