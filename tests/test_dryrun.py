"""Driver-contract regression: dryrun_multichip must keep compiling and
executing on the 8-virtual-device CPU mesh (the shape the external driver
validates). Marked slow — it compiles a dp x tp train step + sharded query.
"""
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any sharding/compile regression


@pytest.mark.slow
def test_entry_shapes():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    scores, idx = jax.eval_shape(fn, *args)  # compile-shape check only
    assert scores.shape == (8, 10) and idx.shape == (8, 10)
