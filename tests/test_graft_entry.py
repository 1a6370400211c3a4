"""Driver entry points: single-chip forward compiles; the multi-chip dry run
executes the full dp×tp training step on the virtual 8-device mesh."""

import jax
import numpy as np


def test_entry_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # dp=4 × tp=2


def test_dryrun_multichip_1():
    import __graft_entry__ as g

    g.dryrun_multichip(1)
