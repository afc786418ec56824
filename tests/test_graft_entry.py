"""Keep the driver entry points green (compile-checked on CPU)."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8_virtual_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_returns_jittable_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 4096
    assert np.isfinite(np.asarray(out)).all()
