"""Keep the driver entry points green (compile-checked on CPU)."""

import sys
import os

import jax
import numpy as np
import pytest

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


@pytest.mark.parametrize("n", [16, 32])
def test_dryrun_multichip_large_meshes(n):
    """VERDICT round-1 item 6: the dryrun must hold at n in {8, 16, 32}.
    Needs more virtual devices than the suite's 8, so run in a subprocess
    with its own XLA_FLAGS."""
    import subprocess

    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import __graft_entry__ as g; "
        f"g.dryrun_multichip({n}); print('DRYRUN_OK')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert "DRYRUN_OK" in r.stdout, r.stdout[-2000:] + r.stderr[-4000:]
