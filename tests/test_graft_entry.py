"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 verdict flagged that `dryrun_multichip` relied on the *caller*
forcing the virtual CPU platform; the driver imports the module and calls
the function directly, so the forcing must live inside the function. These
tests call the entry points exactly the way the driver does.
"""

import pytest
import subprocess
import sys

import numpy as np

pytestmark = pytest.mark.slow  # e2e-scale; inner loop: -m 'not slow'


def test_dryrun_multichip_inprocess():
    # conftest already forces 8 virtual CPU devices; the function must be a
    # no-op pass-through in that case and still run the sharded step.
    sys.path.insert(0, "/root/repo")
    try:
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
        dryrun_multichip(4)  # fewer devices than available must also work
    finally:
        sys.path.remove("/root/repo")


def test_dryrun_multichip_subprocess_no_env_help():
    """The driver's exact shape: fresh process, no XLA_FLAGS/JAX_PLATFORMS
    help from the caller — the function must force the platform itself."""
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    import os

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok: 8 devices" in out.stdout


def test_entry_forward_shape():
    sys.path.insert(0, "/root/repo")
    try:
        import jax

        from __graft_entry__ import entry

        fn, args = entry()
        probs = jax.jit(fn)(*args)
        probs = np.asarray(probs)
        assert probs.shape == (8, 8)
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-2)
    finally:
        sys.path.remove("/root/repo")
