"""Real 2-process multi-host test (jax.distributed over localhost CPU).

Spawns two worker processes that form a distributed "slice" (2 virtual CPU
devices each, 4-device global mesh) and run training end-to-end with an
UNEVEN item count across hosts — the scenario that deadlocked before
`pad_to_steps`: stride shards of 5 items give one host 3 items and the
other 2, so per-host step counts would differ without the global step
derivation. See tools/multihost_smoke.py for what each worker exercises.
"""

import pytest
import os
import socket
import subprocess
import sys
from pathlib import Path

pytestmark = pytest.mark.slow  # e2e-scale; inner loop: -m 'not slow'

SCRIPT = Path(__file__).resolve().parents[1] / "tools" / "multihost_smoke.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    import shutil
    import tempfile

    port = _free_port()
    shared = Path(tempfile.gettempdir()) / f"mh_fused_{port}"
    shutil.rmtree(shared, ignore_errors=True)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(SCRIPT), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    try:
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
            assert f"MULTIHOST_OK p{i}" in out, out[-2000:]
            # phase 2: fused balance→train over the same 2-process mesh
            assert f"MULTIHOST_FUSED_OK p{i}" in out, out[-2000:]
            # phase 3: orbax round-trip of cross-process-sharded (TP) state
            assert f"MULTIHOST_CKPT_OK p{i}" in out, out[-2000:]
            # phase 4: ASYNC step-granular saves + mesh resume (VERDICT r4
            # item 2 — deterministic cadence, main-thread collectives)
            assert f"MULTIHOST_ASYNC_CKPT_OK p{i}" in out, out[-2000:]
        # both hosts computed the same global validation loss
        loss0 = [ln for ln in outs[0].splitlines()
                 if "MULTIHOST_OK" in ln][0]
        loss1 = [ln for ln in outs[1].splitlines()
                 if "MULTIHOST_OK" in ln][0]
        assert loss0.split("val_loss=")[1] == loss1.split("val_loss=")[1]
    finally:
        shutil.rmtree(shared, ignore_errors=True)
