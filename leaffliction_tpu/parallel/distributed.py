"""Multi-host initialization (SURVEY §5: distributed communication backend).

The reference has no distributed runtime at all; here multi-host TPU slices
use `jax.distributed` + XLA collectives over ICI/DCN. Call
`maybe_initialize()` before device queries in any CLI — it is a no-op on a
single host, and reads the standard coordinator env vars
(`JAX_COORDINATOR_ADDRESS`, `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`) or TPU
pod metadata otherwise.
"""

from __future__ import annotations

import os

from leaffliction_tpu.core.logging import get_logger

LOGGER = get_logger(__name__)

_initialized = False


def maybe_initialize() -> None:
    """Initialize jax.distributed when multi-host env vars are present."""
    global _initialized
    if _initialized:
        return
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    process_id = os.environ.get("JAX_PROCESS_ID")
    if not coordinator:
        return  # single host — nothing to do
    import jax

    kwargs = {"coordinator_address": coordinator}
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    LOGGER.info("jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count())
