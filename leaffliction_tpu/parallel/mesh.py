"""Device mesh + sharding setup.

The reference has no model-level parallelism (host process pools only,
`srcs/preprocessing/dataset_balancer.py:137-162`). Here data parallelism is
first-class: one `jax.sharding.Mesh` with a `data` axis for batch sharding and
an optional `model` axis kept available for tensor-parallel experiments with
the deeper backbone. All collectives are inserted by XLA from sharding
annotations — there is no hand-written communication on the training path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape; `model=1` means pure data parallelism."""

    data: int = -1   # -1: use all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return MeshSpec(data=data, model=model)


def make_mesh(
    spec: MeshSpec | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = (spec or MeshSpec()).resolve(len(devices))
    dev_array = np.asarray(devices).reshape(spec.data, spec.model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over `data`, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def chain_batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for K chained batches [K, B, ...]: the chain (scan) dim is
    replicated, the batch dim shards over `data`."""
    return NamedSharding(mesh, P(None, DATA_AXIS, *([None] * (ndim - 2))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_global(x, mesh: Mesh):
    """Replicate a process-local array over a (possibly multi-host) mesh
    WITHOUT a host round-trip.

    Single-process: plain `device_put` with a replicated NamedSharding.
    Multi-process: every process must already hold an IDENTICAL local
    copy (the fused balancer guarantees this — decode and augmentation
    are deterministic functions of the shared seed and the shared source
    tree); each process copies its local array to its addressable
    devices (device-to-device) and the global array is assembled from
    the per-device shards. This is how the fused balance→train dataset
    becomes visible to a multi-host gather step with zero pixel
    downloads."""
    import jax

    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    local = [d for d in mesh.devices.flat
             if d.process_index == jax.process_index()]
    shards = [jax.device_put(x, d) for d in local]
    return jax.make_array_from_single_device_arrays(x.shape, sh, shards)


def global_batch_array(x, mesh: Mesh, spec) -> object:
    """Host value (IDENTICAL on every process) → global jax.Array sharded
    by `spec`. Single-process: returned as-is (jit's in_shardings place
    it). Multi-process: jit refuses numpy inputs with non-trivial
    shardings, so build the global array explicitly — each process serves
    its addressable shards out of its identical host copy."""
    import jax
    import numpy as np_

    if jax.process_count() == 1:
        return x
    arr = np_.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx])


def tp_shardings(tree, mesh: Mesh, min_size: int = 64):
    """Per-leaf NamedShardings implementing tensor parallelism over the
    `model` axis, by shape: any leaf whose LAST dim divides by the axis
    size and is at least `min_size` shards that dim; everything else
    replicates. The last dim is the out-channel dim across the whole
    state — conv kernels (HWIO) and dense kernels (IO) shard their
    output features, and BN scale/bias/stats, biases, and the optimizer
    moments (shaped like their params) shard the SAME channels, so every
    channel-c tensor lands on the same submesh and XLA's SPMD partitioner
    keeps the layer-local math communication-free (collectives appear
    only where channels mix: the depthwise/1x1 boundaries and the final
    logits). `min_size` keeps tiny tensors (class-head bias, 3-channel
    norm stats) replicated — sharding them buys nothing and costs
    per-shard padding.

    Shape-driven on purpose: it covers params, EMA copies, and optax
    moment trees without knowing their pytree structure. With `model=1`
    (or on a 1-device mesh) every leaf replicates, so it is always safe
    to apply. The reference has no model parallelism at all; this is the
    TPU-native scale-out story for backbones too wide for one chip's
    HBM."""
    tp = mesh.shape[MODEL_AXIS]

    def spec(x):
        shape = getattr(x, "shape", ())
        if (tp > 1 and len(shape) >= 1 and shape[-1] >= min_size
                and shape[-1] % tp == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_batch(mesh: Mesh, tree):
    """Device_put a host batch pytree with the batch axis sharded on `data`."""

    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(_put, tree)
