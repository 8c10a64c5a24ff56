"""leaffliction_tpu — a TPU-native leaf-disease image pipeline framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
Kiripiro/leaffliction reference (leaf-disease dataset analysis, class-balancing
augmentation, segmentation/analysis transforms, CNN training, and batch
prediction/evaluation) designed TPU-first:

- all hot image ops (augmentation, colorspace, threshold, morphology,
  histograms, segmentation scoring) are batched, jit-able `jax.numpy` /
  Pallas functions that run on-device over NHWC tensors;
- training is a single jitted step (Flax model + optax AdamW/cosine/EMA)
  shardable over a `jax.sharding.Mesh` via NamedSharding/pjit;
- the host side is a thin orchestration layer: manifest/split logic, JPEG
  decode (native C++ helper when built, PIL fallback), artifact writers.

Public CLI surface and artifact formats mirror the reference
(`pyproject.toml:18-25` in the reference repo).
"""

__version__ = "0.1.0"
