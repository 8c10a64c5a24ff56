"""Single/batch prediction — the TPU serving path.

Capability parity with the reference `Predictor`
(`srcs/predict/predictor.py:15-147`) and `ImageProcessor`
(`srcs/predict/image_processor.py:18-177`), redesigned:

- inference runs as ONE jitted program (normalize + forward + softmax) at a
  fixed serving batch size — padded, never recompiled per request;
- the visualization mask is an in-process on-device call
  (`segment.make_mask`) instead of the reference's subprocess hop that
  parses a child process's stdout (`image_processor.py:82-134`);
- batch preprocessing decodes on a thread pool and stacks uint8; /255 happens
  on device.
"""

from __future__ import annotations

import concurrent.futures as cf
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from leaffliction_tpu.core.logging import get_logger
from leaffliction_tpu.data.loader import decode_resize_pil, default_decode_fn
from leaffliction_tpu.predict.model_loader import ModelLoader

LOGGER = get_logger(__name__)

SERVING_BATCH = 64


def _build_infer(model, variables, mesh=None):
    """→ callable uint8 [B,S,S,3] → probabilities [B,K].

    `mesh=None` (or a 1-device mesh) compiles a PLAIN jit — the relay's
    sharding-annotated dispatch path costs ~370 ms/call, so single-chip
    serving must not pay it. A multi-device mesh shards the serving batch
    over the `data` axis with the variables replicated; XLA inserts no
    collectives in the forward pass (pure data parallelism). Single-process
    only: the sharded output is fetched with `device_get`, which requires
    every shard addressable."""
    import jax
    import jax.numpy as jnp

    def fwd(variables, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        logits = model.apply(variables, x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    if mesh is None or mesh.size == 1:
        return jax.jit(lambda imgs: fwd(variables, imgs))
    if jax.process_count() > 1:
        raise ValueError(
            "mesh serving is single-process (per-host results are fetched "
            "with device_get); run one server per host instead")

    from jax.sharding import NamedSharding, PartitionSpec as P

    from leaffliction_tpu.parallel.mesh import (
        DATA_AXIS,
        batch_sharding,
        replicated,
    )

    n_data = int(mesh.shape[DATA_AXIS])
    if SERVING_BATCH % n_data:
        raise ValueError(
            f"serving batch {SERVING_BATCH} not divisible by the mesh "
            f"data axis ({n_data})")
    vars_repl = jax.device_put(variables, replicated(mesh))
    sharded = jax.jit(
        fwd,
        in_shardings=(replicated(mesh), batch_sharding(mesh, 4)),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS, None)),
    )
    return lambda imgs: sharded(vars_repl, imgs)


class Predictor:
    def __init__(self, learnings_dir: Path | str, mesh=None) -> None:
        self.learnings_dir = Path(learnings_dir)
        self.model_loader = ModelLoader(self.learnings_dir)
        self.mesh = mesh
        self._infer = None

    def load(self) -> "Predictor":
        self.model_loader.load()
        self._infer = _build_infer(self.model_loader.model,
                                   self.model_loader.variables, self.mesh)
        return self

    @classmethod
    def from_model(cls, model, variables, labels, img_size: int, mesh=None
                   ) -> "Predictor":
        """Serving path over an in-memory model (no artifact dir) — used by
        benchmarks and tests; the real CLIs go through `load()`."""
        self = cls.__new__(cls)
        self.learnings_dir = Path(".")

        class _Stub:
            pass

        stub = _Stub()
        stub.labels = list(labels)
        stub.img_size = img_size
        stub.model = model
        stub.variables = variables
        self.model_loader = stub
        self.mesh = mesh
        self._infer = _build_infer(model, variables, mesh)
        return self

    @staticmethod
    def _decode_chunk(paths: List[Path], size: int):
        """→ (uint8 [n,S,S,3], ok [n]) for one serving chunk: the shared
        batched-C++-then-threaded-PIL sequence
        (`data.native.decode_batch_with_fallback` — one GIL release for the
        chunk, 8-way threaded fallback for non-JPEG/unreadable entries)."""
        from leaffliction_tpu.data.native import decode_batch_with_fallback

        return decode_batch_with_fallback(paths, size)

    # --- core batched forward ---------------------------------------------

    def _probs_for_arrays(self, arrays: np.ndarray) -> np.ndarray:
        """uint8 [N,S,S,3] → probabilities [N,K]; pads to SERVING_BATCH.

        All chunks are dispatched before any result is fetched — async jax
        dispatch overlaps each chunk's host→device transfer with the previous
        chunk's compute (the transfer dominates on slow links)."""
        import jax

        n = arrays.shape[0]
        pending = []
        for start in range(0, n, SERVING_BATCH):
            chunk = arrays[start:start + SERVING_BATCH]
            pad = SERVING_BATCH - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            pending.append((self._infer(chunk), pad))
        out = [
            np.asarray(jax.device_get(probs))[:SERVING_BATCH - pad
                                              if pad else SERVING_BATCH]
            for probs, pad in pending
        ]
        return np.concatenate(out) if out else np.zeros((0, 0))

    # --- public API --------------------------------------------------------

    def predict_single(
        self, image_path: Path | str, use_transform: bool = False
    ) -> Dict[str, Any]:
        """→ dict(image_path, top_prediction, confidence, all_probabilities,
        original_array, processed_array) — reference result schema
        (`predictor.py:34-80`)."""
        image_path = Path(image_path)
        size = self.model_loader.img_size
        # same decode path as training and predict_batch — single vs batch
        # mode must yield identical pixels/probabilities for the same image
        arr = default_decode_fn()(str(image_path), size)
        probs = self._probs_for_arrays(arr[None])[0]
        labels = self.model_loader.labels
        top = int(np.argmax(probs))

        processed = arr
        if use_transform:
            precomputed = self._find_precomputed_mask(image_path)
            if precomputed is not None:
                processed = precomputed
            else:
                processed = self.generate_mask_visualization(arr)

        return {
            "image_path": image_path,
            "top_prediction": labels[top],
            "confidence": float(probs[top]),
            "all_probabilities": {
                lab: float(p) for lab, p in zip(labels, probs)
            },
            "original_array": arr,
            "processed_array": processed,
        }

    def predict_batch(
        self, image_paths: Sequence[Path | str]
    ) -> List[Dict[str, Any]]:
        """Batched prediction over many files (`predictor.py:82-147`):
        unreadable images are skipped with a warning.

        Decode and inference are PIPELINED: every decode is submitted to
        the thread pool up front (the native decoder releases the GIL),
        and each serving chunk is dispatched to the device the moment its
        images are ready — later decodes overlap earlier chunks' transfer
        and compute, and all probability fetches happen at the end
        (decode-then-infer as strict phases wastes the decode time)."""
        import jax

        paths = [Path(p) for p in image_paths]
        if not paths:
            return []
        size = self.model_loader.img_size

        chunks = [paths[s:s + SERVING_BATCH]
                  for s in range(0, len(paths), SERVING_BATCH)]
        pending = []  # (device_probs, rows_used)
        ok: List[bool] = []
        # three decode workers — a 3-deep pipeline: chunks N+1 and N+2
        # decode (one batched C++ call each) while chunk N's upload/compute
        # is in flight, so on slow links the decode time fully hides under
        # the transfer and the link never starves waiting for pixels
        with cf.ThreadPoolExecutor(max_workers=3) as pool:
            futures = [pool.submit(self._decode_chunk, c, size)
                       for c in chunks]
            for fut in futures:
                chunk, good = fut.result()
                ok.extend(bool(g) for g in good)
                used = chunk.shape[0]
                pad = SERVING_BATCH - used
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,) + chunk.shape[1:],
                                         chunk.dtype)])
                pending.append((self._infer(chunk), used))

        probs = np.concatenate([
            np.asarray(jax.device_get(p))[:used] for p, used in pending
        ])
        labels = self.model_loader.labels
        results: List[Dict[str, Any]] = []
        for i, path in enumerate(paths):
            if not ok[i]:
                continue
            p = probs[i]
            top = int(np.argmax(p))
            results.append({
                "image_path": path,
                "top_prediction": labels[top],
                "confidence": float(p[top]),
                "all_probabilities": {
                    lab: float(v) for lab, v in zip(labels, p)
                },
            })
        return results

    def _find_precomputed_mask(self, image_path: Path) -> Optional[np.ndarray]:
        """Reuse a transform-CLI mask if present (reference numbered-image
        convention `artifacts/transformations/<N>/<stem>__T_Mask.jpg`,
        `image_processor.py:149-162`)."""
        import re

        match = re.search(r"image \((\d+)\)", image_path.stem)
        number = match.group(1) if match else image_path.stem
        candidate = (Path("artifacts") / "transformations" / number
                     / f"{image_path.stem}__T_Mask.jpg")
        if not candidate.exists():
            return None
        try:
            return decode_resize_pil(str(candidate),
                                     self.model_loader.img_size)
        except Exception:
            return None

    def generate_mask_visualization(self, arr: np.ndarray) -> np.ndarray:
        """Leaf mask over white background for display — in-process on-device
        (replaces the subprocess hop at `image_processor.py:82-134`)."""
        from leaffliction_tpu.segment.mask import apply_mask_white, make_mask_single
        import jax.numpy as jnp

        mask, _ = make_mask_single(jnp.asarray(arr))
        out = apply_mask_white(jnp.asarray(arr), mask)
        return np.asarray(out).astype(np.uint8)
