"""ctypes bindings for the native libjpeg decode/encode helper.

Auto-builds `libleafjpeg.so` on first use when a compiler is present;
callers fall back to PIL when unavailable (`native_available()`).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from leaffliction_tpu.core.logging import get_logger

LOGGER = get_logger(__name__)

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libleafjpeg.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        src = _DIR / "decoder.cpp"
        stale = (not _LIB_PATH.exists()
                 or (src.exists()
                     and src.stat().st_mtime > _LIB_PATH.stat().st_mtime))
        if stale:  # (re)build before dlopen — dlopen caches per process
            subprocess.run(["sh", str(_DIR / "build.sh")], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.leaf_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.leaf_jpeg_dims.restype = ctypes.c_int
        lib.leaf_decode_jpeg_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p]
        lib.leaf_decode_jpeg_resize.restype = ctypes.c_int
        lib.leaf_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.leaf_decode_jpeg.restype = ctypes.c_int
        lib.leaf_encode_jpeg.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t)]
        lib.leaf_encode_jpeg.restype = ctypes.c_int
        lib.leaf_decode_batch_resize.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.leaf_decode_batch_resize.restype = ctypes.c_int
        _lib = lib
    except Exception as exc:
        LOGGER.warning("Native JPEG helper unavailable (%s); using PIL", exc)
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_resize(path: str, target: int) -> np.ndarray:
    """Decode JPEG file → target×target×3 uint8 RGB (DCT-scaled + bilinear)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    data = Path(path).read_bytes()
    out = np.empty((target, target, 3), np.uint8)
    rc = lib.leaf_decode_jpeg_resize(
        data, len(data), target, out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"JPEG decode failed for {path} (rc={rc})")
    return out


def decode_full(path: str) -> np.ndarray:
    """Decode JPEG file at native size → H×W×3 uint8 RGB."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    data = Path(path).read_bytes()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.leaf_jpeg_dims(data, len(data), ctypes.byref(w),
                          ctypes.byref(h)) != 0:
        raise ValueError(f"Not a JPEG: {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.leaf_decode_jpeg(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
        ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"JPEG decode failed for {path} (rc={rc})")
    return out


def encode(path: str, rgb: np.ndarray, quality: int = 95) -> None:
    """Encode uint8 RGB → JPEG file (reference save quality 95)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native encoder unavailable")
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    cap = rgb.nbytes + 65536
    out = np.empty((cap,), np.uint8)
    out_len = ctypes.c_size_t()
    rc = lib.leaf_encode_jpeg(
        rgb.ctypes.data_as(ctypes.c_void_p), w, h, quality,
        out.ctypes.data_as(ctypes.c_void_p), cap, ctypes.byref(out_len))
    if rc != 0:
        raise ValueError(f"JPEG encode failed (rc={rc})")
    Path(path).write_bytes(out[:out_len.value].tobytes())


def decode_batch_resize(paths, img_size: int,
                        n_threads: int = 0) -> tuple:
    """Decode many JPEG files → (uint8 [n, S, S, 3], ok bool [n]) in ONE
    ctypes call; the C++ side fans out over its own thread pool (the GIL is
    released for the whole batch instead of per image). Failed entries have
    ok=False and zeroed pixels — callers fall back per image (PIL handles
    the .png inputs the predict CLI globs, like the reference)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.zeros((n, img_size, img_size, 3), np.uint8)
    status = np.full((n,), -1, np.int32)
    if n == 0:
        return out, status == 0
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.leaf_decode_batch_resize(
        arr, n, img_size, out.ctypes.data_as(ctypes.c_void_p),
        status.ctypes.data_as(ctypes.c_void_p), n_threads)
    return out, status == 0


def decode_batch_with_fallback(paths, img_size: int, workers: int = 8,
                               log_failures: bool = True) -> tuple:
    """→ (uint8 [n, S, S, 3], ok bool [n]): the ONE decode sequence every
    batch consumer shares (training loader, serving predictor, fused
    balancer) — LEAF_NATIVE_DECODE env gate → batched C++ decode (its own
    thread pool, one GIL release) → threaded per-image PIL fallback for
    the failures (non-JPEG inputs, or the native library missing
    entirely). Failed-in-both entries come back ok=False with zeroed
    pixels; callers decide whether to skip or error."""
    import concurrent.futures as cf
    import os

    n = len(paths)
    arrs = None
    if os.environ.get("LEAF_NATIVE_DECODE", "1") != "0":
        try:
            if native_available():
                arrs, ok = decode_batch_resize(paths, img_size)
        except Exception:  # pragma: no cover - toolchain missing
            arrs = None
    if arrs is None:
        arrs = np.zeros((n, img_size, img_size, 3), np.uint8)
        ok = np.zeros((n,), bool)

    from leaffliction_tpu.data.loader import decode_resize_pil

    def _load(i: int) -> None:
        try:
            arrs[i] = decode_resize_pil(str(paths[i]), img_size)
            ok[i] = True
        except Exception as exc:
            if log_failures:
                from leaffliction_tpu.core.logging import get_logger

                get_logger(__name__).warning(
                    "Skipping unreadable image %s (%s)", paths[i], exc)

    todo = np.nonzero(~ok)[0].tolist()
    if workers > 1 and len(todo) > 1:
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(_load, todo))
    else:
        for i in todo:
            _load(i)
    return arrs, ok


def decode_resize_native(path: str, img_size: int) -> np.ndarray:
    """Loader-compatible decode_fn (same signature as decode_resize_pil).

    Falls back to PIL per image on native-decode failure: libjpeg raises on
    non-JPEG inputs (e.g. the .png files the predict CLI globs), which the
    reference's PIL path handles fine — a skip here would be a behavioral
    regression (and would misalign downstream evaluation pairing).
    """
    try:
        return decode_resize(path, img_size)
    except Exception:
        from leaffliction_tpu.data.loader import decode_resize_pil

        return decode_resize_pil(path, img_size)
