"""Batched, jit-able image ops (NHWC float32/uint8) — the TPU compute layer.

Every op here is a pure function over arrays: no PIL/OpenCV, no host loops.
They replace the reference's per-file PIL/cv2 calls
(`srcs/preprocessing/image_augmenter.py`, `srcs/transform/filters/*`) with
on-device batch kernels.
"""

from leaffliction_tpu.ops.geometry import (  # noqa: F401
    affine_matrix,
    homography_warp,
    perspective_matrix_from_coeffs,
    rotation_matrix,
    shear_matrix,
    warp_image,
)
from leaffliction_tpu.ops.image import (  # noqa: F401
    normalize_to_unit,
    resize_bilinear,
    to_float,
)
