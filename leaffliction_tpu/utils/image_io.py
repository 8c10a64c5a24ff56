"""Image IO helpers — API parity with `srcs/utils/image_utils.py:16-130`.

`ImageLoader` / `ImageTransforms` equivalents: RGB-ensured load with the
`.jpg`-only whitelist, quality-95 save, array↔PIL, recursive discovery,
LANCZOS resize, /255 normalization. The hot paths use the native libjpeg
helper / device kernels; these wrappers keep the reference's utility surface.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import numpy as np

SUPPORTED_EXTENSIONS = {".jpg"}


class ImageLoader:
    @staticmethod
    def validate_image_path(path: str | Path) -> bool:
        p = Path(path)
        return p.is_file() and p.suffix.lower() in SUPPORTED_EXTENSIONS

    @staticmethod
    def load_pil_image(path: str | Path):
        from PIL import Image

        with Image.open(path) as im:
            return im.convert("RGB").copy()

    @staticmethod
    def load_as_array(path: str | Path) -> np.ndarray:
        try:
            from leaffliction_tpu.data import native

            if native.native_available():
                return native.decode_full(str(path))
        except Exception:
            pass
        return np.asarray(ImageLoader.load_pil_image(path), np.uint8)

    @staticmethod
    def save_pil_image(img, path: str | Path, quality: int = 95) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        img.save(path, quality=quality)

    @staticmethod
    def save_array(arr: np.ndarray, path: str | Path,
                   quality: int = 95) -> None:
        try:
            from leaffliction_tpu.data import native

            if native.native_available() and str(path).lower().endswith(
                    (".jpg", ".jpeg")):
                native.encode(str(path), np.asarray(arr, np.uint8), quality)
                return
        except Exception:
            pass
        from PIL import Image

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(np.asarray(arr, np.uint8)).save(path, quality=quality)

    @staticmethod
    def array_to_pil(arr: np.ndarray):
        from PIL import Image

        return Image.fromarray(np.asarray(arr, np.uint8))

    @staticmethod
    def get_image_files(directory: str | Path,
                        recursive: bool = True) -> List[Path]:
        d = Path(directory)
        it = d.rglob("*") if recursive else d.iterdir()
        return sorted(p for p in it if ImageLoader.validate_image_path(p))


class ImageTransforms:
    @staticmethod
    def resize_image(img, size: int | tuple):
        from PIL import Image

        if isinstance(size, int):
            size = (size, size)
        return img.resize(size, Image.LANCZOS)

    @staticmethod
    def normalize_array(arr: np.ndarray) -> np.ndarray:
        return np.asarray(arr, np.float32) / 255.0
