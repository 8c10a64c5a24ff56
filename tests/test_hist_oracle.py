"""Hist-filter statistics vs an independent cv2/numpy oracle.

Validates the full chain (device HSV conversion + gates) against the exact
formulas the reference computes with cv2 (`filters/hist.py:22-67,183-186`).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from leaffliction_tpu.segment.hist import color_region_percentages  # noqa: E402


def oracle_percentages(rgb: np.ndarray) -> dict:
    hsv = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV)
    h, s, v = hsv[..., 0].astype(int), hsv[..., 1].astype(int), \
        hsv[..., 2].astype(int)
    mask = (s > 10) & (v > 15) & (v < 245)
    total = max(mask.sum(), 1)

    def frac(cond):
        return (mask & cond).sum() / total * 100.0

    return {
        "Vert Sain": frac((h >= 35) & (h <= 85) & (s >= 40) & (v >= 30)),
        "Vert Jaunâtre": frac((h >= 20) & (h <= 40) & (s >= 25) & (v >= 30)),
        "Jaune": frac((h >= 15) & (h <= 35) & (s >= 50) & (v >= 50)),
        "Brun/Orange": frac((((h >= 0) & (h <= 25)) | (h >= 160))
                            & (s >= 30) & (v >= 20)),
        "Rouge": frac((((h >= 160) & (h <= 180)) | ((h >= 0) & (h <= 10)))
                      & (s >= 40) & (v >= 30)),
        "Zones Sombres": frac((v <= 50) & (s >= 20)),
        "Zones Claires": frac((v >= 200) & (s <= 30)),
        "Violet/Pourpre": frac((h >= 120) & (h <= 160) & (s >= 20)),
    }


def test_color_regions_match_cv2_oracle():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import _leafish_image

    rng = np.random.default_rng(7)
    img = _leafish_image(rng, 96)
    # add brown + yellow patches so several categories are non-trivial
    img[10:20, 10:25] = [150, 90, 40]
    img[70:80, 60:75] = [210, 200, 60]

    ours = color_region_percentages(img)
    ref = oracle_percentages(img)
    for key in ref:
        # our HSV is within 1 LSB of cv2 → gate membership may flip for
        # boundary pixels; allow a small absolute tolerance
        assert ours[key] == pytest.approx(ref[key], abs=1.5), key
