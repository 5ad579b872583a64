"""dSprites factor-image dataset for the Higgins metric.

The reference loads the dSprites npz from a private NFS path
(reference envs/dsprites.py:6-21) and exposes 4 ground-truth factors
(scale, orientation, posX, posY — shape is fixed, envs/dsprites.py:25-41).
This module loads the same npz when a path is available
(``SCMGAN_DSPRITES_PATH`` env var or the reference's default path) and
otherwise falls back to a procedural renderer of the square sprite with the
same 4-factor parameterization — enough for the Higgins-metric machinery to
run end-to-end without the dataset file.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

NUM_FACTORS = 4
IMG_WIDTH = 64

_DEFAULT_PATH = "/mnt/nfs/data/dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz"

_imgs: Optional[np.ndarray] = None
_loaded_from_file = False


def init(path: Optional[str] = None):
    """Load the dSprites npz if present; otherwise mark procedural mode."""
    global _imgs, _loaded_from_file
    path = path or os.environ.get("SCMGAN_DSPRITES_PATH", _DEFAULT_PATH)
    if os.path.exists(path):
        with np.load(path, encoding="bytes") as npz:
            _imgs = npz["imgs"]
        _loaded_from_file = True
    else:
        _imgs = None
        _loaded_from_file = False


def _procedural_square(scale_idx: int, orient_idx: int, x_idx: int,
                       y_idx: int) -> np.ndarray:
    """Procedural stand-in for the dataset's square sprite with the same
    factor grid: 6 scales, 40 orientations, 32 x 32 positions."""
    size = 6.0 + scale_idx * 2.0
    theta = orient_idx * (2 * np.pi / 40.0)
    cx = 12 + x_idx * (40.0 / 31.0)
    cy = 12 + y_idx * (40.0 / 31.0)
    yy, xx = np.mgrid[0:IMG_WIDTH, 0:IMG_WIDTH].astype(np.float32)
    dx, dy = xx - cx, yy - cy
    rx = np.abs(np.cos(theta) * dx + np.sin(theta) * dy)
    ry = np.abs(-np.sin(theta) * dx + np.cos(theta) * dy)
    return ((rx <= size / 2) & (ry <= size / 2)).astype(np.float32)


def generate_image_discrete(factors) -> np.ndarray:
    """factors: [scale(0-5), orientation(0-39), x(0-31), y(0-31)]
    (reference envs/dsprites.py:31-41)."""
    if _imgs is None and not _loaded_from_file:
        init()
    if _imgs is not None:
        scale, orientation, x, y = (int(f) for f in factors)
        idx = y + x * 32 + orientation * 32 * 32 + scale * 32 * 32 * 40
        return _imgs[idx]
    return _procedural_square(*(int(f) for f in factors))


def generate_image_continuous(factors) -> np.ndarray:
    """factors in [0,1]^4 (reference envs/dsprites.py:44-51)."""
    discrete = [
        min(int(factors[0] * 6), 5),
        min(int(factors[1] * 40), 39),
        min(int(factors[2] * 32), 31),
        min(int(factors[3] * 32), 31),
    ]
    return generate_image_discrete(discrete)


def simulator(factor_batch) -> np.ndarray:
    """(B, 4) in [0,1] -> (B, 64, 64) images, for the Higgins metric."""
    return np.array([generate_image_continuous(f) for f in factor_batch])
