"""Host I/O helpers: 16-bit PNG codec and (masked) array persistence.

The PROBA-V dataset ships 16-bit grayscale PNGs (LR/HR images) and binary
quality masks; submissions are written back as uint16 PNGs
(test.py:95-100).  Array artifacts between pipeline stages are pickled
numpy (masked) arrays with the same file-name contract as the reference
(``*.npy`` via ``ndarray.dump``).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

try:
    import imageio.v2 as _iio
except Exception:  # pragma: no cover
    import imageio as _iio


def read_png(path: str) -> np.ndarray:
    """Read a PNG as-is (uint16 for PROBA-V data, bool-ish for masks)."""
    return np.asarray(_iio.imread(path))


def write_png(path: str, img: np.ndarray) -> None:
    """Write a 2D uint16 grayscale PNG (submission format)."""
    _iio.imwrite(path, np.ascontiguousarray(img.astype(np.uint16)))


def dump_masked(arr: Any, path: str) -> None:
    """Persist a (masked) array with pickle, like ndarray.dump(protocol=4)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr.dump(path, protocol=4)


def load_npy(path: str) -> Any:
    return np.load(path, allow_pickle=True)
