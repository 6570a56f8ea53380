"""Sobel edge extraction matching tf.image.sobel_edges semantics.

The reference's Sobel-L1 mixed loss (models/loss.py:219-224) relies on
``tf.image.sobel_edges``: per-channel 3x3 Sobel filters applied after REFLECT
padding, returning a trailing axis of size 2 ordered [dy, dx].
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

# tf.image.sobel_edges kernel bank: dy = smooth_x * diff_y, dx = transpose.
# Host-side constants: a module-level DEVICE array would initialize the
# backend at import time (and block every `probav_tpu.ops` import when no
# device is reachable); jnp converts them at trace time instead.
_SOBEL_DY = np.array([[-1.0, -2.0, -1.0],
                      [0.0, 0.0, 0.0],
                      [1.0, 2.0, 1.0]], dtype=np.float32)
_SOBEL_DX = _SOBEL_DY.T


def sobel_edges(images: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] float -> [B, H, W, C, 2] with (dy, dx) edge maps.

    Uses REFLECT padding as tf.image.sobel_edges does.
    """
    b, h, w, c = images.shape
    x = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # Depthwise conv: run both kernels on every channel at once.
    # kernel shape (kh, kw, in_ch=1, out_per_in=2) with feature_group_count=C.
    k = jnp.stack([_SOBEL_DY, _SOBEL_DX], axis=-1)[:, :, None, :]  # (3,3,1,2)
    k = jnp.tile(k, (1, 1, c, 1)).reshape(3, 3, 1, 2 * c)
    out = lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    # out channels are grouped [c0_dy, c0_dx, c1_dy, c1_dx, ...]
    return out.reshape(b, h, w, c, 2)
