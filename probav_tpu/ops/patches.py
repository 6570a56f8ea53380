"""Patch extraction and full-scene reconstruction.

TPU-native replacement for the reference's ``torch.Tensor.unfold`` patcher
(utils/dataGenerator.py:569-596) and the row-major tile paste of
test.py:149-160.  Two implementations:

- ``extract_patches`` — jit-able XLA version for in-graph use,
- ``extract_patches_np`` — zero-copy numpy stride-trick version for the host
  preprocessing pipeline (the reference runs this stage on CPU; so do we).

Both emit patches in the same row-major (rows, then cols) order as
torch.unfold, which the submission reconstruction depends on.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _num_windows(size: int, patch: int, stride: int) -> int:
    return (size - patch) // stride + 1


def extract_patches_np(images: np.ndarray, patch: int, stride: int) -> np.ndarray:
    """[..., H, W] -> [..., nH*nW, patch, patch], row-major window order.

    Pure view-based (sliding_window_view + reshape copy at the end).
    """
    nh = _num_windows(images.shape[-2], patch, stride)
    nw = _num_windows(images.shape[-1], patch, stride)
    win = np.lib.stride_tricks.sliding_window_view(images, (patch, patch), axis=(-2, -1))
    win = win[..., ::stride, ::stride, :, :]           # [..., nH, nW, p, p]
    lead = images.shape[:-2]
    return win.reshape(lead + (nh * nw, patch, patch))


def extract_patches(images: jnp.ndarray, patch: int, stride: int) -> jnp.ndarray:
    """[..., H, W] -> [..., nH*nW, patch, patch] (jit-able, static shapes)."""
    nh = _num_windows(images.shape[-2], patch, stride)
    nw = _num_windows(images.shape[-1], patch, stride)
    lead = images.shape[:-2]
    rows = jnp.stack([
        jnp.stack([
            images[..., i * stride: i * stride + patch,
                   j * stride: j * stride + patch]
            for j in range(nw)
        ], axis=-3)
        for i in range(nh)
    ], axis=-4)                                        # [..., nH, nW, p, p]
    return rows.reshape(lead + (nh * nw, patch, patch))


def reconstruct_from_patches(patches: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """[nPatches, p, p, C] -> [out_size, out_size, C], row-major paste.

    Inverse of non-overlapping extraction (reference test.py:149-160: 8x8
    grid of 48x48 tiles -> 384x384).  Pure reshape/transpose, no scatter.
    """
    n, p, _, c = patches.shape
    grid = out_size // p
    assert grid * grid == n, (n, p, out_size)
    x = patches.reshape(grid, grid, p, p, c)
    x = x.transpose(0, 2, 1, 3, 4)                     # [gH, p, gW, p, C]
    return x.reshape(out_size, out_size, c)


def depth_to_space(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """tf.nn.depth_to_space for NHWC: [B,H,W,r*r*C] -> [B,H*r,W*r,C]."""
    b, h, w, c = x.shape
    r = scale
    cout = c // (r * r)
    x = x.reshape(b, h, w, r, r, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)                  # [B, H, r, W, r, C]
    return x.reshape(b, h * r, w * r, cout)
