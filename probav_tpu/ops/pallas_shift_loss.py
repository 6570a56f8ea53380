"""Fused Pallas TPU kernel for the 49-shift masked L1/L2 loss table.

This is the performance-critical op of the whole framework (the reference
spends its step time in a Python loop of 49 crop/bias/mask/reduce TF graphs,
models/loss.py:37-110; the XLA fallback in shift_loss.py materializes
49 x B x 42 x 42 intermediates in HBM).  Here a tile of 8 batch samples'
three 48 x 48 planes is staged into VMEM ONCE and all 49 shift hypotheses
are evaluated in-register by the VPU — no HBM traffic beyond the inputs and
the [B, 49] output table.

A custom VJP implements the exact analytic gradient w.r.t. the prediction
(the truth/mask are data, their cotangents are zero):

    L_s     = (1/N_s) * sum |hr_s - (pred + b_s) * m_s|      (or squared)
    b_s     = (sum hr_s - sum pred*m_s) / N_s
    dL/dp_q = (1/N_s) * (-phi_q * m_q + m_q * sum(phi*m)/N_s)

with phi = sign(r) for L1 and 2r for L2 — the b_s dependence on pred
contributes the second term.  The backward pass is a second fused kernel of
the same shape.

Only the (C == 1, square HxW) grayscale case is fused; anything else falls
back to the vectorized XLA path transparently.  The batch is padded to a
multiple of the 8-sample tile (TPU sublane granularity).

STATUS: numerically verified (fwd parity 3e-7, exact-gradient parity vs the
XLA path) but OPT-IN — on the current Mosaic toolchain the 49 unaligned
42x42 window reductions lower to pathologically slow code (~20 ms/iteration
vs ~us expected), losing to the XLA path (which needs only ~0.2 ms inside
the train step).  Set ``INTERPRET = True`` to run the kernels through the
Pallas interpreter (for CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 8   # samples per program: TPU sublane granularity
INTERPRET = False  # route pallas_call through the interpreter (CPU tests)


def _shift_count(border: int) -> int:
    return (2 * border + 1) ** 2


def _fwd_kernel(hr_ref, m_ref, p_ref, out_ref, *, border: int, crop: int,
                squared: bool):
    hr = hr_ref[...]                                  # [TILE_B, H, W]
    m = m_ref[...]
    p = p_ref[...][:, border:border + crop, border:border + crop]
    n_sh = 2 * border + 1
    # Two-stage reductions to [TILE_B, 1]: Mosaic's layout inference rejects
    # rank-1 intermediates and multi-axis keepdims reductions.
    sum2 = lambda x: jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)
    losses = []
    for i in range(n_sh):
        for j in range(n_sh):
            hr_c = hr[:, i:i + crop, j:j + crop]
            m_c = m[:, i:i + crop, j:j + crop]
            total = sum2(m_c)                         # [TILE_B, 1]
            bias = (sum2(hr_c) - sum2(p * m_c)) / total
            r = hr_c - (p + bias[:, :, None]) * m_c
            val = sum2(r * r) if squared else sum2(jnp.abs(r))
            losses.append(val / total)                # [TILE_B, 1]
    out_ref[...] = jnp.concatenate(losses, axis=1)    # [TILE_B, S]


def _bwd_kernel(hr_ref, m_ref, p_ref, g_ref, dp_ref, *, border: int,
                crop: int, squared: bool):
    hr = hr_ref[...]
    m = m_ref[...]
    p = p_ref[...][:, border:border + crop, border:border + crop]
    g = g_ref[...]                                    # [TILE_B, S]
    n_sh = 2 * border + 1
    sum2 = lambda x: jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)
    acc = jnp.zeros_like(p)
    for i in range(n_sh):
        for j in range(n_sh):
            s = i * n_sh + j
            hr_c = hr[:, i:i + crop, j:j + crop]
            m_c = m[:, i:i + crop, j:j + crop]
            total = sum2(m_c)                         # [TILE_B, 1]
            bias = (sum2(hr_c) - sum2(p * m_c)) / total
            r = hr_c - (p + bias[:, :, None]) * m_c
            phi = (2.0 * r) if squared else jnp.sign(r)
            corr = jnp.expand_dims(sum2(phi * m_c) / total, 2)
            term = (-phi * m_c + m_c * corr) / jnp.expand_dims(total, 2)
            g_s = jnp.expand_dims(g[:, s:s + 1], 2)   # [TILE_B, 1, 1]
            acc = acc + g_s * term
    dp_ref[...] = jnp.zeros_like(dp_ref)
    dp_ref[:, border:border + crop, border:border + crop] = acc


def _specs(h, w, s, with_g=False):
    planes = [pl.BlockSpec((TILE_B, h, w), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] * 3
    if with_g:
        planes.append(pl.BlockSpec((TILE_B, s), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))
    return planes


def _pallas_table_2d(hr2, m2, p2, border: int, squared: bool):
    """[B, H, W] f32 planes (B % TILE_B == 0) -> [B, S] loss table."""
    b, h, w = hr2.shape
    s = _shift_count(border)
    crop = h - 2 * border
    kern = functools.partial(_fwd_kernel, border=border, crop=crop,
                             squared=squared)
    return pl.pallas_call(
        kern,
        grid=(b // TILE_B,),
        in_specs=_specs(h, w, s),
        out_specs=pl.BlockSpec((TILE_B, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s), jnp.float32),
        interpret=INTERPRET,
    )(hr2, m2, p2)


def _pallas_table_bwd_2d(hr2, m2, p2, g, border: int, squared: bool):
    b, h, w = hr2.shape
    s = _shift_count(border)
    crop = h - 2 * border
    kern = functools.partial(_bwd_kernel, border=border, crop=crop,
                             squared=squared)
    return pl.pallas_call(
        kern,
        grid=(b // TILE_B,),
        in_specs=_specs(h, w, s, with_g=True),
        out_specs=pl.BlockSpec((TILE_B, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=INTERPRET,
    )(hr2, m2, p2, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _table(squared: bool, border: int, hr2, m2, p2):
    return _pallas_table_2d(hr2, m2, p2, border, squared)


def _table_fwd(squared, border, hr2, m2, p2):
    return _pallas_table_2d(hr2, m2, p2, border, squared), (hr2, m2, p2)


def _table_bwd(squared, border, res, g):
    hr2, m2, p2 = res
    dp = _pallas_table_bwd_2d(hr2, m2, p2, g.astype(jnp.float32), border,
                              squared)
    return jnp.zeros_like(hr2), jnp.zeros_like(m2), dp


_table.defvjp(_table_fwd, _table_bwd)


def supports(hr: jnp.ndarray, border: int) -> bool:
    """Fused path covers grayscale square patches with full shift coverage."""
    return (hr.ndim == 4 and hr.shape[-1] == 1 and
            hr.shape[1] == hr.shape[2] and hr.shape[1] > 2 * border)


def per_shift_table(kind: str, hr, mask, pred, border: int = 3):
    """[B,H,W,1] inputs -> [S, B] per-shift L1/L2 table (Pallas-fused)."""
    b = hr.shape[0]
    hr2 = hr.astype(jnp.float32)[..., 0]
    m2 = mask.astype(jnp.float32)[..., 0]
    p2 = pred.astype(jnp.float32)[..., 0]
    pad = (-b) % TILE_B
    if pad:
        # Padded rows: full mask + zero data keeps every divisor nonzero.
        zeros = jnp.zeros((pad,) + hr2.shape[1:], jnp.float32)
        hr2 = jnp.concatenate([hr2, zeros])
        p2 = jnp.concatenate([p2, zeros])
        m2 = jnp.concatenate([m2, jnp.ones_like(zeros)])
    table = _table(kind == "l2", border, hr2, m2, p2)   # [B+pad, S]
    return table[:b].T
