"""Fused Pallas kernel for the WDSR-B wide bottleneck (expand->relu->decay).

The flagship model is HBM-bandwidth-bound: the 1x1x1 expand conv writes a
[B*H*W*T, filters*exp_rate] activation (571 MB/block at batch 128 f32) that
the decay conv immediately re-reads, and autodiff stores it again for the
backward pass — measured ~60% of the 62 GB/step the XLA graph moves.  Both
convs are pure matmuls over the position axis, so this kernel streams row
tiles through VMEM and chains

    z = x @ W1 + b1 ; h = relu(z) ; y = h @ W2 + b2

on the MXU without ever materializing ``h`` in HBM.  The custom VJP
recomputes ``h`` tile-by-tile in the backward kernel (flops are free here)
and accumulates dW/db across the sequential TPU grid:

    dz  = (dy @ W2^T) * (z > 0)
    dx  = dz @ W1^T          dW1 = x^T dz    db1 = sum(dz)
    dW2 = h^T dy             db2 = sum(dy)

Weight-norm reparameterization stays OUTSIDE the kernel (effective weights
are computed in traced JAX code, so v/g gradients chain automatically).

STATUS: numerically verified on hardware (fwd bit-exact vs the unfused
model, isolated VJP parity ~1e-7) but OPT-IN and currently SLOWER than
XLA's own fusion: measured on v5e at batch 128, XLA's forward moves only
~5 GB (it pipelines the wide intermediate), while this kernel's 2048-row
tiles underutilize the MXU (K=32, N=25 contractions) and the reshape at
the pallas boundary forces layout conversions — full-step 725 patches/s
fused vs 1544 unfused.  Kept as the scaffold for a future tile-optimized
revision; enable per-block with WDSRBlock(fused=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 2048


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    z = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = jnp.maximum(z, 0.0)
    y = jnp.dot(h, w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)

    x = x_ref[...]
    dy = dy_ref[...].astype(jnp.float32)
    z = jnp.dot(x, w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = jnp.maximum(z, 0.0)
    dz = jnp.dot(dy, w2_ref[...].T,
                 preferred_element_type=jnp.float32)
    dz = jnp.where(z > 0.0, dz, 0.0)

    dx_ref[...] = jnp.dot(dz, w1_ref[...].T,
                          preferred_element_type=jnp.float32
                          ).astype(dx_ref.dtype)

    # Cross-tile accumulators (TPU grid runs sequentially on one core).
    dw1 = jax.lax.dot_general(x.astype(jnp.float32), dz,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(h, dy, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dz, axis=0, keepdims=True)
    db2 = jnp.sum(dy, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = dw1
        dw2_ref[...] = dw2
        db1_ref[...] = db1
        db2_ref[...] = db2

    @pl.when(i > 0)
    def _():
        dw1_ref[...] += dw1
        dw2_ref[...] += dw2
        db1_ref[...] += db1
        db2_ref[...] += db2


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


def _fwd(x, w1, b1, w2, b2, interpret=False):
    xp, n = _pad_rows(x, TILE_ROWS)
    np_, cin = xp.shape
    cmid = w1.shape[1]
    cout = w2.shape[1]
    b1r = b1.reshape(1, cmid)
    b2r = b2.reshape(1, cout)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(np_ // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, cout), x.dtype),
        interpret=interpret,
    )(xp, w1, b1r, w2, b2r)
    return y[:n]


def _bwd(x, w1, b1, w2, dy, interpret=False):
    xp, n = _pad_rows(x, TILE_ROWS)
    dyp, _ = _pad_rows(dy, TILE_ROWS)
    np_, cin = xp.shape
    cmid = w1.shape[1]
    cout = w2.shape[1]
    b1r = b1.reshape(1, cmid)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(np_ // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_ROWS, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, cin), x.dtype),
            jax.ShapeDtypeStruct((cin, cmid), jnp.float32),
            jax.ShapeDtypeStruct((1, cmid), jnp.float32),
            jax.ShapeDtypeStruct((cmid, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        interpret=interpret,
    )(xp, w1, b1r, w2, dyp)
    return dx[:n], dw1, db1.reshape(-1), dw2, db2.reshape(-1)


INTERPRET = False


@jax.custom_vjp
def fused_expand_decay(x, w1, b1, w2, b2):
    """relu(x @ w1 + b1) @ w2 + b2 without materializing the wide tensor.

    x: [N, C_in]; w1: [C_in, C_mid]; w2: [C_mid, C_out].
    """
    return _fwd(x, w1, b1, w2, b2, interpret=INTERPRET)


def _vjp_fwd(x, w1, b1, w2, b2):
    return _fwd(x, w1, b1, w2, b2, interpret=INTERPRET), (x, w1, b1, w2)


def _vjp_bwd(res, dy):
    x, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _bwd(x, w1, b1, w2, dy, interpret=INTERPRET)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(dy.dtype))


fused_expand_decay.defvjp(_vjp_fwd, _vjp_bwd)
