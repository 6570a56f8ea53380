"""Hybrid fused backward for the WDSR-B wide bottleneck (expand->relu->decay).

The flagship model is HBM-bandwidth-bound, dominated by the BACKWARD pass
over the wide (x exp_rate) block activations: XLA's autodiff materializes
dz [N, C_mid] and the saved relu output per block.  The forward is left to
XLA (its pipelined fusion already moves only ~5 GB and beats a hand kernel),
while the backward is ONE Pallas kernel per block that recomputes the wide
intermediate tile-by-tile in VMEM and emits dx plus per-tile partial dW/db:

    z   = x @ W1 + b1 ; h = relu(z)          (recomputed, never stored)
    dz  = (dy @ W2^T) * (z > 0)
    dx  = dz @ W1^T
    dW1[i] = x_i^T dz_i   db1[i] = sum(dz_i)  (partials, summed by XLA)
    dW2[i] = h_i^T dy_i   db2[i] = sum(dy_i)

Partial (per-grid-step) dW outputs matter: accumulating into one
revisited output block serializes the pipeline (measured 62 ms); with
per-tile partials + an XLA-side sum the same kernel runs 4.5 ms vs XLA
autodiff's 5.75 ms for the block chain at N=557K.

Numerics: gradients match XLA/numpy exactly except at relu boundary rows
(|z| within bf16 noise of 0 — the terminal forces
--xla_allow_excess_precision, so every implementation's mask flips there;
subgradient choice at the kink is arbitrary for training).

STATUS — measured on v5e, flagship model, batch 128 (round 2,
tools/profile_stack.py + tools/trace_step.py):
- kernel level: this backward BEATS XLA autodiff 2x (25.6 vs 49.9 ms for
  all 12 block segments at N=557K);
- in an isolated stack-grad harness the single-boundary custom_vjp
  (ops/pallas_block_stack.py) also WINS slightly (177 vs 198 ms);
- in the FULL train step it still loses (150 vs 83 ms with the
  divisor-tile fix; 182 before).  The op trace shows the gap is pure data
  movement around the kernel calls — reshape 64 + copy 40 + pad 21 +
  slice 10 ms/step — i.e. layout transitions between the model's
  conv-native [B,H,W,T,C] activations and the kernel's flat [N,C]
  operands, not the boundary count and not the kernel itself.
Hence OPT-IN (fused=True / fused_stack=True).  RESOLVED in round 2: the
conv-native-layout kernel exists — ops/pallas_tstack.py speaks XLA's
batch-minor orientation, folds the 3^3 conv into the kernel as lane-shift
taps, and WINS in the full step (55 -> 43 ms/step bf16; bench.py).  This
module is kept as the measured record of why flat [N, C] operands lose.

Weight-norm reparameterization stays OUTSIDE the kernel (effective weights
are computed in traced JAX code, so v/g gradients chain automatically).
Enable per-block with WDSRBlock(fused=True) / build_model(fused_block=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 2048   # larger tiles exceed the 16 MB VMEM scoped limit

INTERPRET = False  # route pallas_call through the interpreter (CPU tests)


def _pick_tile(n: int, target: int = TILE_ROWS, max_tile: int = 2560) -> int:
    """Largest sublane-aligned divisor of n up to ``max_tile``.

    A tile that divides n exactly avoids the pad/concatenate + slice pair
    around every kernel call — measured at ~30 ms/step of pure data
    movement across the 12-block backward at flagship scale.  Falls back
    to ``target`` (with padding) when n has no usable divisor.  max_tile
    keeps the [tile, C_mid] f32 intermediates (3 live) within the ~16 MB
    VMEM budget; the flagship N=557,568 picks 2112 (grid 264).
    """
    best = 0
    for t in range(8, max_tile + 1, 8):
        if n % t == 0:
            best = t
    return best if best >= 512 else target


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    x = x_ref[...]
    dy = dy_ref[...].astype(jnp.float32)
    z = jnp.dot(x, w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = jnp.maximum(z, 0.0)
    dz = jnp.dot(dy, w2_ref[...].T, preferred_element_type=jnp.float32)
    dz = jnp.where(z > 0.0, dz, 0.0)

    dx_ref[...] = jnp.dot(dz, w1_ref[...].T,
                          preferred_element_type=jnp.float32
                          ).astype(dx_ref.dtype)
    dw1_ref[0] = jax.lax.dot_general(
        x.astype(jnp.float32), dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_ref[0] = jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[0] = jnp.sum(dz, axis=0, keepdims=True)
    db2_ref[0] = jnp.sum(dy, axis=0, keepdims=True)


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


def _bwd(x, w1, b1, w2, dy, interpret=False):
    tile = _pick_tile(x.shape[0])
    xp, n = _pad_rows(x, tile)
    dyp, _ = _pad_rows(dy, tile)
    np_, cin = xp.shape
    cmid = w1.shape[1]
    cout = w2.shape[1]
    grid = np_ // tile
    b1r = b1.reshape(1, cmid)
    dx, dw1p, db1p, dw2p, db2p = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cmid, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin, cmid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cmid), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cmid, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, cin), x.dtype),
            jax.ShapeDtypeStruct((grid, cin, cmid), jnp.float32),
            jax.ShapeDtypeStruct((grid, 1, cmid), jnp.float32),
            jax.ShapeDtypeStruct((grid, cmid, cout), jnp.float32),
            jax.ShapeDtypeStruct((grid, 1, cout), jnp.float32),
        ),
        interpret=interpret,
    )(xp, w1, b1r, w2, dyp)
    dx = dx if np_ == n else dx[:n]
    return (dx, dw1p.sum(axis=0), db1p.sum(axis=0)[0],
            dw2p.sum(axis=0), db2p.sum(axis=0)[0])


@jax.custom_vjp
def fused_expand_decay(x, w1, b1, w2, b2):
    """relu(x @ w1 + b1) @ w2 + b2 with the fused Pallas backward.

    x: [N, C_in]; w1: [C_in, C_mid]; w2: [C_mid, C_out].  Forward is plain
    XLA (its fusion wins); backward is one fused kernel (see module doc).
    """
    return jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2


def _vjp_fwd(x, w1, b1, w2, b2):
    return fused_expand_decay(x, w1, b1, w2, b2), (x, w1, b1, w2)


def _vjp_bwd(res, dy):
    x, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _bwd(x, w1, b1, w2, dy, interpret=INTERPRET)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(dy.dtype))


fused_expand_decay.defvjp(_vjp_fwd, _vjp_bwd)
