"""One fused backward for the WHOLE WDSR-B residual-block stack.

Round-1 measurements (ops/pallas_wide_block.py STATUS) showed the per-block
Pallas backward beats XLA autodiff at kernel level (4.5 vs 5.75 ms per
expand->relu->decay chain at N=557K) but LOSES at model level because every
block-level ``custom_vjp`` is an opaque boundary that defeats XLA's
cross-block fusion/layout planning (full step 83 -> 182 ms — and a pure-XLA
backward inside the same per-block boundary regresses identically).

This module keeps ONE boundary around the entire ``num_res_blocks`` stack
(reference hot loop: modelsTF.py:177-189 applied 12x):

- forward: plain XLA (its pipelined conv fusion wins), saving only each
  block's input x_i [N, C] and decay output d_i [N, C_dec] — NOT the
  exp_rate-wide relu activation, the model's dominant HBM traffic;
- backward: a reversed Python loop, all inside the single custom_vjp —
  per block, the k^3 conv's input/kernel grads via jax.vjp (XLA), then the
  fused Pallas kernel (pallas_wide_block._bwd) recomputes the wide
  intermediate tile-by-tile in VMEM and emits dx + per-tile partial dW.

Weight normalization stays outside: callers pass EFFECTIVE kernels
(WDSRBlock.effective_params), so v/g gradients chain through XLA autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from probav_tpu.ops import pallas_wide_block as pwb

_DIMS3 = ("NHWDC", "HWDIO", "NHWDC")


def _conv3d(d, wc, bc):
    y = lax.conv_general_dilated(d, wc, (1, 1, 1), "SAME",
                                 dimension_numbers=_DIMS3)
    return y + bc


def _block_fwd(x, p):
    """One WDSR-B block: x + conv3d(decay(relu(expand(x)))).

    Returns (block output, decay output) — the decay output is the conv's
    input, saved as a residual for the backward's conv kernel grad.
    """
    w1, b1, w2, b2, wc, bc = p
    c_in = x.shape[-1]
    flat = x.reshape(-1, c_in)
    d = jnp.maximum(flat @ w1 + b1, 0.0) @ w2 + b2
    d = d.reshape(x.shape[:-1] + (w2.shape[1],))
    return x + _conv3d(d, wc, bc), d


@jax.custom_vjp
def fused_block_stack(x, blocks):
    """Apply every block in ``blocks`` to x [B, H, W, T, C].

    blocks: tuple of per-block effective params (w1, b1, w2, b2, wc, bc)
    with w1 [C, C_mid], w2 [C_mid, C_dec], wc [kh, kw, kt, C_dec, C].
    """
    h = x
    for p in blocks:
        h, _ = _block_fwd(h, p)
    return h


def _stack_fwd(x, blocks):
    xs, ds = [], []
    h = x
    for p in blocks:
        xs.append(h)
        h, d = _block_fwd(h, p)
        ds.append(d)
    return h, (tuple(xs), tuple(ds), blocks)


def _stack_bwd(res, g):
    xs, ds, blocks = res
    dblocks = []
    for i in reversed(range(len(blocks))):
        w1, b1, w2, b2, wc, bc = blocks[i]
        # k^3 conv grads: XLA transposed conv (the conv is not the traffic
        # problem; its input is C_dec-narrow).
        _, conv_vjp = jax.vjp(_conv3d, ds[i], wc, bc)
        dd, dwc, dbc = conv_vjp(g)
        # Wide expand->relu->decay segment: fused Pallas backward.
        x_i = xs[i]
        dx2, dw1, db1, dw2, db2 = pwb._bwd(
            x_i.reshape(-1, x_i.shape[-1]),
            w1, b1, w2,
            dd.reshape(-1, dd.shape[-1]),
            interpret=pwb.INTERPRET)
        g = g + dx2.reshape(x_i.shape)
        dblocks.append((dw1.astype(w1.dtype), db1.astype(b1.dtype),
                        dw2.astype(w2.dtype), db2.astype(b2.dtype),
                        dwc, dbc))
    return g, tuple(reversed(dblocks))


fused_block_stack.defvjp(_stack_fwd, _stack_bwd)
