"""Fully-fused WDSR-B block stack in XLA's native activation orientation.

Round-2 profiling (tools/trace_groups.py) showed the bf16 train step is
~93% WDSR-B stack time, all of it wide-activation HBM traffic: per block
XLA writes the [*, 256] expand activation, bit-packs its relu mask, reads
it back for the decay conv and twice more for the dW/dx backward, and
materializes the wide dz — ~2 GB of HBM per block per step.  The round-1
flat [N, C] kernels (ops/pallas_wide_block.py) eliminated that traffic at
kernel level but lost at model level to layout conversions: XLA stores
narrow-channel activations BATCH-minor (`{0,4,3,2,1}`, B=128 exactly
filling the 128 lanes) while a flat [N, C] Pallas operand demands a
row-major C-minor relayout (and pads 32 channels to 128 lanes — 4x).

This module therefore speaks XLA's own orientation.  Every activation is a
2D ``[C, S*B]`` array — channels in sublanes, (spatial-position, batch) in
lanes, batch minor — which matches XLA's preferred layout of the 5D conv
activation byte-for-byte, so entering/leaving the fused domain is nearly
free.  Design points (each measured against a v1 that did it differently):

- every matmul is a plain 2D MXU dot: channels contract or ride sublanes,
  the (spatial, batch) product rides the 128 lanes;
- the spatial domain is padded in W and T (``[H, W+2, T+2]``): the 3^3
  SAME conv's 27 taps become pure lane shifts ``(dh*W2*T2 + dw*T2 + dt)*B``
  with NO per-tap edge masks — W/T wrap-arounds land in the zero pad
  lanes, H wrap-arounds land in the zero halo of the conv operand (H is
  the outermost spatial dim).  One static interior mask re-zeros the pad
  lanes per kernel.  (v1 computed 27 iota-derived masks per chunk — the
  mask multiplies alone cost ~1 ms/block.);
- the 27 taps are CONCATENATED into one K=27*32 dot per chunk instead of
  27 K=25 dots (which ran at ~5% MXU utilization);
- dots are oriented so small channel dims (25/32) sit in SUBLANES of the
  output (pad to 8) rather than lanes (pad to 128);
- the [*, 256] expand activation exists ONLY as per-chunk VMEM values, in
  both forward and backward (backward recomputes it, saving nothing wide).

Per-block HBM traffic drops from ~2 GB to ~0.4 GB (x, d, g, dx, dd plus
halo overlap — no wide tensors, no relayouts, no bit-packed masks).

Reference semantics covered: the WDSR-B residual block
(/root/reference/models/modelsTF.py:177-189) — expand 1x1x1 conv x8 +
relu, decay 1x1x1 conv, 3^3 SAME conv, residual add — applied
``num_res_blocks`` times.  Weight normalization stays outside (callers
pass effective kernels, so v/g gradients chain through traced XLA code).

Set ``INTERPRET = True`` to run through the Pallas interpreter (CPU tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

_F32 = jnp.float32
_VMEM_LIMIT = 100 * 2 ** 20
_SUB = 32        # sublane stride for concatenated tap pieces


class Geom(NamedTuple):
    """Static geometry: true spatial dims, batch, tile split."""
    H: int
    W: int
    T: int
    B: int          # batch = lanes per spatial position (minor dim)
    rows: int       # padded-domain spatial positions per grid tile
    ch_rows: int    # positions per in-kernel chunk

    @property
    def W2(self):
        return self.W + 2

    @property
    def T2(self):
        return self.T + 2

    @property
    def S(self):
        """Padded-domain spatial positions."""
        return self.H * self.W2 * self.T2

    @property
    def L(self):
        return self.rows * self.B          # lanes per tile

    @property
    def CH(self):
        return self.ch_rows * self.B       # lanes per chunk

    @property
    def halo(self):
        return (self.W2 * self.T2 + self.T2 + 1) * self.B

    @property
    def grid(self):
        return self.S // self.rows


def _divisor_near(n: int, target: int) -> int:
    best, bd = 1, n
    for d in range(1, n + 1):
        if n % d == 0 and abs(d - target) < bd:
            best, bd = d, abs(d - target)
    return best


def make_geom(H: int, W: int, T: int, B: int,
              target_rows: int = 484, target_ch: int = 48,
              itemsize: int = 2) -> Geom:
    """itemsize scales the tile down so f32 windows fit in VMEM."""
    scale = max(1, itemsize // 2)
    S = H * (W + 2) * (T + 2)
    rows = _divisor_near(S, target_rows // scale)
    ch_rows = _divisor_near(rows, target_ch // scale)
    return Geom(H, W, T, B, rows, ch_rows)


TAPS = tuple((dh, dw, dt) for dh in (-1, 0, 1) for dw in (-1, 0, 1)
             for dt in (-1, 0, 1))


def _tap_off(g: Geom, dh: int, dw: int, dt: int) -> int:
    return (dh * g.W2 * g.T2 + dw * g.T2 + dt) * g.B


def interior_mask(g: Geom, dtype) -> jnp.ndarray:
    """[1, S*B] — 1 on true (h, w, t) positions, 0 on W/T pad lanes."""
    import numpy as np
    m = np.zeros((g.H, g.W2, g.T2), np.float32)
    m[:, 1:-1, 1:-1] = 1.0
    m = np.repeat(m.reshape(-1), g.B)
    return jnp.asarray(m.reshape(1, -1), dtype)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=_F32)


# ---------------------------------------------------------------------- #
# weight packing for the concatenated-tap dots                            #
# ---------------------------------------------------------------------- #

def _pack_wc_fwd(wc, c_dec, c_out, dtype):
    """[3,3,3,C_dec,C_out] -> [27*_SUB, C_out], zero pad rows."""
    w = wc.reshape(27, c_dec, c_out).astype(dtype)
    w = jnp.pad(w, ((0, 0), (0, _SUB - c_dec), (0, 0)))
    return w.reshape(27 * _SUB, c_out)


def _pack_wc_bwd(wc, c_dec, c_out, dtype):
    """[3,3,3,C_dec,C_out] -> [C_dec, 27*_SUB] (tap-major columns)."""
    w = wc.reshape(27, c_dec, c_out).astype(dtype)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, _SUB - c_out)))
    return jnp.transpose(w, (1, 0, 2)).reshape(c_dec, 27 * _SUB)


# ---------------------------------------------------------------------- #
# K1: segment forward  x [C_in, L] -> d [C_dec, L]                        #
# ---------------------------------------------------------------------- #

def _seg_fwd_kernel(g: Geom, x_ref, im_ref, w1t_ref, b1_ref, w2t_ref,
                    b2_ref, d_ref):
    w1t = w1t_ref[...]
    w2t = w2t_ref[...]
    b1 = b1_ref[...]
    b2 = b2_ref[...]
    for k in range(g.L // g.CH):
        c0 = k * g.CH
        xc = x_ref[:, c0:c0 + g.CH]
        z = _dot(w1t, xc, ((1,), (0,))) + b1
        h = jnp.maximum(z, 0.0).astype(d_ref.dtype)
        d = _dot(w2t, h, ((1,), (0,))) + b2
        d = d * im_ref[:, c0:c0 + g.CH].astype(_F32)
        d_ref[:, c0:c0 + g.CH] = d.astype(d_ref.dtype)


def seg_fwd(g: Geom, x, imask, w1, b1, w2, b2):
    c_in, c_mid = w1.shape
    c_dec = w2.shape[1]
    kern = functools.partial(_seg_fwd_kernel, g)
    return pl.pallas_call(
        kern,
        grid=(g.grid,),
        in_specs=[
            pl.BlockSpec((c_in, g.L), lambda i: (0, i)),
            pl.BlockSpec((1, g.L), lambda i: (0, i)),
            pl.BlockSpec((c_mid, c_in), lambda i: (0, 0)),
            pl.BlockSpec((c_mid, 1), lambda i: (0, 0)),
            pl.BlockSpec((c_dec, c_mid), lambda i: (0, 0)),
            pl.BlockSpec((c_dec, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c_dec, g.L), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c_dec, g.S * g.B), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(x, imask, w1.T.astype(x.dtype), b1.reshape(-1, 1).astype(_F32),
      w2.T.astype(x.dtype), b2.reshape(-1, 1).astype(_F32))


# ---------------------------------------------------------------------- #
# K2: conv forward  d [C_dec, L(+halo)], x [C_out, L] -> out [C_out, L]   #
# ---------------------------------------------------------------------- #

def _conv_fwd_kernel(g: Geom, dwin_ref, x_ref, im_ref, wcat_ref, bc_ref,
                     o_ref, dcat_ref):
    c_dec = dwin_ref.shape[0]
    bc = bc_ref[...]
    # Tap pieces occupy rows [32k, 32k+c_dec); rows [32k+c_dec, 32k+32)
    # are never written — zero them once (their weights are zero too, but
    # uninitialized VMEM may hold NaNs and 0*NaN poisons the dot).
    if c_dec < _SUB:
        for k in range(27):
            dcat_ref[k * _SUB + c_dec:(k + 1) * _SUB, :] = jnp.zeros(
                (_SUB - c_dec, dcat_ref.shape[1]), dcat_ref.dtype)
    for k in range(g.L // g.CH):
        c0 = k * g.CH
        for ti, (dh, dw, dt) in enumerate(TAPS):
            start = g.halo + c0 + _tap_off(g, dh, dw, dt)
            dcat_ref[ti * _SUB:ti * _SUB + c_dec, :] = \
                dwin_ref[:, start:start + g.CH]
        acc = _dot(wcat_ref[...], dcat_ref[...], ((0,), (0,)))
        out = acc + bc + x_ref[:, c0:c0 + g.CH].astype(_F32)
        out = out * im_ref[:, c0:c0 + g.CH].astype(_F32)
        o_ref[:, c0:c0 + g.CH] = out.astype(o_ref.dtype)


def conv_fwd(g: Geom, d, x, wc, bc, imask):
    """d [C_dec, S*B]; x [C_out, S*B]; wc [3,3,3,C_dec,C_out]."""
    c_dec = d.shape[0]
    c_out = x.shape[0]
    dpad = jnp.pad(d, ((0, 0), (g.halo, g.halo)))
    wcat = _pack_wc_fwd(wc, c_dec, c_out, d.dtype)
    win = g.L + 2 * g.halo
    kern = functools.partial(_conv_fwd_kernel, g)
    return pl.pallas_call(
        kern,
        grid=(g.grid,),
        in_specs=[
            pl.BlockSpec((pl.Element(c_dec), pl.Element(win)),
                         lambda i: (0, i * g.L)),
            pl.BlockSpec((c_out, g.L), lambda i: (0, i)),
            pl.BlockSpec((1, g.L), lambda i: (0, i)),
            pl.BlockSpec((27 * _SUB, c_out), lambda i: (0, 0)),
            pl.BlockSpec((c_out, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c_out, g.L), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c_out, g.S * g.B), x.dtype),
        scratch_shapes=[pltpu.VMEM((27 * _SUB, g.CH), d.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(dpad, x, imask, wcat, bc.reshape(-1, 1).astype(_F32))


# ---------------------------------------------------------------------- #
# K2b: conv backward                                                      #
#   g [C_out, L(+halo)], d [C_dec, L(+halo)] -> dd [C_dec, L],            #
#   dWc^T partials [grid, C_out, 27*_SUB]                                 #
# ---------------------------------------------------------------------- #

def _conv_bwd_kernel(g: Geom, gwin_ref, dwin_ref, im_ref, wdd_ref,
                     dd_ref, dwc_ref, gcat_ref, dcat_ref):
    c_dec = dwin_ref.shape[0]
    c_out = gwin_ref.shape[0]
    if c_dec < _SUB:
        for k in range(27):
            dcat_ref[k * _SUB + c_dec:(k + 1) * _SUB, :] = jnp.zeros(
                (_SUB - c_dec, dcat_ref.shape[1]), dcat_ref.dtype)
    if c_out < _SUB:
        for k in range(27):
            gcat_ref[k * _SUB + c_out:(k + 1) * _SUB, :] = jnp.zeros(
                (_SUB - c_out, gcat_ref.shape[1]), gcat_ref.dtype)
    dwc_acc = _F32(0.0)
    for k in range(g.L // g.CH):
        c0 = k * g.CH
        for ti, (dh, dw, dt) in enumerate(TAPS):
            off = _tap_off(g, dh, dw, dt)
            # dd at lane l sums wc_tap^T @ g(l - off); dWc_tap sums
            # d(l + off) x g(l)^T.  g is already zero on pad lanes.
            gcat_ref[ti * _SUB:ti * _SUB + c_out, :] = \
                gwin_ref[:, g.halo + c0 - off:g.halo + c0 - off + g.CH]
            dcat_ref[ti * _SUB:ti * _SUB + c_dec, :] = \
                dwin_ref[:, g.halo + c0 + off:g.halo + c0 + off + g.CH]
        dd = _dot(wdd_ref[...], gcat_ref[...], ((1,), (0,)))
        dd = dd * im_ref[:, c0:c0 + g.CH].astype(_F32)
        dd_ref[:, c0:c0 + g.CH] = dd.astype(dd_ref.dtype)
        gc = gwin_ref[:, g.halo + c0:g.halo + c0 + g.CH]
        dwc_acc = dwc_acc + _dot(gc, dcat_ref[...], ((1,), (1,)))
    dwc_ref[0] = dwc_acc


def conv_bwd(g: Geom, gy, d, wc, imask):
    """gy, d [*, S*B] -> (dd [C_dec, S*B], dwc [3,3,3,C_dec,C_out])."""
    c_dec = d.shape[0]
    c_out = gy.shape[0]
    gpad = jnp.pad(gy, ((0, 0), (g.halo, g.halo)))
    dpad = jnp.pad(d, ((0, 0), (g.halo, g.halo)))
    wdd = _pack_wc_bwd(wc, c_dec, c_out, gy.dtype)
    win = g.L + 2 * g.halo
    kern = functools.partial(_conv_bwd_kernel, g)
    dd, dwc_p = pl.pallas_call(
        kern,
        grid=(g.grid,),
        in_specs=[
            pl.BlockSpec((pl.Element(c_out), pl.Element(win)),
                         lambda i: (0, i * g.L)),
            pl.BlockSpec((pl.Element(c_dec), pl.Element(win)),
                         lambda i: (0, i * g.L)),
            pl.BlockSpec((1, g.L), lambda i: (0, i)),
            pl.BlockSpec((c_dec, 27 * _SUB), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((c_dec, g.L), lambda i: (0, i)),
            pl.BlockSpec((1, c_out, 27 * _SUB), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_dec, g.S * g.B), gy.dtype),
            jax.ShapeDtypeStruct((g.grid, c_out, 27 * _SUB), _F32),
        ),
        scratch_shapes=[pltpu.VMEM((27 * _SUB, g.CH), gy.dtype),
                        pltpu.VMEM((27 * _SUB, g.CH), d.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(gpad, dpad, imask, wdd)
    # [C_out, 27*_SUB] -> [27, C_dec, C_out] -> [3,3,3,C_dec,C_out]
    dwc_t = dwc_p.sum(axis=0).reshape(c_out, 27, _SUB)[:, :, :c_dec]
    dwc = jnp.transpose(dwc_t, (1, 2, 0)).reshape(3, 3, 3, c_dec, c_out)
    return dd, dwc


# ---------------------------------------------------------------------- #
# K1b: segment backward                                                   #
#   x, dd, gy [*, L] -> dx (= segment dx + gy), dW1/dW2^T/db1 partials    #
# ---------------------------------------------------------------------- #

def _seg_bwd_kernel(g: Geom, x_ref, dd_ref, gy_ref, w1t_ref, b1_ref,
                    w1_ref, w2_ref, dx_ref, dw1_ref, dw2t_ref, db1_ref):
    w1t = w1t_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    b1 = b1_ref[...]
    dw1_acc = _F32(0.0)
    dw2t_acc = _F32(0.0)
    db1_acc = _F32(0.0)
    dt_ = dx_ref.dtype
    for k in range(g.L // g.CH):
        c0 = k * g.CH
        xc = x_ref[:, c0:c0 + g.CH]
        ddc = dd_ref[:, c0:c0 + g.CH]
        z = _dot(w1t, xc, ((1,), (0,))) + b1
        dz = _dot(w2, ddc, ((1,), (0,)))
        dz = jnp.where(z > 0.0, dz, 0.0).astype(dt_)
        dx = _dot(w1, dz, ((1,), (0,)))
        dx_ref[:, c0:c0 + g.CH] = (
            dx + gy_ref[:, c0:c0 + g.CH].astype(_F32)).astype(dt_)
        dw1_acc = dw1_acc + _dot(xc, dz, ((1,), (1,)))
        h = jnp.maximum(z, 0.0).astype(dt_)
        dw2t_acc = dw2t_acc + _dot(ddc, h, ((1,), (1,)))
        db1_acc = db1_acc + jnp.sum(dz.astype(_F32), axis=1,
                                    keepdims=True)
    dw1_ref[0] = dw1_acc
    dw2t_ref[0] = dw2t_acc
    db1_ref[0] = db1_acc


def seg_bwd(g: Geom, x, dd, gy, w1, b1, w2):
    c_in, c_mid = w1.shape
    c_dec = w2.shape[1]
    kern = functools.partial(_seg_bwd_kernel, g)
    dx, dw1_p, dw2t_p, db1_p = pl.pallas_call(
        kern,
        grid=(g.grid,),
        in_specs=[
            pl.BlockSpec((c_in, g.L), lambda i: (0, i)),
            pl.BlockSpec((c_dec, g.L), lambda i: (0, i)),
            pl.BlockSpec((c_in, g.L), lambda i: (0, i)),
            pl.BlockSpec((c_mid, c_in), lambda i: (0, 0)),
            pl.BlockSpec((c_mid, 1), lambda i: (0, 0)),
            pl.BlockSpec((c_in, c_mid), lambda i: (0, 0)),
            pl.BlockSpec((c_mid, c_dec), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((c_in, g.L), lambda i: (0, i)),
            pl.BlockSpec((1, c_in, c_mid), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c_dec, c_mid), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c_mid, 1), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_in, g.S * g.B), x.dtype),
            jax.ShapeDtypeStruct((g.grid, c_in, c_mid), _F32),
            jax.ShapeDtypeStruct((g.grid, c_dec, c_mid), _F32),
            jax.ShapeDtypeStruct((g.grid, c_mid, 1), _F32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
    )(x, dd, gy, w1.T.astype(x.dtype), b1.reshape(-1, 1).astype(_F32),
      w1.astype(x.dtype), w2.astype(x.dtype))
    return (dx, dw1_p.sum(axis=0), dw2t_p.sum(axis=0).T,
            db1_p.sum(axis=0)[:, 0])


# ---------------------------------------------------------------------- #
# whole-stack custom_vjp                                                  #
# ---------------------------------------------------------------------- #

def _block_fwd(g: Geom, x, im, p):
    w1, b1, w2, b2, wc, bc = p
    d = seg_fwd(g, x, im, w1, b1, w2, b2)
    out = conv_fwd(g, d, x, wc, bc, im)
    return out, d


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_stack_t(g: Geom, x, blocks):
    """Apply all WDSR-B blocks to x [C, S*B] (padded-WT orientation).

    x must be zero on the W/T pad lanes.  blocks: tuple of per-block
    effective params (w1 [C, C_mid], b1, w2 [C_mid, C_dec], b2,
    wc [3,3,3,C_dec,C], bc).
    """
    im = interior_mask(g, x.dtype)
    h = x
    for p in blocks:
        h, _ = _block_fwd(g, h, im, p)
    return h


def _stack_fwd(g: Geom, x, blocks):
    im = interior_mask(g, x.dtype)
    xs, ds = [], []
    h = x
    for p in blocks:
        xs.append(h)
        h, d = _block_fwd(g, h, im, p)
        ds.append(d)
    return h, (tuple(xs), tuple(ds), blocks)


def _stack_bwd(g: Geom, res, gy):
    xs, ds, blocks = res
    im = interior_mask(g, gy.dtype)
    gy = gy * im.astype(gy.dtype)   # cotangent may be junk on pad lanes
    dblocks = []
    for i in reversed(range(len(blocks))):
        w1, b1, w2, b2, wc, bc = blocks[i]
        dd, dwc = conv_bwd(g, gy, ds[i], wc, im)
        dbc = jnp.sum(gy, axis=1).astype(_F32)
        db2 = jnp.sum(dd, axis=1).astype(_F32)
        gy, dw1, dw2, db1 = seg_bwd(g, xs[i], dd, gy, w1, b1, w2)
        dblocks.append((dw1.astype(w1.dtype), db1.astype(b1.dtype),
                        dw2.astype(w2.dtype), db2.astype(b2.dtype),
                        dwc.astype(wc.dtype), dbc.astype(bc.dtype)))
    return gy, tuple(reversed(dblocks))


fused_stack_t.defvjp(_stack_fwd, _stack_bwd)


# ---------------------------------------------------------------------- #
# 5D <-> transposed padded-2D adapters                                    #
# ---------------------------------------------------------------------- #

def to_t(x5d):
    """[B, H, W, T, C] -> [C, H*(W+2)*(T+2)*B], zero W/T pad lanes."""
    b, h, w, t, c = x5d.shape
    xp = jnp.pad(x5d, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.transpose(xp, (4, 1, 2, 3, 0)).reshape(
        c, h * (w + 2) * (t + 2) * b)


def from_t(x2d, b, h, w, t):
    c = x2d.shape[0]
    x5 = x2d.reshape(c, h, w + 2, t + 2, b)[:, :, 1:-1, 1:-1, :]
    return jnp.transpose(x5, (4, 1, 2, 3, 0))


def stack_apply_5d(x5d, blocks, target_rows: int = 484,
                   target_ch: int = 48):
    """Convenience: run the fused stack on a [B, H, W, T, C] batch."""
    b, h, w, t, _ = x5d.shape
    g = make_geom(h, w, t, b, target_rows, target_ch,
                  itemsize=jnp.dtype(x5d.dtype).itemsize)
    out = fused_stack_t(g, to_t(x5d), blocks)
    return from_t(out, b, h, w, t)
