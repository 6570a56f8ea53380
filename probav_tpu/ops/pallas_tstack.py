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
2D ``[C, ext]`` array — channels in sublanes, (spatial-position, batch) in
lanes, batch minor — matching XLA's preferred layout of the 5D conv
activation, so entering/leaving the fused domain is nearly free.  Design
points (each measured against a version that did it differently):

- every matmul is a plain 2D MXU dot: channels contract or ride sublanes,
  the (spatial, batch) product rides the 128 lanes;
- the spatial domain is padded in W and T (``[H, W+2, T+2]``): the 3^3
  SAME conv's 27 taps become pure lane shifts ``(dh*W2*T2 + dw*T2 + dt)*B``
  with NO per-tap edge masks — W/T wrap-arounds land in the zero pad
  lanes, H wrap-arounds land in the zero halo margins (H is the outermost
  spatial dim).  One static interior mask re-zeros the pad lanes per
  kernel.  (A version computing 27 iota-derived masks per chunk spent
  ~1 ms/block on the mask multiplies alone.);
- activations carry PERSISTENT zero halo margins (``mtiles`` whole tiles
  on each side) so conv windows never need a per-block jnp.pad — the
  margins are zeroed once at stack entry and every kernel's interior-mask
  multiply keeps them zero (a jnp.pad per conv call cost 3.5 ms/step);
- the 27 taps are CONCATENATED into single K=27*32 dots per chunk instead
  of 27 K=25 dots (which ran at ~5% MXU utilization);
- dots are oriented so small channel dims (25/32) sit in SUBLANES of the
  output (pad to 8) rather than lanes (pad to 128);
- the whole backward of a block is ONE kernel: conv-transpose taps, the
  expand/relu recompute, dz, dx and ALL weight/bias gradient partials —
  the decay activation's cotangent never touches HBM;
- the [*, 256] expand activation exists ONLY as per-chunk VMEM values, in
  both forward and backward (backward recomputes it, saving nothing wide).

Reference semantics covered: the WDSR-B residual block
(/root/reference/models/modelsTF.py:177-189) — expand 1x1x1 conv x8 +
relu, decay 1x1x1 conv, 3^3 SAME conv, residual add — applied
``num_res_blocks`` times.  Weight normalization stays outside (callers
pass effective kernels, so v/g gradients chain through traced XLA code).

Set ``INTERPRET = True`` to run through the Pallas interpreter (CPU tests).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

_F32 = jnp.float32
_VMEM_LIMIT = 100 * 2 ** 20
def _sub(*chans):
    """Sublane stride for concatenated tap pieces: smallest multiple of
    the 8-sublane granularity holding every involved channel count (32
    for the flagship's 25/32; 56 for the 64-filter model's 51)."""
    return -(-max(chans) // 8) * 8


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
        """Padded-domain spatial positions (margins excluded)."""
        return self.H * self.W2 * self.T2

    @property
    def L(self):
        return self.rows * self.B          # lanes per tile

    @property
    def CH(self):
        return self.ch_rows * self.B       # lanes per chunk

    @property
    def halo(self):
        """Lanes a conv window reaches beyond its tile."""
        return (self.W2 * self.T2 + self.T2 + 1) * self.B

    @property
    def mtiles(self):
        """Whole margin tiles per side covering the halo."""
        return -(-self.halo // self.L)

    @property
    def margin(self):
        return self.mtiles * self.L

    @property
    def ext(self):
        """Extended lane count: margin | S*B | margin."""
        return self.S * self.B + 2 * self.margin

    @property
    def grid(self):
        return self.ext // self.L


def _divisor_near(n: int, target: int) -> int:
    best, bd = 1, n
    for d in range(1, n + 1):
        if n % d == 0 and abs(d - target) < bd:
            best, bd = d, abs(d - target)
    return best


def make_geom(H: int, W: int, T: int, B: int,
              target_rows: int = None, target_ch: int = None,
              itemsize: int = 2, width: int = 32) -> Geom:
    """itemsize and channel width scale the tile down so f32 and/or
    wide-model (64-filter) windows fit in VMEM.

    Default targets are per-width measured optima (tools/geom_sweep.py,
    on-chip): (363, 33) at the flagship 32-filter width (all dtypes);
    (242, 22) — effective tiles (121, 11) after the VMEM scale — at
    64 filters, where the flagship-derived tile measured 101.1 ms/stack
    vs 95.2 ms (BENCH_NOTES.md, round 4)."""
    scale = max(1, itemsize // 2) * max(1, width // 32)
    wide = width >= 64
    if target_rows is None:
        target_rows = 242 if wide else 363
    if target_ch is None:
        target_ch = 22 if wide else 33
    S = H * (W + 2) * (T + 2)
    rows = _divisor_near(S, max(1, target_rows // scale))
    ch_rows = _divisor_near(rows, max(1, target_ch // scale))
    return Geom(H, W, T, B, rows, ch_rows)


TAPS = tuple((dh, dw, dt) for dh in (-1, 0, 1) for dw in (-1, 0, 1)
             for dt in (-1, 0, 1))


def _tap_off(g: Geom, dh: int, dw: int, dt: int) -> int:
    return (dh * g.W2 * g.T2 + dw * g.T2 + dt) * g.B


def interior_mask(g: Geom, dtype) -> jnp.ndarray:
    """[1, ext] — 1 on true (h, w, t) positions, 0 on pads and margins."""
    import numpy as np
    m = np.zeros((g.H, g.W2, g.T2), np.float32)
    m[:, 1:-1, 1:-1] = 1.0
    m = np.repeat(m.reshape(-1), g.B)
    m = np.pad(m, (g.margin, g.margin))
    return jnp.asarray(m.reshape(1, -1), dtype)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=_F32)


def _win_index_map(g: Geom, win: int):
    """Clamped window start for tile i (margin tiles would reach outside
    the array; their outputs are zeroed by the interior mask anyway).
    The clamp runs in units of the common lane granularity so Mosaic can
    prove the 128-lane tiling divides the offset."""
    gran = math.gcd(math.gcd(g.L, g.halo), g.ext - win)

    def index_map(i):
        return (0, jnp.clip(i * (g.L // gran) - g.halo // gran,
                            0, (g.ext - win) // gran) * gran)

    return index_map


# ---------------------------------------------------------------------- #
# weight packing for the concatenated-tap dots                            #
# ---------------------------------------------------------------------- #

def _pack_wc_fwd(wc, c_dec, c_out, dtype, sub):
    """[3,3,3,C_dec,C_out] -> [27*sub, C_out], zero pad rows."""
    w = wc.reshape(27, c_dec, c_out).astype(dtype)
    w = jnp.pad(w, ((0, 0), (0, sub - c_dec), (0, 0)))
    return w.reshape(27 * sub, c_out)


def _pack_wc_bwd(wc, c_dec, c_out, dtype, sub):
    """[3,3,3,C_dec,C_out] -> [C_dec, 27*sub] (tap-major columns)."""
    w = wc.reshape(27, c_dec, c_out).astype(dtype)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, sub - c_out)))
    return jnp.transpose(w, (1, 0, 2)).reshape(c_dec, 27 * sub)


def _zero_pad_rows(cat_ref, c_used, sub):
    """Zero the unwritten sublane rows of a tap-concat scratch once —
    their weights are zero, but uninitialized VMEM may hold NaNs and
    0*NaN would poison the dot."""
    if c_used < sub:
        for k in range(27):
            cat_ref[k * sub + c_used:(k + 1) * sub, :] = jnp.zeros(
                (sub - c_used, cat_ref.shape[1]), cat_ref.dtype)


# ---------------------------------------------------------------------- #
# K1: segment forward  x [C_in, ext] -> d [C_dec, ext]                    #
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
        out_shape=jax.ShapeDtypeStruct((c_dec, g.ext), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        name="tstack_seg_fwd",
        interpret=INTERPRET,
    )(x, imask, w1.T.astype(x.dtype), b1.reshape(-1, 1).astype(_F32),
      w2.T.astype(x.dtype), b2.reshape(-1, 1).astype(_F32))


# ---------------------------------------------------------------------- #
# K2: conv forward  d, x [*, ext] -> out [C_out, ext]                     #
# ---------------------------------------------------------------------- #

def _conv_fwd_kernel(g: Geom, sub: int, dwin_ref, x_ref, im_ref,
                     wcat_ref, bc_ref, o_ref, dcat_ref):
    c_dec = dwin_ref.shape[0]
    bc = bc_ref[...]
    _zero_pad_rows(dcat_ref, c_dec, sub)
    for k in range(g.L // g.CH):
        c0 = k * g.CH
        for ti, (dh, dw, dt) in enumerate(TAPS):
            start = g.halo + c0 + _tap_off(g, dh, dw, dt)
            dcat_ref[ti * sub:ti * sub + c_dec, :] = \
                dwin_ref[:, start:start + g.CH]
        acc = _dot(wcat_ref[...], dcat_ref[...], ((0,), (0,)))
        out = acc + bc + x_ref[:, c0:c0 + g.CH].astype(_F32)
        out = out * im_ref[:, c0:c0 + g.CH].astype(_F32)
        o_ref[:, c0:c0 + g.CH] = out.astype(o_ref.dtype)


def conv_fwd(g: Geom, d, x, wc, bc, imask):
    """d [C_dec, ext]; x [C_out, ext]; wc [3,3,3,C_dec,C_out]."""
    c_dec = d.shape[0]
    c_out = x.shape[0]
    sub = _sub(c_dec)
    wcat = _pack_wc_fwd(wc, c_dec, c_out, d.dtype, sub)
    win = g.L + 2 * g.halo
    kern = functools.partial(_conv_fwd_kernel, g, sub)
    return pl.pallas_call(
        kern,
        grid=(g.grid,),
        in_specs=[
            # margin tiles would reach outside the array; clamp them —
            # their outputs are zeroed by the interior mask anyway.
            pl.BlockSpec((pl.Element(c_dec), pl.Element(win)),
                         _win_index_map(g, win)),
            pl.BlockSpec((c_out, g.L), lambda i: (0, i)),
            pl.BlockSpec((1, g.L), lambda i: (0, i)),
            pl.BlockSpec((27 * sub, c_out), lambda i: (0, 0)),
            pl.BlockSpec((c_out, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c_out, g.L), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c_out, g.ext), x.dtype),
        scratch_shapes=[pltpu.VMEM((27 * sub, g.CH), d.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        name="tstack_conv_fwd",
        interpret=INTERPRET,
    )(d, x, imask, wcat, bc.reshape(-1, 1).astype(_F32))


# ---------------------------------------------------------------------- #
# K3b: whole-block backward                                               #
#   g, d, x [*, ext] -> dx [C_in, ext] plus per-tile partials for         #
#   dWc^T, dW1, dW2^T, db1, db2, dbc                                      #
# ---------------------------------------------------------------------- #

def _blk_bwd_kernel(g: Geom, sub: int, gwin_ref, dwin_ref, x_ref, im_ref,
                    wdd_ref, w1t_ref, b1_ref, w1_ref, w2_ref,
                    dx_ref, dwc_ref, dw1_ref, dw2t_ref, db1_ref, db2_ref,
                    dbc_ref, gcat_ref, dcat_ref):
    c_dec = dwin_ref.shape[0]
    c_out = gwin_ref.shape[0]
    _zero_pad_rows(dcat_ref, c_dec, sub)
    _zero_pad_rows(gcat_ref, c_out, sub)
    w1t = w1t_ref[...]
    b1 = b1_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    dt_ = dx_ref.dtype
    dwc_acc = _F32(0.0)
    dw1_acc = _F32(0.0)
    dw2t_acc = _F32(0.0)
    db1_acc = _F32(0.0)
    db2_acc = _F32(0.0)
    dbc_acc = _F32(0.0)
    for k in range(g.L // g.CH):
        c0 = k * g.CH
        for ti, (dh, dw, dt) in enumerate(TAPS):
            off = _tap_off(g, dh, dw, dt)
            # dd at lane l sums wc_tap^T @ g(l - off); dWc_tap sums
            # d(l + off) x g(l)^T.  g is zero on pad lanes and margins.
            gcat_ref[ti * sub:ti * sub + c_out, :] = \
                gwin_ref[:, g.halo + c0 - off:g.halo + c0 - off + g.CH]
            dcat_ref[ti * sub:ti * sub + c_dec, :] = \
                dwin_ref[:, g.halo + c0 + off:g.halo + c0 + off + g.CH]
        imc = im_ref[:, c0:c0 + g.CH].astype(dt_)
        dd = _dot(wdd_ref[...], gcat_ref[...], ((1,), (0,)))
        dd = (dd.astype(dt_) * imc)
        # gc must be re-masked: on margin tiles the clamped window makes
        # this slice alias shifted REAL data, which would contaminate the
        # dWc/dbc partials and write junk into the dx margins.
        gc = gwin_ref[:, g.halo + c0:g.halo + c0 + g.CH] * imc
        dwc_acc = dwc_acc + _dot(gc, dcat_ref[...], ((1,), (1,)))
        # expand/relu recompute + decay backward, all in VMEM
        xc = x_ref[:, c0:c0 + g.CH]
        z = _dot(w1t, xc, ((1,), (0,))) + b1
        dz = _dot(w2, dd, ((1,), (0,)))
        dz = jnp.where(z > 0.0, dz, 0.0).astype(dt_)
        dx = _dot(w1, dz, ((1,), (0,)))
        dx_ref[:, c0:c0 + g.CH] = (dx + gc.astype(_F32)).astype(dt_)
        dw1_acc = dw1_acc + _dot(xc, dz, ((1,), (1,)))
        h = jnp.maximum(z, 0.0).astype(dt_)
        dw2t_acc = dw2t_acc + _dot(dd, h, ((1,), (1,)))
        db1_acc = db1_acc + jnp.sum(dz.astype(_F32), axis=1,
                                    keepdims=True)
        db2_acc = db2_acc + jnp.sum(dd.astype(_F32), axis=1,
                                    keepdims=True)
        dbc_acc = dbc_acc + jnp.sum(gc.astype(_F32), axis=1,
                                    keepdims=True)
    dwc_ref[0] = dwc_acc
    dw1_ref[0] = dw1_acc
    dw2t_ref[0] = dw2t_acc
    db1_ref[0] = db1_acc
    db2_ref[0] = db2_acc
    dbc_ref[0] = dbc_acc


def blk_bwd(g: Geom, gy, d, x, wc, w1, b1, w2, imask):
    """One-kernel backward of a whole block.

    Returns (dx [C_in, ext], dwc [3,3,3,C_dec,C_out], dw1, db1, dw2,
    db2, dbc) — dx already includes the residual pass-through of gy.
    """
    c_dec = d.shape[0]
    c_out = gy.shape[0]
    c_in, c_mid = w1.shape
    sub = _sub(c_dec, c_out)
    wdd = _pack_wc_bwd(wc, c_dec, c_out, gy.dtype, sub)
    win = g.L + 2 * g.halo
    kern = functools.partial(_blk_bwd_kernel, g, sub)
    outs = pl.pallas_call(
        kern,
        grid=(g.grid,),
        in_specs=[
            pl.BlockSpec((pl.Element(c_out), pl.Element(win)),
                         _win_index_map(g, win)),
            pl.BlockSpec((pl.Element(c_dec), pl.Element(win)),
                         _win_index_map(g, win)),
            pl.BlockSpec((c_in, g.L), lambda i: (0, i)),
            pl.BlockSpec((1, g.L), lambda i: (0, i)),
            pl.BlockSpec((c_dec, 27 * sub), lambda i: (0, 0)),
            pl.BlockSpec((c_mid, c_in), lambda i: (0, 0)),
            pl.BlockSpec((c_mid, 1), lambda i: (0, 0)),
            pl.BlockSpec((c_in, c_mid), lambda i: (0, 0)),
            pl.BlockSpec((c_mid, c_dec), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((c_in, g.L), lambda i: (0, i)),
            pl.BlockSpec((1, c_out, 27 * sub), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c_in, c_mid), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c_dec, c_mid), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c_mid, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c_dec, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c_out, 1), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_in, g.ext), x.dtype),
            jax.ShapeDtypeStruct((g.grid, c_out, 27 * sub), _F32),
            jax.ShapeDtypeStruct((g.grid, c_in, c_mid), _F32),
            jax.ShapeDtypeStruct((g.grid, c_dec, c_mid), _F32),
            jax.ShapeDtypeStruct((g.grid, c_mid, 1), _F32),
            jax.ShapeDtypeStruct((g.grid, c_dec, 1), _F32),
            jax.ShapeDtypeStruct((g.grid, c_out, 1), _F32),
        ),
        scratch_shapes=[pltpu.VMEM((27 * sub, g.CH), gy.dtype),
                        pltpu.VMEM((27 * sub, g.CH), d.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        name="tstack_blk_bwd",
        interpret=INTERPRET,
    )(gy, d, x, imask, wdd, w1.T.astype(x.dtype),
      b1.reshape(-1, 1).astype(_F32), w1.astype(x.dtype),
      w2.astype(x.dtype))
    dx, dwc_p, dw1_p, dw2t_p, db1_p, db2_p, dbc_p = outs
    dwc_t = dwc_p.sum(axis=0).reshape(c_out, 27, sub)[:, :, :c_dec]
    dwc = jnp.transpose(dwc_t, (1, 2, 0)).reshape(3, 3, 3, c_dec, c_out)
    return (dx, dwc, dw1_p.sum(axis=0),
            db1_p.sum(axis=0)[:, 0], dw2t_p.sum(axis=0).T,
            db2_p.sum(axis=0)[:, 0], dbc_p.sum(axis=0)[:, 0])


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
    """Apply all WDSR-B blocks to x [C, ext] (padded-WT, margined).

    x must be zero on the W/T pad lanes and halo margins (``to_t``
    produces this form).  blocks: tuple of per-block effective params
    (w1 [C, C_mid], b1, w2 [C_mid, C_dec], b2, wc [3,3,3,C_dec,C], bc).
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
    gy = gy * im.astype(gy.dtype)   # cotangent may be junk off-interior
    dblocks = []
    for i in reversed(range(len(blocks))):
        w1, b1, w2, b2, wc, bc = blocks[i]
        gy, dwc, dw1, db1, dw2, db2, dbc = blk_bwd(
            g, gy, ds[i], xs[i], wc, w1, b1, w2, im)
        dblocks.append((dw1.astype(w1.dtype), db1.astype(b1.dtype),
                        dw2.astype(w2.dtype), db2.astype(b2.dtype),
                        dwc.astype(wc.dtype), dbc.astype(bc.dtype)))
    return gy, tuple(reversed(dblocks))


fused_stack_t.defvjp(_stack_fwd, _stack_bwd)


# ---------------------------------------------------------------------- #
# scan-over-blocks stack: identical kernels, one instance each            #
# ---------------------------------------------------------------------- #

def stack_blocks(blocks):
    """Tuple of per-block 6-tuples -> 6-tuple of [N, ...]-stacked leaves.

    All WDSR-B blocks share shapes, so the per-block effective params can
    ride a leading block axis and feed ``lax.scan``.
    """
    return tuple(jnp.stack(ls) for ls in zip(*blocks))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def fused_stack_t_scan(g: Geom, x, stacked, unroll: int = 1):
    """``fused_stack_t`` with the block loop as ``lax.scan``.

    Numerically identical to the unrolled stack — the same three kernels
    run in the same order on the same operands — but the compiled
    executable contains ONE instance of each kernel instead of
    ``num_res_blocks``, shrinking the serialized executable and the
    host-side trace/lowering time roughly linearly in depth (the
    unrolled flagship train step serializes to 58 MB and traces ~17 s;
    BENCH_NOTES.md "cold start").  ``stacked`` is ``stack_blocks(blocks)``.

    ``unroll`` (lax.scan's own unroll factor) is the middle ground:
    ``unroll=k`` puts k block bodies inside one loop iteration, so XLA
    can pipeline/fuse across adjacent blocks within each group (the
    reason full unroll is fastest in steady state) while the executable
    still holds only k instances of each kernel instead of depth.
    """
    im = interior_mask(g, x.dtype)

    def body(h, p):
        out, _ = _block_fwd(g, h, im, p)
        return out, None

    h, _ = jax.lax.scan(body, x, stacked, unroll=unroll)
    return h


def _scan_stack_fwd(g: Geom, x, stacked, unroll: int = 1):
    im = interior_mask(g, x.dtype)

    def body(h, p):
        out, d = _block_fwd(g, h, im, p)
        return out, (h, d)

    h, (xs, ds) = jax.lax.scan(body, x, stacked, unroll=unroll)
    return h, (xs, ds, stacked)


def _scan_stack_bwd(g: Geom, unroll: int, res, gy):
    xs, ds, stacked = res
    im = interior_mask(g, gy.dtype)
    gy = gy * im.astype(gy.dtype)   # cotangent may be junk off-interior

    def body(gy, inp):
        x, d, p = inp
        w1, b1, w2, b2, wc, bc = p
        gy, dwc, dw1, db1, dw2, db2, dbc = blk_bwd(
            g, gy, d, x, wc, w1, b1, w2, im)
        # ys are stacked at each block's ORIGINAL index (reverse=True
        # walks back-to-front but keeps forward placement), so the grad
        # tree lines up leaf-for-leaf with ``stacked``.
        return gy, (dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dw2.astype(w2.dtype), db2.astype(b2.dtype),
                    dwc.astype(wc.dtype), dbc.astype(bc.dtype))

    gy, dstacked = jax.lax.scan(body, gy, (xs, ds, stacked), reverse=True,
                                unroll=unroll)
    return gy, dstacked


fused_stack_t_scan.defvjp(_scan_stack_fwd, _scan_stack_bwd)


# ---------------------------------------------------------------------- #
# 5D <-> transposed padded-2D adapters                                    #
# ---------------------------------------------------------------------- #

def to_t(x5d, g: Geom):
    """[B, H, W, T, C] -> [C, ext] with zero W/T pads and margins."""
    b, h, w, t, c = x5d.shape
    xp = jnp.pad(x5d, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    x2 = jnp.transpose(xp, (4, 1, 2, 3, 0)).reshape(c, g.S * b)
    return jnp.pad(x2, ((0, 0), (g.margin, g.margin)))


def from_t(x2d, g: Geom, b, h, w, t):
    c = x2d.shape[0]
    x2 = x2d[:, g.margin:g.margin + g.S * b]
    x5 = x2.reshape(c, h, w + 2, t + 2, b)[:, :, 1:-1, 1:-1, :]
    return jnp.transpose(x5, (4, 1, 2, 3, 0))


def parse_loop(loop: str):
    """``"unroll" | "scan" | "scan:<k>"`` -> (kind, unroll_factor)."""
    if loop == "unroll":
        return "unroll", 0
    if loop == "scan":
        return "scan", 1
    if loop.startswith("scan:"):
        k = int(loop.split(":", 1)[1])
        if k < 1:
            raise ValueError(f"scan unroll factor must be >= 1: {loop!r}")
        return "scan", k
    raise ValueError(f"unknown stack loop form {loop!r} "
                     "(expected 'unroll', 'scan', or 'scan:<k>')")


def stack_apply_5d(x5d, blocks, target_rows: int = None,
                   target_ch: int = None, loop: str = "unroll"):
    """Convenience: run the fused stack on a [B, H, W, T, C] batch.

    ``loop="scan"`` selects the scan-over-blocks form (same kernels,
    ~depth-times smaller executable — see ``fused_stack_t_scan``);
    ``loop="scan:<k>"`` additionally unrolls k blocks per scan
    iteration (executable ~depth/k kernel instances, steady state
    closer to full unroll).
    """
    b, h, w, t, c = x5d.shape
    g = make_geom(h, w, t, b, target_rows, target_ch,
                  itemsize=jnp.dtype(x5d.dtype).itemsize, width=c)
    kind, k = parse_loop(loop)
    if kind == "scan":
        out = fused_stack_t_scan(g, to_t(x5d, g), stack_blocks(blocks), k)
    else:
        out = fused_stack_t(g, to_t(x5d, g), blocks)
    return from_t(out, g, b, h, w, t)
