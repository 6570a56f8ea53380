#!/usr/bin/env python3
"""Decompose the fused-stack regression: time fwd/bwd pieces at model scale.

Pieces:
  fwd_plain      forward of the 12-block stack, plain XLA
  fwd_stack      forward via fused_block_stack (custom_vjp primal)
  grad_plain     value+grad of plain stack, XLA autodiff
  grad_nocvjp    value+grad of _stack_fwd/_stack_bwd math but with the
                 Pallas kernel REPLACED by equivalent XLA ops (isolates
                 custom_vjp/residual structure from the kernel itself)
  grad_stack     value+grad via fused_block_stack (custom_vjp + Pallas)
  bwd_kernel12   12 chained Pallas _bwd calls alone
  bwd_xla12      the same math in plain XLA alone
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCHDOG = 1500
threading.Timer(WATCHDOG, lambda: os._exit(17)).start()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from probav_tpu.ops import pallas_wide_block as pwb
    from probav_tpu.ops.pallas_block_stack import (
        _block_fwd, _stack_fwd, _stack_bwd, fused_block_stack)

    B, H, W, T, C = 128, 22, 22, 9, 32
    CMID, CDEC, NB = 256, 25, 12
    N = B * H * W * T
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(B, H, W, T, C)) * 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, H, W, T, C)) * 0.5, jnp.float32)
    blocks = tuple(
        tuple(jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)
              for s in [(C, CMID), (CMID,), (CMID, CDEC), (CDEC,),
                        (3, 3, 3, CDEC, C), (C,)])
        for _ in range(NB))

    def plain_stack(x, blocks):
        h = x
        for p in blocks:
            h, _ = _block_fwd(h, p)
        return h

    def timeit(name, fn, *args):
        # fn must return a SCALAR (or tiny) output: fetching a big array
        # through the tunnel would dominate the measurement.
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        iters = 20
        t0 = time.perf_counter()
        for _i in range(iters):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            gb = ca.get("bytes accessed", float("nan")) / 1e9
        except Exception:
            gb = float("nan")
        print(f"{name:14s} {dt:8.2f} ms   {gb:7.1f} GB", flush=True)
        return dt

    def scalarize(fn):
        return lambda *a: jax.tree.map(jnp.sum, fn(*a))

    fwd_plain = jax.jit(scalarize(plain_stack))
    fwd_stack = jax.jit(scalarize(fused_block_stack))
    grad_plain = jax.jit(scalarize(jax.grad(
        lambda a, b: jnp.sum(plain_stack(a, b) ** 2), argnums=(0, 1))))
    grad_stack = jax.jit(scalarize(jax.grad(
        lambda a, b: jnp.sum(fused_block_stack(a, b) ** 2), argnums=(0, 1))))

    # custom_vjp structure with XLA-math backward (no Pallas)
    @jax.custom_vjp
    def stack_nocvjp(x, blocks):
        return plain_stack(x, blocks)

    def _f(x, blocks):
        return _stack_fwd(x, blocks)

    def _xla_bwd_seg(xf, w1, b1, w2, ddf):
        z = xf @ w1 + b1
        h = jnp.maximum(z, 0.0)
        dz = jnp.where(z > 0, ddf @ w2.T, 0.0)
        return (dz @ w1.T, xf.T @ dz, dz.sum(0), h.T @ ddf, ddf.sum(0))

    def _b(res, gy):
        xs, ds, blocks = res
        out = []
        for i in reversed(range(len(blocks))):
            w1, b1, w2, b2, wc, bc = blocks[i]
            from probav_tpu.ops.pallas_block_stack import _conv3d
            _, cv = jax.vjp(_conv3d, ds[i], wc, bc)
            dd, dwc, dbc = cv(gy)
            xf = xs[i].reshape(-1, xs[i].shape[-1])
            ddf = dd.reshape(-1, dd.shape[-1])
            dx, dw1, db1, dw2, db2 = _xla_bwd_seg(xf, w1, b1, w2, ddf)
            gy = gy + dx.reshape(xs[i].shape)
            out.append((dw1, db1, dw2, db2, dwc, dbc))
        return gy, tuple(reversed(out))

    stack_nocvjp.defvjp(_f, _b)
    grad_nocvjp = jax.jit(scalarize(jax.grad(
        lambda a, b: jnp.sum(stack_nocvjp(a, b) ** 2), argnums=(0, 1))))

    # isolated backward chains
    xf = jnp.asarray(rng.normal(size=(N, C)) * 0.5, jnp.float32)
    ddf = jnp.asarray(rng.normal(size=(N, CDEC)) * 0.5, jnp.float32)

    @jax.jit
    def bwd_kernel12(xf, ddf, blocks):
        acc = jnp.zeros((N, C), jnp.float32)
        for p in blocks:
            dx, dw1, db1, dw2, db2 = pwb._bwd(xf, p[0], p[1], p[2], ddf)
            acc = acc + dx + dw1.sum() + dw2.sum()
        return acc.sum()

    @jax.jit
    def bwd_xla12(xf, ddf, blocks):
        acc = jnp.zeros((N, C), jnp.float32)
        for p in blocks:
            dx, dw1, db1, dw2, db2 = _xla_bwd_seg(xf, p[0], p[1], p[2], ddf)
            acc = acc + dx + dw1.sum() + dw2.sum()
        return acc.sum()

    timeit("fwd_plain", fwd_plain, x, blocks)
    timeit("fwd_stack", fwd_stack, x, blocks)
    timeit("grad_plain", grad_plain, x, blocks)
    timeit("grad_nocvjp", grad_nocvjp, x, blocks)
    timeit("grad_stack", grad_stack, x, blocks)
    timeit("bwd_xla12", bwd_xla12, xf, ddf, blocks)
    timeit("bwd_kernel12", bwd_kernel12, xf, ddf, blocks)
    os._exit(0)


if __name__ == "__main__":
    main()
