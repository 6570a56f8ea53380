"""Ablation timing of blk_bwd pieces (numerics intentionally wrong).

Patches the kernel source per variant, compiles a 12-chained bwd
(dx feeds the next gy so the kernels serialize), and times it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

SRC = open(os.path.join(os.path.dirname(__file__), "..",
                        "probav_tpu", "ops", "pallas_tstack.py")).read()

COPIES = """            gcat_ref[ti * sub:ti * sub + c_out, :] = \\
                gwin_ref[:, g.halo + c0 - off:g.halo + c0 - off + g.CH]
            dcat_ref[ti * sub:ti * sub + c_dec, :] = \\
                dwin_ref[:, g.halo + c0 + off:g.halo + c0 + off + g.CH]"""
DCOPY = """            dcat_ref[ti * sub:ti * sub + c_dec, :] = \\
                dwin_ref[:, g.halo + c0 + off:g.halo + c0 + off + g.CH]"""
DDDOT = "dd = _dot(wdd_ref[...], gcat_ref[...], ((1,), (0,)))"
DWC = "dwc_acc = dwc_acc + _dot(gc, dcat_ref[...], ((1,), (1,)))"
ZREC = "z = _dot(w1t, xc, ((1,), (0,))) + b1"
DW1 = "dw1_acc = dw1_acc + _dot(xc, dz, ((1,), (1,)))"
DW2 = "dw2t_acc = dw2t_acc + _dot(dd, h, ((1,), (1,)))"
DX = "dx = _dot(w1, dz, ((1,), (0,)))"

WZ = "dwc_ref[0] = dwc_acc"
W1Z = "dw1_ref[0] = dw1_acc"
W2Z = "dw2t_ref[0] = dw2t_acc"

VARIANTS = {
    "full": [],
    "no_tap_copies": [(COPIES, "            pass")],
    "no_dwc+dcopy": [(DCOPY, "            pass"), (DWC, "dwc_acc = dwc_acc"),
                     (WZ, "dwc_ref[0] = jnp.zeros(dwc_ref.shape[1:], _F32)")],
    "no_dd_dot": [(DDDOT,
                   "dd = dwin_ref[:, g.halo + c0:g.halo + c0 + g.CH]"
                   ".astype(_F32)")],
    "no_z_recompute": [(ZREC, "z = b1 + jnp.zeros_like("
                        "_dot(w1t, xc, ((1,), (0,)))[:1])")],
    "no_dw1_dw2": [(DW1, "dw1_acc = dw1_acc"), (DW2, "dw2t_acc = dw2t_acc"),
                   (W1Z, "dw1_ref[0] = jnp.zeros(dw1_ref.shape[1:], _F32)"),
                   (W2Z, "dw2t_ref[0] = jnp.zeros(dw2t_ref.shape[1:], _F32)")],
    "no_dx_dot": [(DX, "dx = dz[:w1.shape[0]] * _F32(0.0)")],
}


def load_variant(edits):
    src = SRC
    for old, new in edits:
        assert old in src, old[:60]
        src = src.replace(old, new)
    mod = {"__name__": f"ts_abl"}
    exec(compile(src, "ts_abl.py", "exec"), mod)
    return mod


def main():
    rng = np.random.default_rng(0)
    C, CMID, CDEC = 32, 256, 25
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.3, s), jnp.float32)
    w1, b1 = mk(C, CMID), mk(CMID)
    w2 = mk(CMID, CDEC)
    wc = mk(3, 3, 3, CDEC, C)

    for name, edits in VARIANTS.items():
        mod = load_variant(edits)
        ts = type(sys)("ts_abl")
        ts.__dict__.update(mod)
        g = ts.make_geom(22, 22, 9, 128, itemsize=2, width=C)
        im = ts.interior_mask(g, jnp.bfloat16)
        x = jnp.asarray(rng.normal(0, 1, (C, g.ext)), jnp.bfloat16)
        d = jnp.asarray(rng.normal(0, 1, (CDEC, g.ext)), jnp.bfloat16)
        gy = jnp.asarray(rng.normal(0, 1, (C, g.ext)), jnp.bfloat16)

        def chain(gy0):
            acc = jnp.float32(0.0)
            h = gy0
            for _ in range(12):
                outs = ts.blk_bwd(g, h, d, x, wc, w1, b1, w2, im)
                h = outs[0]
                acc = acc + outs[6].sum()
            return jnp.sum(h.astype(jnp.float32)) + acc

        fn = jax.jit(chain)
        t0 = time.time()
        _ = float(fn(gy))
        comp = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            o = fn(gy)
        _ = float(o)
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{name:16s}: {ms:7.2f} ms/12-chain = {ms/12:6.3f} ms/kernel "
              f"(compile {comp:.0f}s)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
