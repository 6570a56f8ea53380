#!/usr/bin/env python3
"""Measure flagship train-step variants on the real TPU chip.

Usage: python tools/bench_variants.py [variant ...]
Variants: plain_f32 stack_f32 tstack_f32 plain_bf16 stack_bf16
tstack_bf16 block_f32 remat_f32

Timing forces device-queue completion by fetching the optimizer step counter
(jax.block_until_ready can return early through the axon tunnel).  One
process, variants sequential; an in-script watchdog hard-exits rather than
letting an external SIGKILL wedge the TPU grant.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCHDOG_SEC = 1800


def _loop_of(variant):
    """Variant suffix -> stack_loop: ..._scan = scan, ..._scanK = scan:K."""
    for tok in variant.split("_"):
        if tok == "scan":
            return "scan"
        if tok.startswith("scan") and tok[4:].isdigit():
            return f"scan:{tok[4:]}"
    return "unroll"


def arm_watchdog():
    def boom():
        print("[watchdog] hard exit", flush=True)
        os._exit(17)
    t = threading.Timer(WATCHDOG_SEC, boom)
    t.daemon = True
    t.start()
    return t


def main(variants):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from probav_tpu.config import Config
    from probav_tpu.models import build_model, input_shape
    from probav_tpu.ops import ShiftCompensatedLosses

    cfg = Config.from_file("cfg/p16t9c85r12.cfg")
    if "--filters" in variants:
        i = variants.index("--filters")
        cfg.flat["num_filters"] = int(variants[i + 1])
        del variants[i:i + 2]
        print(f"filters={cfg.num_filters}", flush=True)
    batch = cfg.batch_size
    losses = ShiftCompensatedLosses(
        target_shape=(cfg.hr_patch_size, cfg.hr_patch_size, 1))

    rng = np.random.default_rng(0)
    x_h = rng.uniform(4000, 12000, input_shape(cfg, batch)).astype(np.float32)
    hr_h = rng.uniform(4000, 12000, (batch, 48, 48, 1)).astype(np.float32)
    mask_h = (rng.uniform(size=(batch, 48, 48, 1)) > 0.15).astype(np.float32)

    def build(variant):
        dtype = jnp.bfloat16 if "bf16" in variant else jnp.float32
        fs = "t" if "tstack" in variant else ("stack" in variant)
        return build_model(cfg, "NIR", dtype=dtype,
                           remat=("remat" in variant),
                           fused_block=("block" in variant),
                           fused_stack=fs,
                           stack_loop=_loop_of(variant))

    results = {}
    for variant in variants:
        print(f"=== {variant} ===", flush=True)
        model = build(variant)
        tx = optax.nadam(cfg.learning_rate)
        x = jax.device_put(x_h)
        hr = jax.device_put(hr_h)
        mask = jax.device_put(mask_h)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        opt_state = tx.init(params)

        def step(p, o, xx, h, m):
            g = jax.grad(lambda pp: losses.l1(
                h, m, model.apply({"params": pp}, xx)))(p)
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2

        step = jax.jit(step, donate_argnums=(0, 1))

        def drain(o):
            return int(np.asarray([l for l in jax.tree_util.tree_leaves(o)
                                   if np.ndim(l) == 0][0]))

        t0 = time.perf_counter()
        params, opt_state = step(params, opt_state, x, hr, mask)
        drain(opt_state)
        print(f"  compile+1st step: {time.perf_counter()-t0:.1f}s",
              flush=True)

        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state = step(params, opt_state, x, hr, mask)
        n = drain(opt_state)
        assert n == iters + 1, n
        dt = (time.perf_counter() - t0) / iters
        pps = batch / dt
        results[variant] = {"ms_per_step": round(dt * 1e3, 2),
                            "patches_per_sec": round(pps, 1)}
        print(f"  {dt*1e3:.2f} ms/step -> {pps:.0f} patches/s", flush=True)
        del params, opt_state, step, model, x, hr, mask

    print(json.dumps(results))


if __name__ == "__main__":
    arm_watchdog()
    main(sys.argv[1:] or ["plain_f32", "stack_f32"])
