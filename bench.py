#!/usr/bin/env python3
"""Benchmark: flagship training throughput on one TPU chip.

Measures the full fused train step (forward + 49-shift L1 loss + backward +
nadam update, donated buffers) of the flagship p16t9c85r12 model (12 WDSR-B
blocks, 32 filters, 9-frame stack, batch 128) and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": "patches/sec", "vs_baseline": ...}

Baseline: the reference publishes no machine throughput (BASELINE.md), so
``vs_baseline`` uses a roofline ESTIMATE of the reference's GTX1080ti rate:
the step costs ~1.5 TFLOP at batch 128 (XLA cost analysis of the identical
computation); a 1080ti peaks at 11.3 TF f32 and TF-era conv stacks with
small channel counts realize ~25-40% of that, so ~0.33-0.53 s/step, i.e.
~240-390 patches/sec — call it 400/s (generous).  The BASELINE.json north
star asks for >= 5x the reference.

Timing forces device-queue completion by fetching the optimizer step
counter (block_until_ready alone can return early on tunneled backends).
Inputs are staged on device before timing; a fresh-data steady-state step
is what training repeats (the input pipeline overlaps via prefetch).
"""

import json
import time

ESTIMATED_REFERENCE_PATCHES_PER_SEC = 400.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from probav_tpu.config import Config
    from probav_tpu.models import build_model, input_shape
    from probav_tpu.ops import ShiftCompensatedLosses

    cfg = Config.from_file("cfg/p16t9c85r12.cfg")
    batch = cfg.batch_size
    model = build_model(cfg, "NIR")
    losses = ShiftCompensatedLosses(
        target_shape=(cfg.hr_patch_size, cfg.hr_patch_size, 1))
    tx = optax.nadam(cfg.learning_rate)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(
        4000, 12000, input_shape(cfg, batch)).astype(np.float32))
    hr = jax.device_put(rng.uniform(
        4000, 12000, (batch, 48, 48, 1)).astype(np.float32))
    mask = jax.device_put(
        (rng.uniform(size=(batch, 48, 48, 1)) > 0.15).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), x)["params"]
    opt_state = tx.init(params)

    @jax.jit
    def fwd(p, xx):
        return model.apply({"params": p}, xx)

    def step(p, o, xx, h, m):
        g = jax.grad(
            lambda pp: losses.l1(h, m, model.apply({"params": pp}, xx)))(p)
        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2

    step = jax.jit(step, donate_argnums=(0, 1))

    def drain(o):
        # jax.block_until_ready can return before the device queue is
        # drained on tunneled backends; fetching a value that depends on
        # the last step (the optimizer's step counter) forces completion.
        return int(np.asarray(
            [l for l in jax.tree_util.tree_leaves(o) if np.ndim(l) == 0][0]))

    # Warmup / compile.
    params, opt_state = step(params, opt_state, x, hr, mask)
    drain(opt_state)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state = step(params, opt_state, x, hr, mask)
    assert drain(opt_state) == iters + 1
    dt = (time.perf_counter() - t0) / iters
    train_pps = batch / dt

    print(json.dumps({
        "metric": "train_patches_per_sec_1chip_p16t9c85r12_b128",
        "value": round(train_pps, 1),
        "unit": "patches/sec",
        "vs_baseline": round(train_pps / ESTIMATED_REFERENCE_PATCHES_PER_SEC,
                             2),
    }))


if __name__ == "__main__":
    main()
