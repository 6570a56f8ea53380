#!/usr/bin/env python3
"""Trace one full train step per variant and print the top ops by time.

Usage: python tools/trace_step.py plain_f32 stack_f32
Parses the XLA op events out of the profiler's trace.json.gz directly (no
tensorboard needed) and aggregates device time by op-name prefix.
"""

import glob
import gzip
import json
import os
import sys
import threading
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

threading.Timer(1500, lambda: os._exit(17)).start()


def top_ops(trace_dir, k=25):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    agg = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3   # us -> ms
            # Keep only device-lane events (XLA ops have args.long_name or
            # look like fusion/convolution/custom-call names).
            if not name or name.startswith(("$", "process_")):
                continue
            cat = ev.get("args", {}).get("long_name", "")
            agg[(name.split(".")[0], bool(cat))] += dur
            total += dur
    rows = sorted(((v, n) for (n, _c), v in agg.items()), reverse=True)
    return rows[:k], total


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
    losses = ShiftCompensatedLosses(
        target_shape=(cfg.hr_patch_size, cfg.hr_patch_size, 1))

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(
        4000, 12000, input_shape(cfg, batch)).astype(np.float32))
    hr = jax.device_put(rng.uniform(
        4000, 12000, (batch, 48, 48, 1)).astype(np.float32))
    mask = jax.device_put(
        (rng.uniform(size=(batch, 48, 48, 1)) > 0.15).astype(np.float32))

    for variant in sys.argv[1:] or ["plain_f32", "stack_f32"]:
        # variant grammar: {plain|stack|tstack}_{f32|bf16};
        # 'tstack' = the production transposed fused tier ('t').
        fused = "t" if "tstack" in variant else ("stack" in variant)
        model = build_model(cfg, "NIR",
                            dtype=(jnp.bfloat16 if "bf16" in variant
                                   else jnp.float32),
                            fused_stack=fused)
        tx = optax.nadam(cfg.learning_rate)
        # init on a batch-1 probe: identical param tree, but the odd batch
        # takes the plain path so the 36 fused kernels aren't each compiled
        # EAGERLY here (that cost >14 min for fused_stack='t').
        params = model.init(jax.random.PRNGKey(0), x[:1])["params"]
        opt_state = tx.init(params)

        def step(p, o, xx, h, m):
            g = jax.grad(lambda pp: losses.l1(
                h, m, model.apply({"params": pp}, xx)))(p)
            u, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, u), o2

        step = jax.jit(step, donate_argnums=(0, 1))

        def drain(o):
            return int(np.asarray(
                [l for l in jax.tree_util.tree_leaves(o)
                 if np.ndim(l) == 0][0]))

        params, opt_state = step(params, opt_state, x, hr, mask)
        drain(opt_state)
        tdir = f"/tmp/trace_{variant}"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        for _ in range(3):
            params, opt_state = step(params, opt_state, x, hr, mask)
        drain(opt_state)
        jax.profiler.stop_trace()
        time.sleep(1)
        rows, total = top_ops(tdir)
        print(f"\n=== {variant}: top ops (3 steps, {total:.1f} ms "
              f"total event time) ===", flush=True)
        for v, n in rows:
            print(f"  {v:9.2f} ms  {n[:90]}", flush=True)
        del params, opt_state, step, model
    os._exit(0)


if __name__ == "__main__":
    main()
