#!/usr/bin/env python3
"""Cold-start decomposition for the fused flagship training step.

Round-3 measurement: with the persistent XLA compilation cache enabled the
cross-process cold start of ``train.py --fused-stack t`` still took ~202 s
(down from 324 s cacheless).  This probe decomposes where that time goes
and what the on-disk cache actually captures, by timing each phase in a
fresh process:

  backend_init   first jax.devices() touch (tunnel grant + plugin init)
  model_build    build_model + init_state (param init compiles tiny graphs)
  train_compile  first _jit_train dispatch (traces + XLA+Mosaic compile OR
                 persistent-cache deserialize)
  train_step2    second dispatch (steady state, sanity)
  eval_compile   first eval_step dispatch

Run it twice against the same cache dir (first = cold, second = warm); the
warm run logs persistent-cache GETs/PUTs (debug logging on
jax._src.compilation_cache) so misses are attributable.

    python tools/coldstart_probe.py --cache /tmp/cs_cache [--debug-cache]
        [--fused t|off] [--dtype bf16|f32]
"""

import argparse
import json
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--fused", default="t", choices=["t", "off"])
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--stack-loop", default="unroll",
                    help="'unroll', 'scan', or 'scan:<k>'")
    ap.add_argument("--debug-cache", action="store_true",
                    help="log persistent-cache get/put traffic")
    ap.add_argument("--explain-misses", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    phases = {}

    def cache_stats():
        n, size = 0, 0
        for root, _, files in os.walk(args.cache):
            for f in files:
                n += 1
                size += os.path.getsize(os.path.join(root, f))
        return {"files": n, "mb": round(size / 1e6, 1)}

    t0 = time.perf_counter()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from probav_tpu.utils import enable_compile_cache
    enable_compile_cache(args.cache)
    if args.explain_misses:
        jax.config.update("jax_explain_cache_misses", True)
    if args.debug_cache:
        for name in ("jax._src.compilation_cache",
                     "jax._src.compiler"):
            lg = logging.getLogger(name)
            lg.setLevel(logging.DEBUG)
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter(f"[{name.split('.')[-1]}] "
                                             "%(message)s"))
            lg.addHandler(h)

    before = cache_stats()
    jax.devices()
    phases["backend_init_s"] = round(time.perf_counter() - t0, 1)

    import jax.numpy as jnp
    import numpy as np
    from probav_tpu.config import Config
    from probav_tpu.models import build_model, input_shape
    from probav_tpu.ops import ShiftCompensatedLosses
    from probav_tpu.train import ModelTrainer, build_optimizer

    t0 = time.perf_counter()
    cfg = Config.from_file(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "cfg", "p16t9c85r12.cfg"))
    batch = cfg.batch_size
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    fused = "t" if args.fused == "t" else False
    model = build_model(cfg, "NIR", dtype=dtype, fused_stack=fused,
                        stack_loop=args.stack_loop)
    losses = ShiftCompensatedLosses(
        target_shape=(cfg.hr_patch_size, cfg.hr_patch_size, 1))
    trainer = ModelTrainer(
        model, losses.l1, losses.cpsnr,
        build_optimizer(cfg.optimizer, cfg.learning_rate),
        ckpt_dir=tempfile.mkdtemp("cs_ckpt"),
        log_dir=tempfile.mkdtemp("cs_logs"),
        loss_per_sample_fn=losses.per_sample(cfg.loss),
        loss_weighted_fn=losses.weighted(cfg.loss))

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(
        4000, 12000, input_shape(cfg, batch)).astype(np.float32))
    hr = jax.device_put(rng.uniform(
        4000, 12000, (batch, 48, 48, 1)).astype(np.float32))
    mask = jax.device_put(
        (rng.uniform(size=(batch, 48, 48, 1)) > 0.15).astype(np.float32))
    w = jax.device_put(np.ones((batch,), np.float32))

    trainer.init_state(x[:1])
    trainer._build_steps()
    phases["model_build_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    state, loss, metric = trainer._jit_train(trainer.state, x, hr, mask)
    assert int(state.step) >= 1
    phases["train_compile_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    state, loss, metric = trainer._jit_train(state, x, hr, mask)
    assert int(state.step) >= 2
    phases["train_step2_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    out = trainer._jit_eval(state, x, hr, mask, w)
    jax.block_until_ready(out)
    phases["eval_compile_s"] = round(time.perf_counter() - t0, 1)

    phases["cache_before"] = before
    phases["cache_after"] = cache_stats()
    print(json.dumps(phases))


if __name__ == "__main__":
    main()
