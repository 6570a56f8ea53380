#!/usr/bin/env python3
"""Benchmark: flagship training throughput on one TPU chip.

Measures THE REAL TRAINER STEP — ``ModelTrainer._jit_train`` exactly as
``fit``/``fit_device`` dispatch it (forward + 49-shift L1 loss + backward +
nadam update + per-step cPSNR metric, donated state) — for the flagship
p16t9c85r12 model (12 WDSR-B blocks, 32 filters, 9-frame stack, batch 128)
and prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": "patches/sec", "vs_baseline": ...}

``value`` is the validated production configuration: bf16 compute dtype
(parameters, optimizer and loss stay float32 — the reference's loss
bit-depth contract) with the transposed fused Pallas block stack
(``fused_stack='t'``, ops/pallas_tstack.py).  Convergence parity
evidence: ``tools/bf16_convergence.py 800 --fused`` trains the identical
flagship topology (f32 plain XLA vs bf16 fused) with the same
seed/schedule on a synthetic SR task; the acceptance gate is final val
cPSNR within 0.1 dB (result committed in BENCH_NOTES.md).  The fused f32
number is reported alongside (plain-XLA rates are in BENCH_NOTES.md).

Baseline: the reference publishes no machine throughput (BASELINE.md), so
``vs_baseline`` uses a roofline ESTIMATE of the reference's GTX1080ti rate:
the step costs ~1.5 TFLOP at batch 128 (XLA cost analysis of the identical
computation); a 1080ti peaks at 11.3 TF f32 and TF-era conv stacks with
small channel counts realize ~25-40% of that, so ~240-390 patches/sec —
call it 400/s (generous).  The BASELINE.json north star asks for >= 5x.

Timing forces device-queue completion by fetching the trainer's step
counter (block_until_ready alone can return early on tunneled backends).
Inputs are staged on device before timing; a fresh-data steady-state step
is what training repeats (the input pipeline overlaps via prefetch).
"""

import json
import tempfile
import time

ESTIMATED_REFERENCE_PATCHES_PER_SEC = 400.0


def measure(dtype_name: str, iters: int = 50,
            fused_stack=False) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from probav_tpu.config import Config
    from probav_tpu.models import build_model, input_shape
    from probav_tpu.ops import ShiftCompensatedLosses
    from probav_tpu.train import ModelTrainer, build_optimizer

    cfg = Config.from_file("cfg/p16t9c85r12.cfg")
    batch = cfg.batch_size
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = build_model(cfg, "NIR", dtype=dtype, fused_stack=fused_stack)
    losses = ShiftCompensatedLosses(
        target_shape=(cfg.hr_patch_size, cfg.hr_patch_size, 1))
    trainer = ModelTrainer(
        model, losses.l1, losses.cpsnr,
        build_optimizer(cfg.optimizer, cfg.learning_rate),
        ckpt_dir=tempfile.mkdtemp("bench_ckpt"),
        log_dir=tempfile.mkdtemp("bench_logs"))

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(
        4000, 12000, input_shape(cfg, batch)).astype(np.float32))
    hr = jax.device_put(rng.uniform(
        4000, 12000, (batch, 48, 48, 1)).astype(np.float32))
    mask = jax.device_put(
        (rng.uniform(size=(batch, 48, 48, 1)) > 0.15).astype(np.float32))

    trainer.init_state(x[:1])
    trainer._build_steps()
    state = trainer.state

    def drain(s):
        # The step counter depends on the whole update; fetching it forces
        # the device queue to drain (block_until_ready can return early on
        # tunneled backends).
        return int(s.step)

    state, loss, metric = trainer._jit_train(state, x, hr, mask)
    best = 0.0
    for _trial in range(2):   # best-of-2: tunnel-stall robustness
        base = drain(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss, metric = trainer._jit_train(state, x, hr, mask)
        assert drain(state) == base + iters
        dt = (time.perf_counter() - t0) / iters
        best = max(best, batch / dt)
    return best


def measure_infer(dtype_name: str, fused_stack=False, iters: int = 40,
                  scenes_per_call=None) -> float:
    """Scenes/sec of the FULL test-path forward — model + clip/round +
    on-device 8x8 tile paste, exactly the resolver's grouped device call
    (infer/resolver.py) at the flagship geometry (64 patches of 22^2 per
    384^2 scene; the reference chunked 16 patches per GPU call,
    /root/reference/test.py:103-134).

    Times back-to-back dispatches and forces completion once at the end
    (per-call host fetches over the tunneled backend carry 75-150 ms of
    tunnel latency that is not framework cost; resolve_all overlaps them
    with compute via double-buffering in production).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from probav_tpu.config import Config
    from probav_tpu.infer import Resolver
    from probav_tpu.models import build_model

    cfg = Config.from_file("cfg/p16t9c85r12.cfg")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = build_model(cfg, "NIR", dtype=dtype, fused_stack=fused_stack)
    rng = np.random.default_rng(0)
    probe = rng.uniform(4000, 12000, (1, 22, 22, 9, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(probe))["params"]
    resolver = Resolver(model, params, scene_size=384,
                        scenes_per_call=scenes_per_call)
    group = resolver._auto_group(64)   # production grouping (alignment +
    #                                    dispatch-latency amortization)
    fn = resolver._group_fn(64, group)
    flat = jax.device_put(rng.uniform(
        4000, 12000,
        (group * 64, 22, 22, 9, 1)).astype(np.float32))
    out = fn(params, flat)
    jax.block_until_ready(out)
    best = 0.0
    # Two timed trials, best wins: the tunneled backend exhibits
    # nondeterministic multi-second stalls (environment noise, not
    # framework cost — see module docstring); back-to-back trials make
    # the steady-state rate robust to one stalled window.
    for _trial in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, flat)
        jax.block_until_ready(out)
        _ = float(jnp.asarray(out).ravel()[0])   # force queue drain
        dt = (time.perf_counter() - t0) / iters
        best = max(best, group / dt)
    return best


def measure_infer_tta(dtype_name: str, fused_stack=False, repeats: int = 20,
                      iters: int = 12) -> float:
    """Scenes/sec of grouped temporal-permutation TTA serving — the
    resolver's _group_tta_fn device call (forward over scenes x repeats
    permutation stacks + on-device round/clip + mean over repeats + tile
    paste) at the flagship geometry.  Each scene costs ``repeats`` model
    forwards, so the compute-bound ceiling is the non-TTA rate / repeats;
    this measurement exists to show the grouped path HOLDS that ceiling
    (the pre-round-4 per-scene dispatch pattern fell an order of
    magnitude below it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from probav_tpu.config import Config
    from probav_tpu.infer import Resolver
    from probav_tpu.models import build_model

    cfg = Config.from_file("cfg/p16t9c85r12.cfg")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = build_model(cfg, "NIR", dtype=dtype, fused_stack=fused_stack)
    rng = np.random.default_rng(0)
    probe = rng.uniform(4000, 12000, (1, 22, 22, 9, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(probe))["params"]
    resolver = Resolver(model, params, scene_size=384)
    group = resolver._auto_group(64, repeats=repeats)
    fn = resolver._group_tta_fn(64, repeats, group)
    flat = jax.device_put(rng.uniform(
        4000, 12000, (group * 64, 22, 22, 9, 1)).astype(np.float32))
    perm = jax.device_put(resolver._tta_perms(9, repeats, 0))
    out = fn(params, flat, perm)
    jax.block_until_ready(out)
    best = 0.0
    for _trial in range(2):   # best-of-2: tunnel-stall robustness
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, flat, perm)
        jax.block_until_ready(out)
        _ = float(jnp.asarray(out).ravel()[0])   # force queue drain
        dt = (time.perf_counter() - t0) / iters
        best = max(best, group / dt)
    return best


def measure_infer_tta_e2e(dtype_name: str, fused_stack=False,
                          repeats: int = 20, scenes: int = 24) -> float:
    """End-to-end TTA serving scenes/sec through ``resolve_all(tta=True)``
    — host batching + transfers + device calls + fetches, i.e. the actual
    product path (test.py --tta), not just the grouped device call the
    measurement above isolates.  Round-5 design moves the permutation
    on device, so each scene's patches cross the tunnel once instead of
    ``repeats`` times."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from probav_tpu.config import Config
    from probav_tpu.infer import Resolver
    from probav_tpu.models import build_model

    cfg = Config.from_file("cfg/p16t9c85r12.cfg")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = build_model(cfg, "NIR", dtype=dtype, fused_stack=fused_stack)
    rng = np.random.default_rng(0)
    probe = rng.uniform(4000, 12000, (1, 22, 22, 9, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(probe))["params"]
    resolver = Resolver(model, params, scene_size=384)
    all_patches = rng.uniform(
        4000, 12000, (scenes, 64, 22, 22, 9, 1)).astype(np.float32)
    resolver.resolve_all(all_patches[:8], progress=False, tta=True,
                         tta_repeats=repeats)          # compile
    best = 0.0
    for _trial in range(2):
        t0 = time.perf_counter()
        out = resolver.resolve_all(all_patches, progress=False, tta=True,
                                   tta_repeats=repeats)
        dt = time.perf_counter() - t0
        assert len(out) == scenes
        best = max(best, scenes / dt)
    return best


def _wait_for_backend(tries: int = 6, delay_s: float = 60.0,
                      probe_timeout_s: float = 300.0) -> None:
    """Block until the TPU backend initializes (bounded retries).

    The tunneled chip exhibits transient multi-minute outages where
    backend setup itself fails with UNAVAILABLE; a failed init is cached
    for the life of the process, so probe in a SUBPROCESS and only
    proceed in this process once a probe succeeds (or retries are
    exhausted — then run anyway and fail with the real error).

    Worst-case wait: ~tries*delay_s (~6 min) when probes fail fast, up
    to ~tries*probe_timeout_s (~30 min) when backend init HANGS instead
    of erroring (each hung probe burns its own probe_timeout_s and the
    inter-attempt sleep is skipped).
    """
    import subprocess
    import sys

    for attempt in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout_s)
        except subprocess.TimeoutExpired:   # init HANGS during outages too
            print(f"[bench] backend probe {attempt + 1}/{tries} timed out",
                  file=sys.stderr, flush=True)
            continue
        if r.returncode == 0:
            return
        tail = (r.stderr or b"").decode(errors="replace").strip()
        print(f"[bench] backend probe {attempt + 1}/{tries} failed "
              f"({tail.splitlines()[-1][:120] if tail else 'no stderr'}); "
              f"retrying in {delay_s:.0f}s", file=sys.stderr, flush=True)
        if attempt + 1 < tries:
            time.sleep(delay_s)


def main():
    _wait_for_backend()
    fused_bf16 = measure("bf16", fused_stack="t")
    fused_f32 = measure("f32", fused_stack="t")
    infer_bf16 = measure_infer("bf16", fused_stack="t")
    tta_bf16 = measure_infer_tta("bf16", fused_stack="t")
    tta_e2e_bf16 = measure_infer_tta_e2e("bf16", fused_stack="t")
    print(json.dumps({
        "metric":
            "train_patches_per_sec_1chip_p16t9c85r12_b128_bf16_tstack",
        "value": round(fused_bf16, 1),
        "unit": "patches/sec",
        "vs_baseline": round(fused_bf16 /
                             ESTIMATED_REFERENCE_PATCHES_PER_SEC, 2),
        # The reference publishes no throughput; the denominator is a
        # GTX1080ti roofline estimate (see module docstring), so every
        # vs_baseline ratio here is measured-vs-ESTIMATE.
        "baseline_kind": "estimate",
        "f32_tstack_patches_per_sec": round(fused_f32, 1),
        "f32_tstack_vs_baseline": round(
            fused_f32 / ESTIMATED_REFERENCE_PATCHES_PER_SEC, 2),
        "infer_scenes_per_sec_bf16_tstack": round(infer_bf16, 1),
        "infer_patches_per_sec_bf16_tstack": round(infer_bf16 * 64, 1),
        "infer_tta20_scenes_per_sec_bf16_tstack": round(tta_bf16, 2),
        "infer_tta20_model_fwds_per_sec": round(tta_bf16 * 20 * 64, 1),
        "infer_tta20_e2e_scenes_per_sec_bf16_tstack": round(tta_e2e_bf16, 2),
    }))


if __name__ == "__main__":
    main()
