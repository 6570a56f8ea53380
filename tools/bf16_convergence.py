#!/usr/bin/env python3
"""bf16-vs-f32 convergence parity on a synthetic SR task (real TPU).

With ``--fused`` the bf16 run uses the production kernel tier
(``fused_stack='t'``, ops/pallas_tstack.py), so the comparison validates
the exact configuration bench.py reports: f32 plain XLA vs bf16 fused.

Validates the bf16 compute recipe (model compute dtype bfloat16, parameters
and loss in float32 — the reference's loss bit-depth contract, loss.py) by
training the flagship topology on a synthetic multi-frame SR dataset with
identical seed/schedule in both dtypes and comparing validation cPSNR
curves.  Acceptance: final val cPSNR within 0.1 dB.

The task is learnable and SR-shaped: LR frames are sub-shifted noisy copies
of a base field; HR is the 3x upsampled base.  Usage:

    python tools/bf16_convergence.py [steps] [--fused] [--filters 64]
        [--isolate-kernel] [--json out.json]

``--filters 64`` runs the reference's best-scoring topology
(/root/reference/README.md:213: 0.9411, 64 filters -> c_mid=512, c_dec=51);
``--isolate-kernel`` adds a bf16-plain-XLA arm so kernel-induced drift is
separated from dtype-induced drift.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCHDOG = 3000
threading.Timer(WATCHDOG, lambda: os._exit(17)).start()


def make_dataset(rng, n_scenes=600, patch=16, shift=6, t=9, scale=3,
                 mean=8075.2045, std=3160.7272):
    """Synthetic multi-frame SR patches in the flagship geometry.

    LR [N, p+shift, p+shift, T, 1]; HR [N, 3p, 3p, 1]; mask [N, 3p, 3p, 1].
    """
    import numpy as np

    lr_size = patch + shift
    hr_size = patch * scale
    big = lr_size + 4
    lrs = np.empty((n_scenes, lr_size, lr_size, t, 1), np.float32)
    hrs = np.empty((n_scenes, hr_size, hr_size, 1), np.float32)
    for s in range(n_scenes):
        field = rng.uniform(0, 1, (big, big))
        k = np.ones((3, 3)) / 9.0
        pad = np.pad(field, 1, mode="wrap")
        field = sum(pad[i:i + big, j:j + big] * k[i, j]
                    for i in range(3) for j in range(3))
        field = (field - field.min()) / (field.max() - field.min() + 1e-9)
        field = field * 4 * std / 3 + mean - std / 2
        for f in range(t):
            dy, dx = rng.integers(0, 3, size=2)
            frame = field[dy:dy + lr_size, dx:dx + lr_size]
            lrs[s, :, :, f, 0] = frame + rng.normal(0, std / 60, frame.shape)
        base = field[1:1 + lr_size, 1:1 + lr_size]
        crop = base[shift // 2: shift // 2 + patch,
                    shift // 2: shift // 2 + patch]
        hrs[s, :, :, 0] = np.kron(crop, np.ones((scale, scale)))
    masks = (rng.uniform(size=hrs.shape) > 0.05).astype(np.float32)
    return lrs, np.clip(hrs, 0, 65535), masks


def run_one(dtype_name, data, steps, seed=11, fused_stack=False,
            num_filters=32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from probav_tpu.models import WDSRConv3D
    from probav_tpu.ops import ShiftCompensatedLosses
    from probav_tpu.train import ModelTrainer, build_optimizer

    lrs, hrs, masks = data
    n_val = len(lrs) // 5
    xt, xv = lrs[n_val:], lrs[:n_val]
    yt, yv = hrs[n_val:], hrs[:n_val]
    mt, mv = masks[n_val:], masks[:n_val]

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = WDSRConv3D(scale=3, num_filters=num_filters, num_res_blocks=12,
                       exp_rate=8, decay_rate=0.8, num_img_lr=9,
                       patch_size_lr=16, mean=8075.2045, std=3160.7272,
                       dtype=dtype, fused_stack=fused_stack)
    losses = ShiftCompensatedLosses(target_shape=(48, 48, 1))
    import tempfile
    trainer = ModelTrainer(model, losses.l1, losses.cpsnr,
                           build_optimizer("nadam", 5e-4),
                           ckpt_dir=tempfile.mkdtemp(f"bf16conv_{dtype_name}"),
                           log_dir=tempfile.mkdtemp(f"bf16logs_{dtype_name}"),
                           eval_step=10 ** 9, log_every=10 ** 9)
    trainer.init_state(xt[:1], rng_seed=seed)

    batch = 128
    steps_per_epoch = max(1, len(xt) // batch)
    epochs = max(1, -(-steps // steps_per_epoch))
    t0 = time.perf_counter()
    trainer.fit_device(xt, [yt, mt], batch_size=batch, epochs=epochs,
                       val_data=[xv, yv, mv], val_steps=10 ** 9,
                       save_best_only=False, seed=seed)
    dt = time.perf_counter() - t0
    from probav_tpu.data.loader import Batcher
    vb = Batcher((xv, yv, mv), batch, seed=1, drop_remainder=False)
    val_loss, val_psnr = trainer.evaluate(vb, val_steps=10 ** 9)
    tag = dtype_name + ("+tstack" if fused_stack else "")
    print(f"[{tag}] steps={int(trainer.state.step)} "
          f"val_loss={val_loss:.4f} val_cPSNR={val_psnr:.4f} dB "
          f"({dt:.0f}s)", flush=True)
    return {"dtype": dtype_name, "steps": int(trainer.state.step),
            "val_loss": float(val_loss), "val_cpsnr": float(val_psnr),
            "seconds": round(dt, 1)}


def main():
    import numpy as np

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    rng = np.random.default_rng(123)
    print("building dataset...", flush=True)
    data = make_dataset(rng)
    fused = "t" if "--fused" in sys.argv else False
    filters = 32
    if "--filters" in sys.argv:   # 64 = the reference's best-scoring model
        filters = int(sys.argv[sys.argv.index("--filters") + 1])
    out = [run_one("f32", data, steps, num_filters=filters),
           run_one("bf16", data, steps, fused_stack=fused,
                   num_filters=filters)]
    delta = abs(out[0]["val_cpsnr"] - out[1]["val_cpsnr"])
    result = {"f32": out[0], "bf16": out[1],
              "delta_db": round(delta, 4), "pass_0.1db": delta <= 0.1,
              "filters": filters}
    if fused and "--isolate-kernel" in sys.argv:
        # Third arm isolating the kernel from the dtype: bf16 PLAIN XLA
        # vs bf16 fused — any drift here is the kernel's alone.
        extra = run_one("bf16", data, steps, fused_stack=False,
                        num_filters=filters)
        result["bf16_plain"] = extra
        result["kernel_delta_db"] = round(
            abs(extra["val_cpsnr"] - out[1]["val_cpsnr"]), 4)
    print(json.dumps(result))
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
