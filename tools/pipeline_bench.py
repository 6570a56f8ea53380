#!/usr/bin/env python3
"""End-to-end preprocessing pipeline throughput at real ESA geometry.

Synthesizes a raw PROBA-V-shaped tree (128x128 16-bit LR frames, ragged
9/13/19-frame scenes, 384x384 HR, both bands) and times each of the five
resumable pipeline stages through the public ``pipeline.run`` entry point
with the flagship cfg values (patch 16/stride 16, k=9, thresholds
0.85/0.3/0.85) — the same artifact contract the reference's
utils/dataGenerator.py produces over hours of single-threaded Python.

The reference itself cannot run on this host (it imports the removed
``skimage.feature.register_translation`` API), so no same-host baseline
is timed; instead the tool reports absolute per-stage wall time, per-band
scenes/sec, and a projection to the full ~1160-scene train split.

Usage:
    python tools/pipeline_bench.py [--train N] [--test M]
        [--reg-backend numpy|jax] [--cpu] [--keep]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CFG_TEMPLATE = """
[Directories]
raw_data={raw}
preprocessing_out={out}
model_out={out}/modelInfo
train_out={out}/trainout
test_out={out}/testout

[Train]
batch_size=128
epochs=100
learning_rate=0.0005
optimizer=nadam
loss=l1
split=0.2

[Net]
num_res_blocks=12
num_low_res_imgs=9
scale=3
num_filters=32
kernel_size=3
exp_rate=8
decay_rate=0.8
is_grayscale=1

[Preprocessing]
max_shift=6
patch_size=16
patch_stride=16
num_low_res_imgs_pre=9
low_res_patch_thresholds=0.85
low_res_threshold=0.3
high_res_threshold=0.85
num_low_res_permute=0
to_flip=0
to_rotate=0
ckpt=1,2,3,4,5
"""

LR = 128
SCALE = 3
FRAME_CHOICES = (9, 13, 19)   # the dataset's ragged 9-19 frame counts


def _smooth_field(rng, size):
    x = rng.uniform(0, 1, (size, size)).astype(np.float64)
    k = np.ones((3, 3)) / 9.0
    for _ in range(2):
        pad = np.pad(x, 1, mode="wrap")
        x = sum(pad[i:i + size, j:j + size] * k[i, j]
                for i in range(3) for j in range(3))
    x = (x - x.min()) / (x.max() - x.min() + 1e-9)
    return (x * 40000 + 5000).astype(np.uint16)


def make_raw_tree(root, n_train, n_test, seed=0):
    """Raw tree at real geometry: ragged frame counts, partial occlusion."""
    from probav_tpu.utils.io import write_png

    rng = np.random.default_rng(seed)
    for band in ("NIR", "RED"):
        for split, n_scenes, with_hr in (("train", n_train, True),
                                         ("test", n_test, False)):
            for s in range(n_scenes):
                d = os.path.join(root, split, band, f"imgset{s:04d}")
                os.makedirs(d, exist_ok=True)
                base = _smooth_field(rng, LR)
                frames = FRAME_CHOICES[s % len(FRAME_CHOICES)]
                for f in range(frames):
                    dy, dx = rng.integers(-3, 4, size=2)
                    frame = np.roll(base, (dy, dx), axis=(0, 1))
                    noise = rng.normal(0, 50, frame.shape)
                    img = np.clip(frame.astype(np.int64) + noise, 0, 65535)
                    write_png(os.path.join(d, f"LR{f:03d}.png"),
                              img.astype(np.uint16))
                    qm = np.full(frame.shape, 255, np.uint16)
                    if f % 3 == 1:   # occlude a block on every third frame
                        y0, x0 = rng.integers(0, LR - 24, size=2)
                        qm[y0:y0 + 24, x0:x0 + 24] = 0
                    write_png(os.path.join(d, f"QM{f:03d}.png"), qm)
                if with_hr:
                    hr = np.kron(base, np.ones((SCALE, SCALE), np.uint16))
                    write_png(os.path.join(d, "HR.png"), hr)
                    sm = np.full(hr.shape, 255, np.uint16)
                    sm[:8, :8] = 0
                    write_png(os.path.join(d, "SM.png"), sm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", type=int, default=48,
                    help="train scenes per band")
    ap.add_argument("--test", type=int, default=16,
                    help="test scenes per band")
    ap.add_argument("--reg-backend", default="numpy",
                    choices=("numpy", "jax"))
    ap.add_argument("--cpu", action="store_true",
                    help="force the jax backend onto CPU")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workspace (prints its path)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from probav_tpu.config import Config
    from probav_tpu.data import pipeline
    from probav_tpu.utils import enable_compile_cache

    enable_compile_cache()   # what a user gets via the CLIs

    ws = tempfile.mkdtemp(prefix="pipeline_bench_")
    raw = os.path.join(ws, "raw")
    print(f"[pipeline_bench] generating {args.train}+{args.test} scenes "
          f"x 2 bands at {LR}x{LR} (ragged {FRAME_CHOICES} frames) ...",
          flush=True)
    t0 = time.perf_counter()
    make_raw_tree(raw, args.train, args.test)
    print(f"[pipeline_bench] raw tree in {time.perf_counter() - t0:.1f}s",
          flush=True)

    cfg_path = os.path.join(ws, "bench.cfg")
    with open(cfg_path, "w") as f:
        f.write(CFG_TEMPLATE.format(raw=raw, out=os.path.join(ws, "out")))
    cfg = Config.from_file(cfg_path)

    stage_s = {}
    # Stage 1 ingests BOTH bands (reference contract); stages 2-5 are
    # per-band — run them for NIR and double when projecting.
    for stage in (1, 2, 3, 4, 5):
        t0 = time.perf_counter()
        pipeline.run(cfg, "NIR", ckpts=[stage], progress=False,
                     registration_backend=args.reg_backend)
        stage_s[stage] = time.perf_counter() - t0
        print(f"[pipeline_bench] stage {stage}: {stage_s[stage]:7.2f} s",
              flush=True)

    scenes_band = args.train + args.test
    total = sum(stage_s.values())
    # per-band time: stage 1 covered both bands, halve it
    per_band = total - stage_s[1] / 2
    rate = scenes_band / per_band
    # full dataset: ~1160 train + ~290 test scenes per band
    proj_min = (1160 + 290) / rate / 60
    result = {
        "metric": f"preprocess_scenes_per_sec_{args.reg_backend}",
        "value": round(rate, 2),
        "unit": "scenes/sec/band",
        "stage_seconds": {str(k): round(v, 2) for k, v in stage_s.items()},
        "scenes_per_band": scenes_band,
        "projected_full_band_minutes": round(proj_min, 1),
    }
    print(json.dumps(result))
    if args.keep:
        print(f"[pipeline_bench] workspace kept: {ws}")
    else:
        shutil.rmtree(ws, ignore_errors=True)


if __name__ == "__main__":
    main()
