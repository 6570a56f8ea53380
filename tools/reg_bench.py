#!/usr/bin/env python3
"""Stage-2 registration throughput: numpy vs per-scene jax vs batched jax.

Synthesizes a dataset-scale scene set (default 232 scenes = 1/5 of the
1160-scene PROBA-V train split, ragged 9/13/19 frame counts at the real
128x128 geometry) and times the three backends of
probav_tpu.ops.registration end-to-end through the public entry points.

Usage: python tools/reg_bench.py [n_scenes] [--cpu] [--time]
(--time additionally benches the tech='time' masked-NCC backends)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_scenes = 232
    for a in sys.argv[1:]:
        if a.isdigit():
            n_scenes = int(a)
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from probav_tpu.ops.registration import (register_image_set_jax,
                                             register_images)

    rng = np.random.default_rng(0)
    counts = [(9, 13, 19)[i % 3] for i in range(n_scenes)]
    oi = np.empty(n_scenes, dtype=object)
    om = np.empty(n_scenes, dtype=object)
    for i, n in enumerate(counts):
        im = rng.uniform(0, 65535, (n, 1, 128, 128)).astype(np.float32)
        for k in range(1, n):
            im[k] = np.roll(im[0], (k % 7 - 3, k % 5 - 2), axis=(1, 2))
        mk = (rng.uniform(size=im.shape) > 0.15).astype(np.uint16) * 255
        mk[0] = 255
        oi[i], om[i] = im, mk

    def timeit(label, fn, warm=True):
        if warm:
            fn()      # compile / warm caches
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label:28s} {dt:7.2f} s  ({n_scenes / dt:7.1f} scenes/s)",
              flush=True)
        return out

    a = timeit("numpy per-scene", lambda: register_images(oi, om), warm=False)
    b = timeit("jax per-scene (old path)",
               lambda: [register_image_set_jax(oi[i], om[i])
                        for i in range(n_scenes)])
    c = timeit("jax batched (new path)",
               lambda: register_images(oi, om, backend="jax"))
    worst = max(float(np.abs(b[i].data - c[i].data).max())
                for i in range(n_scenes))
    print(f"batched-vs-per-scene max |d| = {worst:g} (expect 0)")

    if "--time" in sys.argv:
        # tech='time' (Padfield masked NCC): host scipy loop vs the
        # batched device path.  Much heavier per frame (≈11 padded
        # 255x255 FFT surfaces vs 3 plain ones), so the host/device gap
        # is larger than for 'freq'.
        timeit("numpy per-scene (time)",
               lambda: register_images(oi, om, tech="time"), warm=False)
        timeit("jax batched (time)",
               lambda: register_images(oi, om, backend="jax", tech="time"))


if __name__ == "__main__":
    main()
