#!/usr/bin/env python3
"""Evaluation-scorer throughput: legacy crop-stack path vs the scan scorer.

REHEARSAL_r04 measured evaluate.py at ~4.7 scenes/s (559 s for ~2,612
scene scores) — slower than generating the same scenes.  The round-5
rewrite of ``per_scene_cpsnr`` scores with a per-(size,batch) cached jit
whose 49-shift loop is a ``lax.scan`` reducing each crop to its [B] sums
immediately (no [49, B, 378, 378, 1] stack), edge-pads ragged tails to a
canonical batch, transfers integral scenes as uint16, and windows
dispatch.  This probe times both paths on the chip at the rehearsal
geometry (384^2 scenes, matching reference evaluate.py:76-87 workloads).

    python tools/eval_bench.py [--scenes 146] [--batch 16] [--legacy]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def legacy_per_scene_cpsnr(hr, pred, batch=16):
    """The pre-round-5 scorer (git 3321438 compare.py:66-80): jit of the
    training-path loss over fixed batches, materializing the full 49-crop
    shift stack per batch, no tail padding, sync fetch per batch."""
    import jax
    import numpy as np
    from probav_tpu.ops import ShiftCompensatedLosses

    size = hr.shape[1]
    losses = ShiftCompensatedLosses(target_shape=(size, size, 1),
                                    use_pallas=False)
    fn = jax.jit(losses.cpsnr)
    out = []
    mask = (~np.ma.getmaskarray(hr)).astype(np.float32)
    data = np.asarray(hr, dtype=np.float32)
    for s in range(0, len(hr), batch):
        out.append(np.asarray(fn(data[s:s + batch], mask[s:s + batch],
                                 pred[s:s + batch])))
    return np.concatenate(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=146,
                    help="scene count (146 = rehearsal test_RED)")
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--legacy", action="store_true",
                    help="also time the pre-round-5 crop-stack path")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from probav_tpu.evaluation.compare import per_scene_cpsnr

    rng = np.random.default_rng(7)
    data = np.round(rng.uniform(0, 60000,
                                (args.scenes, args.size, args.size, 1))
                    ).astype(np.float32)
    hidden = rng.uniform(size=data.shape) < 0.05
    hr = np.ma.masked_array(data, mask=hidden)
    # Round: product predictions are PNG-derived integers (test.py writes
    # uint16), so the scorer's uint16 transfer compaction applies to them.
    pred = np.round(np.clip(data + rng.normal(0, 300, data.shape),
                            0, 65535)).astype(np.float32)

    results = {"scenes": args.scenes, "size": args.size,
               "batch": args.batch}

    t0 = time.perf_counter()
    new_scores = per_scene_cpsnr(hr, pred, batch=args.batch)
    results["new_first_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    per_scene_cpsnr(hr, pred, batch=args.batch)
    results["new_warm_s"] = round(time.perf_counter() - t0, 2)
    results["new_scenes_per_s"] = round(args.scenes / results["new_warm_s"],
                                        1)

    if args.legacy:
        t0 = time.perf_counter()
        old_scores = legacy_per_scene_cpsnr(hr, pred, batch=args.batch)
        results["legacy_first_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        legacy_per_scene_cpsnr(hr, pred, batch=args.batch)
        results["legacy_warm_s"] = round(time.perf_counter() - t0, 2)
        results["legacy_scenes_per_s"] = round(
            args.scenes / results["legacy_warm_s"], 1)
        results["speedup_warm"] = round(
            results["legacy_warm_s"] / results["new_warm_s"], 2)
        results["max_abs_diff_db"] = float(
            np.max(np.abs(new_scores - old_scores)))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
