#!/usr/bin/env python3
"""Full-dataset-scale rehearsal through the four CLIs as real subprocesses.

The reference demonstrably ran its pipeline and 100-epoch training over the
full ESA PROBA-V dataset (~1,306 train + ~290 test scenes across both
bands) on a 64 GB + 72 GB-swap machine (/root/reference/README.md:144-147)
and served the resulting checkpoints.  This tool answers the same question
for probav_tpu: generate a synthetic raw tree at REAL ESA geometry and
scene counts, then run

    data_generator.py -> train.py --band BOTH -> test.py -> evaluate.py

as real subprocesses, recording per-stage wall time and peak RSS (VmHWM),
and finally the score table.  Optionally diffs ``--reg-backend jax`` vs
numpy stage-2 artifacts at this scale (the f32-vs-f64 argmax-tie question).

Real dataset shape reproduced (test.py:79-90, utils/dataGenerator.py:78):
  train: RED 594 scenes (ids 0-593), NIR 712 (ids 594-1305)
  test:  RED 146 (ids from 1160),    NIR 144 (ids from 1306)
  LR 128x128 uint16 x ragged 9-19 frames + QM; HR 384x384 + SM.

Usage:
    python tools/full_rehearsal.py --workdir /root/rehearsal \
        [--epochs 100] [--scale 1.0] [--skip-gen] [--reg-diff] [--cpu]

``--scale 0.1`` shrinks every scene count 10x for a smoke pass of the
harness itself.  Results land in <workdir>/rehearsal_report.json and are
summarized in BENCH_NOTES.md by hand.
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from tools.pipeline_bench import _smooth_field, CFG_TEMPLATE, LR, SCALE

COUNTS = {  # (band, split) -> scene count at --scale 1.0
    ("RED", "train"): 594, ("NIR", "train"): 712,
    ("RED", "test"): 146, ("NIR", "test"): 144,
}
# The dataset's ragged frame-count distribution: most scenes have 9-13
# frames, a tail reaches 19+ (probav leaderboard data description).
FRAME_CYCLE = (9, 9, 11, 13, 9, 13, 19, 9, 11, 9)


def make_band_tree(root, band, split, n_scenes, seed, progress_every=100):
    from probav_tpu.utils.io import write_png

    rng = np.random.default_rng(seed)
    with_hr = split == "train"
    t0 = time.perf_counter()
    for s in range(n_scenes):
        d = os.path.join(root, split, band, f"imgset{s:04d}")
        if os.path.exists(os.path.join(d, "LR000.png")):
            continue   # resumable generation
        os.makedirs(d, exist_ok=True)
        base = _smooth_field(rng, LR)
        frames = FRAME_CYCLE[s % len(FRAME_CYCLE)]
        for f in range(frames):
            dy, dx = rng.integers(-3, 4, size=2)
            frame = np.roll(base, (dy, dx), axis=(0, 1))
            noise = rng.normal(0, 50, frame.shape)
            img = np.clip(frame.astype(np.int64) + noise, 0, 65535)
            write_png(os.path.join(d, f"LR{f:03d}.png"),
                      img.astype(np.uint16))
            qm = np.full(frame.shape, 255, np.uint16)
            if f % 3 == 1:
                y0, x0 = rng.integers(0, LR - 24, size=2)
                qm[y0:y0 + 24, x0:x0 + 24] = 0
            write_png(os.path.join(d, f"QM{f:03d}.png"), qm)
        if with_hr:
            hr = np.kron(base, np.ones((SCALE, SCALE), np.uint16))
            write_png(os.path.join(d, "HR.png"), hr)
            sm = np.full(hr.shape, 255, np.uint16)
            sm[:8, :8] = 0
            write_png(os.path.join(d, "SM.png"), sm)
        if (s + 1) % progress_every == 0:
            rate = (s + 1) / (time.perf_counter() - t0)
            print(f"[gen] {band}/{split}: {s + 1}/{n_scenes} "
                  f"({rate:.1f} scenes/s)", flush=True)


class RssWatcher(threading.Thread):
    """Polls /proc/<pid>/status VmHWM while a subprocess runs."""

    def __init__(self, pid):
        super().__init__(daemon=True)
        self.pid, self.peak_kb, self._stop = pid, 0, threading.Event()

    def run(self):
        path = f"/proc/{self.pid}/status"
        while not self._stop.wait(0.5):
            try:
                with open(path) as f:
                    for line in f:
                        if line.startswith("VmHWM:"):
                            self.peak_kb = max(self.peak_kb,
                                               int(line.split()[1]))
                            break
            except OSError:
                return

    def stop(self):
        self._stop.set()


def run_step(name, argv, results, env=None, cwd=None):
    print(f"[rehearsal] ==> {name}: {' '.join(argv)}", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.Popen(argv, env=env, cwd=cwd or REPO)
    watch = RssWatcher(proc.pid)
    watch.start()
    code = proc.wait()
    watch.stop()
    wall = time.perf_counter() - t0
    entry = {"wall_s": round(wall, 1),
             "peak_rss_gb": round(watch.peak_kb / 1e6, 2),
             "exit": code}
    results["steps"][name] = entry
    print(f"[rehearsal] <== {name}: {wall:.0f}s, "
          f"peak RSS {entry['peak_rss_gb']} GB, exit {code}", flush=True)
    if code != 0:
        results["failed"] = name
        _save(results)
        sys.exit(f"step {name} failed (exit {code})")
    _save(results)
    return entry


_REPORT = None


def _save(results):
    with open(_REPORT, "w") as f:
        json.dump(results, f, indent=1)


def file_digest(path, chunk=1 << 22):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()[:16]


def main():
    global _REPORT
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/rehearsal")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scene-count multiplier (0.1 = smoke pass)")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--skip-preprocess", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--reg-diff", action="store_true",
                    help="re-run stage 2 with --reg-backend jax into a "
                         "copy and diff artifact digests vs numpy")
    ap.add_argument("--cpu", action="store_true",
                    help="run train/test on host CPU (harness smoke)")
    ap.add_argument("--tiny-net", action="store_true",
                    help="swap the flagship net for a 4-filter 1-block one "
                         "(harness smoke — tests/test_rehearsal_smoke.py "
                         "runs the whole loop at --scale 0.003 in minutes)")
    ap.add_argument("--fused", default="t", choices=["off", "t"])
    args = ap.parse_args()

    ws = os.path.abspath(args.workdir)
    os.makedirs(ws, exist_ok=True)
    _REPORT = os.path.join(ws, "rehearsal_report.json")
    results = {"args": vars(args), "steps": {}}
    if os.path.exists(_REPORT):
        with open(_REPORT) as f:
            prev = json.load(f)
        if prev.get("args", {}).get("scale") == args.scale:
            results["steps"].update(prev.get("steps", {}))

    raw = os.path.join(ws, "raw")
    out = os.path.join(ws, "out")
    cfg_path = os.path.join(ws, "rehearsal.cfg")
    # flagship cfg values (p16t9c85r12) with epochs overridden
    cfg_text = (CFG_TEMPLATE.format(raw=raw, out=out)
                .replace("epochs=100", f"epochs={args.epochs}"))
    if args.tiny_net:
        cfg_text = (cfg_text.replace("num_filters=32", "num_filters=4")
                    .replace("num_res_blocks=12", "num_res_blocks=1")
                    .replace("batch_size=128", "batch_size=4")
                    .replace("exp_rate=8", "exp_rate=2"))
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    counts = {k: max(2, int(round(v * args.scale)))
              for k, v in COUNTS.items()}
    results["counts"] = {f"{b}_{s}": n for (b, s), n in counts.items()}

    if not args.skip_gen:
        t0 = time.perf_counter()
        for (band, split), n in counts.items():
            make_band_tree(raw, band, split, n,
                           seed=hash((band, split)) % 2 ** 31)
        results["steps"]["generate"] = {
            "wall_s": round(time.perf_counter() - t0, 1)}
        _save(results)

    env = dict(os.environ)
    env.setdefault("PROBAV_COMPILE_CACHE",
                   os.path.join(ws, "xla_cache"))
    py = sys.executable
    cpu = ["--cpu"] if args.cpu else []

    # -- stage 1: preprocessing, per band (the reference's recipe) ------- #
    if not args.skip_preprocess:
        for band in ("NIR", "RED"):
            run_step(f"data_generator_{band}",
                     [py, os.path.join(REPO, "data_generator.py"),
                      "--cfg", cfg_path, "--band", band, "--cpu"],
                     results, env=env, cwd=ws)

    if args.reg_diff:
        # Stage-2 artifact parity: numpy (f64 host) vs jax (f32 device)
        # registration at dataset scale.  Copy the cfg with a second out
        # dir, run ckpt 1+2 with --reg-backend jax, digest-diff.
        out2 = os.path.join(ws, "out_jaxreg")
        cfg2 = os.path.join(ws, "rehearsal_jaxreg.cfg")
        with open(cfg2, "w") as f:
            f.write(CFG_TEMPLATE.format(raw=raw, out=out2)
                    .replace("epochs=100", f"epochs={args.epochs}"))
        for band in ("NIR",):
            run_step(f"data_generator_jaxreg_{band}",
                     [py, os.path.join(REPO, "data_generator.py"),
                      "--cfg", cfg2, "--band", band, "--ckpt", "1,2",
                      "--reg-backend", "jax"] + cpu,
                     results, env=env, cwd=ws)
            diffs = {}
            for name in (f"TRAINimgLR_{band}.npy", f"TRAINimgHR_{band}.npy",
                         f"TESTimgLR_{band}.npy"):
                a = os.path.join(out, "trimmedArrayDir", name)
                b = os.path.join(out2, "trimmedArrayDir", name)
                if os.path.exists(a) and os.path.exists(b):
                    da, db = file_digest(a), file_digest(b)
                    diffs[name] = {"numpy": da, "jax": db,
                                   "equal": da == db}
            results["reg_diff"] = diffs
            _save(results)

    # -- stage 2: training, both bands through the one CLI --------------- #
    if not args.skip_train:
        train_args = [py, os.path.join(REPO, "train.py"),
                      "--cfg", cfg_path, "--band", "BOTH",
                      "--eval-step", "2000"] + cpu
        if not args.cpu:
            train_args += ["--bf16", "--device-data"]
            if args.fused == "t":
                train_args += ["--fused-stack", "t"]
        run_step(f"train_BOTH_{args.epochs}ep", train_args,
                 results, env=env, cwd=ws)

    # -- stage 3: serving the full test split ----------------------------- #
    for band in ("NIR", "RED"):
        test_args = [py, os.path.join(REPO, "test.py"),
                     "--cfg", cfg_path, "--band", band,
                     "--totest", "TEST"] + cpu
        if not args.cpu:
            test_args += ["--bf16", "--fused-stack", args.fused]
        run_step(f"test_TEST_{band}", test_args, results, env=env, cwd=ws)
    # TRAIN split outputs feed evaluate.py (the reference's score recipe)
    for band in ("NIR", "RED"):
        test_args = [py, os.path.join(REPO, "test.py"),
                     "--cfg", cfg_path, "--band", band,
                     "--totest", "TRAIN"] + cpu
        if not args.cpu:
            test_args += ["--bf16", "--fused-stack", args.fused]
        run_step(f"test_TRAIN_{band}", test_args, results, env=env, cwd=ws)

    # -- stage 4: evaluation ---------------------------------------------- #
    # Synthetic norm.csv (flat 45 dB baseline): the SCORE is synthetic-data
    # relative, but the full numbering/removed-set/normalization plumbing
    # runs at real scale.
    n_red = counts[("RED", "train")]
    norm_csv = os.path.join(ws, "norm.csv")
    with open(norm_csv, "w") as f:
        # evaluate.py numbers candidates sequentially (RED then NIR), so
        # NIR norm ids start at n_red — at scale 1.0 that is the real
        # dataset's 594 boundary; hard-coding 594 left NIR un-normalized
        # at any other --scale.
        f.write("scene,norm\n")
        for i in range(n_red + counts[("NIR", "train")]):
            f.write(f"imgset{i:04d},45.0\n")
    from probav_tpu.config import Config
    train_out = Config.from_file(cfg_path).out_dir("TRAIN")
    run_step("evaluate",
             [py, os.path.join(REPO, "evaluate.py"), "--cfg", cfg_path,
              "--toCompare", train_out, "--benchmark", train_out,
              "--red-count", str(n_red),
              "--norm-csv", norm_csv,
              "--out", os.path.join(ws, "comparison.png")] + cpu,
             results, env=env, cwd=ws)

    print(json.dumps(results, indent=1))
    print(f"[rehearsal] report: {_REPORT}")


if __name__ == "__main__":
    main()
