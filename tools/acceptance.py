#!/usr/bin/env python3
"""Turn-key acceptance run against a real ESA-layout PROBA-V dataset.

The reference's acceptance story is its README score table over the real
ESA data (/root/reference/README.md:100-216): download the Kelvins
PROBA-V dataset, run the pipeline + training, serve the test split, and
score the train split against the per-scene baseline ``norm.csv``.  This
tool makes that a single command for probav_tpu: point ``--raw-tree`` at
the dataset root and it runs the four CLIs as real subprocesses —

    data_generator.py (per band) -> train.py --band BOTH
        -> test.py (TEST + TRAIN splits, per band) -> evaluate.py

— recording per-stage wall/RSS like tools/full_rehearsal.py, and finally
emits a leaderboard-style score table (per-band mean cPSNR + the
normalized ESA score) to stdout and ``<workdir>/acceptance_report.json``.

Expected ``--raw-tree`` layout (the Kelvins download, unmodified; see
reference utils/dataGenerator.py:78 and README dataset section):

    <raw-tree>/
      norm.csv                     # per-scene baseline cPSNRs (ships with
                                   # the dataset; also on the Kelvins page)
      train/RED/imgset0000/ {LR000.png, QM000.png, ..., HR.png, SM.png}
      train/RED/imgset0001/ ...    # scene ids 0000-0593 on the real data
      train/NIR/imgset0594/ ...    # 0594-1305 on the real data
      test/RED/imgset1160/  {LR*.png, QM*.png}        # no HR on test
      test/NIR/imgset1306/  ...

Scene counts and the RED/NIR id boundary are DISCOVERED from the tree,
so subsets (or the synthetic rehearsal tree) work unchanged.  Everything
scoring-relevant mirrors the reference recipe: training scores come from
serving the TRAIN split and comparing against stage-2 ground truth with
``norm.csv`` normalization; TEST-split outputs are the submission images.

Usage:
    python tools/acceptance.py --raw-tree /data/probav \
        [--workdir /root/acceptance] [--cfg cfg/p16t9c85r12.cfg]
        [--epochs 100] [--norm-csv <raw-tree>/norm.csv]
        [--skip-preprocess] [--skip-train] [--skip-serve] [--cpu]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import full_rehearsal


def discover_counts(raw):
    """Scene counts per (split, band) plus the sorted-id RED boundary."""
    counts, ids = {}, {}
    for split in ("train", "test"):
        for band in ("RED", "NIR"):
            d = os.path.join(raw, split, band)
            scenes = sorted(s for s in os.listdir(d)
                            if s.startswith("imgset")) if os.path.isdir(d) \
                else []
            counts[(split, band)] = len(scenes)
            ids[(split, band)] = scenes
    missing = [k for k, v in counts.items() if v == 0]
    if missing:
        sys.exit(f"--raw-tree is missing scenes under {missing}; expected "
                 "train/{RED,NIR}/imgsetXXXX and test/{RED,NIR}/imgsetXXXX")
    return counts, ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-tree", required=True,
                    help="ESA PROBA-V dataset root (layout in module doc)")
    ap.add_argument("--workdir", default="/root/acceptance",
                    help="artifacts/checkpoints/outputs land here")
    ap.add_argument("--cfg", default=os.path.join(REPO,
                                                  "cfg/p16t9c85r12.cfg"),
                    help="base cfg; its [Directories] are overridden to "
                         "point at --raw-tree and --workdir")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the cfg's epoch count")
    ap.add_argument("--norm-csv", default=None,
                    help="per-scene baseline csv (default "
                         "<raw-tree>/norm.csv; skip scoring if absent)")
    ap.add_argument("--skip-preprocess", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-serve", action="store_true")
    ap.add_argument("--fused", default="t", choices=["off", "t"])
    ap.add_argument("--cpu", action="store_true",
                    help="run every stage on host CPU")
    args = ap.parse_args()

    raw = os.path.abspath(args.raw_tree)
    ws = os.path.abspath(args.workdir)
    os.makedirs(ws, exist_ok=True)
    full_rehearsal._REPORT = os.path.join(ws, "acceptance_report.json")

    counts, _ = discover_counts(raw)
    red_count = counts[("train", "RED")]
    results = {"args": vars(args), "steps": {},
               "counts": {f"{s}_{b}": n for (s, b), n in counts.items()}}

    # Rewrite the cfg's [Directories] onto --raw-tree/--workdir, keeping
    # every training/net/preprocessing value from --cfg verbatim.
    out = os.path.join(ws, "out")
    cfg_path = os.path.join(ws, "acceptance.cfg")
    with open(args.cfg) as f:
        lines = f.read().splitlines()
    overrides = {"raw_data": raw,
                 "preprocessing_out": out,
                 "model_out": os.path.join(out, "modelInfo"),
                 "train_out": os.path.join(out, "trainout"),
                 "test_out": os.path.join(out, "testout")}
    if args.epochs is not None:
        overrides["epochs"] = str(args.epochs)
    with open(cfg_path, "w") as f:
        for line in lines:
            key = line.split("=")[0].strip()
            if key in overrides:
                f.write(f"{key}={overrides.pop(key)}\n")
            else:
                f.write(line + "\n")
        for key, val in overrides.items():   # cfg had no such line
            f.write(f"{key}={val}\n")

    env = dict(os.environ)
    env.setdefault("PROBAV_COMPILE_CACHE", os.path.join(ws, "xla_cache"))
    py = sys.executable
    cpu = ["--cpu"] if args.cpu else []

    if not args.skip_preprocess:
        for band in ("NIR", "RED"):
            full_rehearsal.run_step(
                f"data_generator_{band}",
                [py, os.path.join(REPO, "data_generator.py"),
                 "--cfg", cfg_path, "--band", band, "--cpu"],
                results, env=env, cwd=ws)

    if not args.skip_train:
        train_args = [py, os.path.join(REPO, "train.py"),
                      "--cfg", cfg_path, "--band", "BOTH"] + cpu
        if not args.cpu:
            train_args += ["--bf16", "--device-data"]
            if args.fused == "t":
                train_args += ["--fused-stack", "t"]
        full_rehearsal.run_step("train_BOTH", train_args, results,
                                env=env, cwd=ws)

    if not args.skip_serve:
        for split in ("TEST", "TRAIN"):
            for band in ("NIR", "RED"):
                test_args = [py, os.path.join(REPO, "test.py"),
                             "--cfg", cfg_path, "--band", band,
                             "--totest", split] + cpu
                if not args.cpu:
                    test_args += ["--bf16", "--fused-stack", args.fused]
                full_rehearsal.run_step(f"test_{split}_{band}", test_args,
                                        results, env=env, cwd=ws)

    # Scoring: serve-the-train-split outputs vs stage-2 HR ground truth,
    # normalized by the dataset's norm.csv (reference evaluate.py recipe).
    norm_csv = args.norm_csv or os.path.join(raw, "norm.csv")
    score_json = os.path.join(ws, "score.json")
    from probav_tpu.config import Config
    train_out = Config.from_file(cfg_path).out_dir("TRAIN")
    eval_args = [py, os.path.join(REPO, "evaluate.py"), "--cfg", cfg_path,
                 "--toCompare", train_out, "--benchmark", train_out,
                 "--red-count", str(red_count),
                 "--score-json", score_json,
                 "--out", os.path.join(ws, "comparison.png")] + cpu
    if os.path.exists(norm_csv):
        eval_args += ["--norm-csv", norm_csv]
    else:
        print(f"[acceptance] WARNING: no norm.csv at {norm_csv} — "
              "per-band cPSNR only, no normalized ESA score", flush=True)
    full_rehearsal.run_step("evaluate", eval_args, results, env=env, cwd=ws)

    with open(score_json) as f:
        score = json.load(f)
    results["score"] = score
    full_rehearsal._save(results)

    print("\n================ acceptance score table ================")
    print(f"{'band':>6} {'scenes':>7} {'mean cPSNR (dB)':>16}")
    for band, r in score.get("bands", {}).items():
        print(f"{band:>6} {r['scenes']:>7} {r['candidate_mean_cpsnr']:>16.4f}")
    if "normalized_score" in score:
        print(f"normalized ESA score (lower is better): "
              f"{score['normalized_score']:.4f}")
    print(f"submission images: {Config.from_file(cfg_path).out_dir('TEST')}")
    print(f"report: {full_rehearsal._REPORT}")


if __name__ == "__main__":
    main()
