#!/usr/bin/env python3
"""Evaluation CLI — mirrors the reference ``evaluate.py`` entry point.

    python3 evaluate.py --cfg cfg/p16t9c85r12.cfg \
        --toCompare <candidate_scene_dir> --benchmark <benchmark_scene_dir>

Scores both directories of predicted scenes against the stage-2 HR ground
truth with the shift-compensated cPSNR, prints per-band means, and writes
``comparison.png`` (benchmark-vs-candidate scatter).  With ``--norm-csv``
(the ESA per-scene baseline file) it also prints the leaderboard-style
normalized score (lower is better).
"""

import argparse
import logging

import numpy as np

logging.basicConfig(format="%(asctime)s - %(message)s", level=logging.INFO)
logger = logging.getLogger("evaluate")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default="cfg/p16t9c85r12.cfg")
    p.add_argument("--toCompare", type=str, required=True)
    p.add_argument("--benchmark", type=str, required=True)
    p.add_argument("--red-count", type=int, default=594,
                   help="sorted scenes [0, N) are RED, the rest NIR")
    p.add_argument("--bands", type=str, default="RED,NIR",
                   help="comma list of bands with stage-2 HR artifacts")
    p.add_argument("--norm-csv", type=str, default=None)
    p.add_argument("--score-json", type=str, default=None,
                   help="also write per-band means + normalized score as "
                        "JSON (machine-readable acceptance artifact)")
    p.add_argument("--out", type=str, default="comparison.png")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (hosts without an attached TPU; "
                        "the JAX_PLATFORMS env var alone is overridden by "
                        "TPU-site interpreter hooks)")
    return p.parse_args()


def main():
    opt = parse_args()
    if opt.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from probav_tpu.config import Config
    from probav_tpu.evaluation import (compare_runs, scatter_plot,
                                       load_norm_csv, normalized_score)
    from probav_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = Config.from_file(opt.cfg)
    bands = tuple(b.strip().upper() for b in opt.bands.split(",") if b.strip())
    results = compare_runs(cfg.preprocessing_out, opt.benchmark,
                           opt.toCompare, red_count=opt.red_count,
                           bands=bands)
    for band, r in results.items():
        logger.info("[ %s ] benchmark mean cPSNR %.3f | candidate %.3f",
                    band, float(np.mean(r["benchmark"])),
                    float(np.mean(r["candidate"])))
    out = scatter_plot(results, opt.out)
    logger.info("[ SAVE ] %s", out)

    report = {"bands": {
        band: {"benchmark_mean_cpsnr": float(np.mean(r["benchmark"])),
               "candidate_mean_cpsnr": float(np.mean(r["candidate"])),
               "scenes": int(len(r["candidate"]))}
        for band, r in results.items()}}

    if opt.norm_csv:
        from probav_tpu.config import BAND_OFFSETS
        from probav_tpu.infer import load_removed_sets

        norms = load_norm_csv(opt.norm_csv)
        scores = {}
        for band in results:
            # Mirror the submission writer's numbering (test.py:79-100):
            # per-band TRAIN offset, skipping removed scene ids, so each
            # cPSNR divides the matching scene's norm.
            i = BAND_OFFSETS[("TRAIN", band)]
            removed = set(load_removed_sets(
                band, search_dirs=(cfg.preprocessing_out, ".")))
            for v in results[band]["candidate"]:
                while i in removed:
                    i += 1
                scores[f"imgset{i:04d}"] = float(v)
                i += 1
        report["normalized_score"] = float(normalized_score(scores, norms))
        logger.info("[ SCORE ] normalized (lower is better): %.4f",
                    report["normalized_score"])

    if opt.score_json:
        import json
        with open(opt.score_json, "w") as f:
            json.dump(report, f, indent=1)
        logger.info("[ SAVE ] %s", opt.score_json)


if __name__ == "__main__":
    main()
