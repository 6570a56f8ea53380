#!/usr/bin/env python3
"""Preprocessing CLI — mirrors the reference ``utils/dataGenerator.py``.

    python3 data_generator.py --cfg cfg/p16t9c85r12.cfg --band NIR

Runs the five resumable pipeline stages selected by the cfg ``ckpt`` list
(override with ``--ckpt 2,3``).  ``--tech time`` switches registration to
masked time-domain cross-correlation (reference tech='time' path).
"""

import argparse
import logging

logging.basicConfig(format="%(asctime)s - %(message)s", level=logging.INFO)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="cfg/p16t9c85r12.cfg", type=str)
    p.add_argument("--band", default="NIR", type=str)
    p.add_argument("--ckpt", default=None, type=str,
                   help="comma-separated stage list overriding the cfg")
    p.add_argument("--tech", default="freq", choices=["freq", "time"])
    p.add_argument("--reg-backend", default="numpy", choices=["numpy", "jax"],
                   help="'jax' batches the registration FFTs on the "
                        "accelerator (both techniques)")
    p.add_argument("--cpu", action="store_true",
                   help="pin the jax registration backend to host CPU "
                        "(preprocessing is host work; use when no TPU is "
                        "attached)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--outlier-threshold", default=None, type=float,
                   help="legacy v1 filter (utils/utils.py:492-531): drop "
                        "LR frames with any pixel above this (try "
                        "32000-60000); train scenes left with <9 frames "
                        "are removed")
    p.add_argument("--outlier-min-frames", default=9, type=int,
                   help="minimum LR frames a scene must keep after the "
                        "outlier filter (reference uses 9)")
    return p.parse_args()


def main():
    opt = parse_args()
    if opt.cpu:
        # Must happen before any jnp use; the env var alone is not enough
        # on hosts whose sitecustomize force-selects a TPU platform.
        import jax
        jax.config.update("jax_platforms", "cpu")
    from probav_tpu.config import Config
    from probav_tpu.data import pipeline
    from probav_tpu.utils import enable_compile_cache

    enable_compile_cache()

    cfg = Config.from_file(opt.cfg)
    ckpts = ([int(x) for x in opt.ckpt.split(",")]
             if opt.ckpt else None)
    logging.info("[ CFG - INFO ] Using %s as config file...", opt.cfg)
    pipeline.run(cfg, opt.band, ckpts=ckpts,
                 registration_tech=opt.tech,
                 registration_backend=opt.reg_backend, seed=opt.seed,
                 outlier_threshold=opt.outlier_threshold,
                 outlier_min_frames=opt.outlier_min_frames)


if __name__ == "__main__":
    main()
