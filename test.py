#!/usr/bin/env python3
"""Inference/submission CLI — mirrors the reference ``test.py`` entry point.

    python3 test.py --cfg cfg/p16t9c85r12.cfg --band NIR --totest TEST

Loads the resolver patches written by pipeline stage 4, restores the latest
checkpoint for the (cfg, band) pair, super-resolves every scene (whole patch
grid in one TPU call), and writes uint16 ``imgset%04d.png`` files with the
reference's band/split numbering, skipping removed scenes.

Extension: ``--tta`` enables temporal-permutation test-time augmentation
(the reference's unused resolveBySampleAveraging, test.py:137-146).
"""

import argparse
import logging
import os

import numpy as np

logging.basicConfig(format="%(asctime)s - %(message)s", level=logging.INFO)
logging.getLogger("absl").setLevel(logging.WARNING)
logger = logging.getLogger("test")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="cfg/p16t9c85r12.cfg", type=str)
    p.add_argument("--band", type=str, default="RED")
    p.add_argument("--totest", type=str, default="TEST")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--mesh-data", type=int, default=0,
                   help="shard each scene's patch grid over N chips")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype for the forward (faster; "
                        "default f32 keeps submissions bit-identical)")
    p.add_argument("--fused-stack", choices=["off", "t"], default="off",
                   help="'t' = the production fused Pallas stack; the "
                        "resolver batches scenes per device call to reach "
                        "its 128-lane alignment")
    p.add_argument("--stack-loop", default="unroll",
                   help="fused-stack block-loop form ('unroll', 'scan', or "
                        "'scan:<k>'); 'scan' compiles one instance per "
                        "kernel (measured 4.8x smaller executable and ~4x "
                        "faster warm start at 26%% slower steady state — "
                        "BENCH_NOTES.md round 5); 'scan:<k>' unrolls k "
                        "blocks per scan iteration (measured best: scan:2)")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (hosts without an attached TPU; "
                        "the JAX_PLATFORMS env var alone is overridden by "
                        "TPU-site interpreter hooks)")
    return p.parse_args()


def restore_params(ckpt_dir: str):
    """Pull just the model parameters from the latest orbax checkpoint."""
    import orbax.checkpoint as ocp
    mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    restored = mngr.restore(step)
    logger.info("[ INFO ] Restored checkpoint at step %d.", step)
    return restored["state"]["params"]


def main():
    opt = parse_args()
    if opt.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from probav_tpu.config import Config
    from probav_tpu.infer import Resolver, load_removed_sets, write_submission
    from probav_tpu.models import build_model
    from probav_tpu.utils import enable_compile_cache
    from probav_tpu.utils.io import load_npy

    enable_compile_cache()
    cfg = Config.from_file(opt.cfg)
    data_dir = cfg.stage_dir("resolverDir")
    logger.info("[ INFO ] Loading data...")
    patches = load_npy(os.path.join(
        data_dir, f"{opt.totest}patchesLR_{opt.band}.npy"))
    # [S, P, T, C, h, w] -> [S, P, h, w, T, C] (test.py:38)
    patches = np.asarray(patches, dtype=np.float32).transpose(0, 1, 4, 5, 2, 3)

    logger.info("[ INFO ] Building model...")
    import jax.numpy as jnp
    mesh = None
    if opt.mesh_data:
        from probav_tpu.parallel import make_mesh
        mesh = make_mesh(num_data=opt.mesh_data, num_model=1)
    fused = "t" if opt.fused_stack == "t" else False
    model = build_model(cfg, opt.band,
                        dtype=jnp.bfloat16 if opt.bf16 else jnp.float32,
                        fused_stack=fused,
                        mesh=mesh if fused else None,
                        stack_loop=opt.stack_loop)
    params = restore_params(cfg.ckpt_dir(opt.band))

    scene = cfg.patch_size * cfg.scale * int(np.sqrt(patches.shape[1]))
    resolver = Resolver(model, params, scene_size=scene, mesh=mesh)
    logger.info("[ INFO ] Generating predictions...")
    scenes = resolver.resolve_all(patches, tta=opt.tta)

    out_dir = cfg.out_dir(opt.totest)
    removed = load_removed_sets(opt.band,
                                search_dirs=(cfg.preprocessing_out, "."))
    written = write_submission(scenes, out_dir, opt.band, opt.totest, removed)
    logger.info("[ SAVE ] Wrote %d scenes to %s", len(written), out_dir)


if __name__ == "__main__":
    main()
