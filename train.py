#!/usr/bin/env python3
"""Training CLI — mirrors the reference ``train.py`` entry point.

    python3 train.py --cfg cfg/p16t9c85r12.cfg --band NIR [--modelType patchNet]

Loads the stage-5 artifacts from ``augmentedPatchesDir``, builds the model
for the band (with the hard-coded dataset statistics, reference
train.py:47-52), selects optimizer/loss from the cfg, and trains with
checkpoint auto-resume.  TPU-native extensions beyond the reference flags:

  --mesh-data N --mesh-model M   multi-chip mesh (data/tensor parallel)
  --bf16                         bfloat16 compute dtype for the conv stack
  --fused-stack {off,flat,t}     WDSR-B block-stack kernel tier ('t' is the
                                 production Pallas path on TPU)
  --staged-decay                 the 10/20-epoch lr decay schedule
"""

import argparse
import logging
import os

import numpy as np

logging.basicConfig(format="%(asctime)s - %(message)s", level=logging.INFO)
logging.getLogger("absl").setLevel(logging.WARNING)
logger = logging.getLogger("train")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="cfg/p16t9c85r12.cfg", type=str)
    p.add_argument("--band", type=str, default="NIR",
                   help="NIR | RED | BOTH (sequential per-band runs, the "
                        "reference's per-band process recipe)")
    p.add_argument("--modelType", type=str, default="patchNet",
                   choices=["patchNet", "fusionNet", "iwdsr"])
    p.add_argument("--mesh-data", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh size")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fused-stack", choices=["off", "flat", "t"],
                   default="off",
                   help="WDSR-B block-stack kernel tier. 't' is the ONLY "
                        "production tier (transposed fused Pallas stack; "
                        "needs the per-shard batch to be a multiple of 128, "
                        "i.e. global batch = 128 x --mesh-data, else it "
                        "falls back to plain XLA with a warning; composes "
                        "with data parallelism only, not --mesh-model > 1). "
                        "'flat' is a measured-losing archive path kept for "
                        "benchmark records — do not ship it.")
    p.add_argument("--stack-loop", default="unroll",
                   help="fused-stack block-loop form: 'unroll', 'scan', or "
                        "'scan:<k>'. 'scan' runs the same kernels under "
                        "lax.scan: one executable instance per kernel "
                        "instead of num_res_blocks. Measured on chip "
                        "(BENCH_NOTES.md round 5): 4.8x smaller cache "
                        "entry (16.7 vs 79.8 MB), ~4x faster warm start "
                        "(17.7 vs 72.7 s), 9x faster first compile, but "
                        "26%% slower steady-state (55.2 vs 43.9 ms/step) — "
                        "use for dev iteration; keep 'unroll' for long "
                        "production runs. 'scan:<k>' unrolls k blocks per "
                        "scan iteration; measured best: scan:2 (52.2 "
                        "ms/step, 14.7 s warm start, 22.6 MB cache entry — "
                        "beats plain scan on both axes; k>2 buys nothing, "
                        "see BENCH_NOTES).")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize WDSR blocks (activation-memory saver)")
    p.add_argument("--staged-decay", action="store_true")
    p.add_argument("--eval-step", type=int, default=1000)
    p.add_argument("--save-best-only", action="store_true")
    p.add_argument("--device-data", action="store_true",
                   help="pin the dataset in device memory and train via the "
                        "lax.scan inner loop (single-chip fast path)")
    p.add_argument("--profile-dir", type=str, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (smoke runs on hosts without an "
                        "attached TPU; the JAX_PLATFORMS env var alone is "
                        "overridden by TPU-site interpreter hooks)")
    return p.parse_args()


def patch_net(cfg, opt):
    import jax.numpy as jnp
    from probav_tpu.models import build_model
    from probav_tpu.ops import ShiftCompensatedLosses
    from probav_tpu.parallel import make_mesh
    from probav_tpu.train import ModelTrainer, build_optimizer
    from probav_tpu.utils.io import load_npy

    data_dir = cfg.stage_dir("augmentedPatchesDir")
    logger.info("[ INFO ] Loading data...")
    x_train = load_npy(os.path.join(data_dir, f"TRAINpatchesLR_{opt.band}.npy"))
    x_val = load_npy(os.path.join(data_dir, f"TRAINVALpatchesLR_{opt.band}.npy"))
    y_train = load_npy(os.path.join(data_dir, f"TRAINpatchesHR_{opt.band}.npy"))
    y_val = load_npy(os.path.join(data_dir, f"TRAINVALpatchesHR_{opt.band}.npy"))
    y_train_mask = np.asarray(~y_train.mask, dtype=np.float32)
    y_val_mask = np.asarray(~y_val.mask, dtype=np.float32)
    x_train = np.asarray(x_train, dtype=np.float32)
    x_val = np.asarray(x_val, dtype=np.float32)
    y_train = np.asarray(y_train, dtype=np.float32)
    y_val = np.asarray(y_val, dtype=np.float32)

    mesh = None
    if opt.mesh_data:
        mesh = make_mesh(num_data=opt.mesh_data, num_model=opt.mesh_model)
        logger.info("[ INFO ] Mesh: %s", dict(mesh.shape))

    logger.info("[ INFO ] Building model...")
    model_type = "iwdsr" if opt.modelType == "iwdsr" else "wdsr"
    fused_stack = {"off": False, "flat": True, "t": "t"}[opt.fused_stack]
    model = build_model(cfg, opt.band, model_type=model_type,
                        dtype=jnp.bfloat16 if opt.bf16 else jnp.float32,
                        remat=opt.remat and model_type == "wdsr",
                        fused_stack=fused_stack if model_type == "wdsr"
                        else False,
                        mesh=mesh if fused_stack == "t" else None,
                        stack_loop=opt.stack_loop)

    steps_per_epoch = max(1, len(x_train) // cfg.batch_size)
    tx = build_optimizer(cfg.optimizer, cfg.learning_rate,
                         steps_per_epoch=steps_per_epoch,
                         use_staged_decay=opt.staged_decay)

    target = cfg.hr_patch_size
    losses = ShiftCompensatedLosses(target_shape=(target, target, 1))
    loss_fn = losses.by_name(cfg.loss)

    trainer = ModelTrainer(
        model, loss_fn, losses.cpsnr, tx,
        ckpt_dir=cfg.ckpt_dir(opt.band), log_dir=cfg.log_dir(opt.band),
        eval_step=opt.eval_step, mesh=mesh,
        loss_per_sample_fn=losses.per_sample(cfg.loss),
        loss_weighted_fn=losses.weighted(cfg.loss))
    trainer.init_state(x_train[:1])

    if opt.device_data:
        result = trainer.fit_device(
            x_train, [y_train, y_train_mask], cfg.batch_size, cfg.epochs,
            val_data=[x_val, y_val, y_val_mask],
            save_best_only=opt.save_best_only)
    else:
        result = trainer.fit(
            x_train, [y_train, y_train_mask], cfg.batch_size, cfg.epochs,
            val_data=[x_val, y_val, y_val_mask],
            save_best_only=opt.save_best_only,
            profile_dir=opt.profile_dir)
    logger.info("[ SUCCESS ] %s", result)
    logger.info("[ SUCCESS ] Checkpoints in %s", cfg.ckpt_dir(opt.band))


def fusion_net(cfg, opt):
    """FuseNet training on SR outputs vs HR scenes (train.py:116-188)."""
    from probav_tpu.data.augment import split_patches
    from probav_tpu.evaluation.compare import load_scene_dir, load_hr_scenes
    from probav_tpu.models import build_model
    from probav_tpu.ops import ShiftCompensatedLosses
    from probav_tpu.train import ModelTrainer, build_optimizer

    sr_dir = cfg.out_dir("TRAIN")
    logger.info("[ INFO ] Loading SR data from %s...", sr_dir)
    inputs = load_scene_dir(sr_dir)
    hr = load_hr_scenes(cfg.preprocessing_out)[:len(inputs)]

    splits = split_patches(
        np.ma.masked_array(inputs, mask=np.zeros_like(inputs, bool)),
        hr, cfg.split)
    x_tr, x_val, y_tr, y_val = splits
    model = build_model(cfg, opt.band, model_type="fusenet")
    size = hr.shape[1]
    losses = ShiftCompensatedLosses(target_shape=(size, size, 1))
    tx = build_optimizer(cfg.optimizer, cfg.learning_rate)
    trainer = ModelTrainer(model, losses.l1, losses.cpsnr, tx,
                           ckpt_dir="fuseNetCkpt", log_dir="fuseNetLogs",
                           loss_per_sample_fn=losses.per_sample("l1"),
                           loss_weighted_fn=losses.weighted("l1"))
    trainer.init_state(np.asarray(x_tr[:1], np.float32))
    trainer.fit(np.asarray(x_tr, np.float32),
                [np.asarray(y_tr, np.float32),
                 np.asarray(~y_tr.mask, np.float32)],
                cfg.batch_size, cfg.epochs,
                val_data=[np.asarray(x_val, np.float32),
                          np.asarray(y_val, np.float32),
                          np.asarray(~y_val.mask, np.float32)])


def main():
    opt = parse_args()
    if opt.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from probav_tpu.config import Config
    from probav_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = Config.from_file(opt.cfg)
    bands = ["NIR", "RED"] if opt.band.upper() == "BOTH" else [opt.band]
    for band in bands:
        opt.band = band
        if opt.modelType == "fusionNet":
            fusion_net(cfg, opt)
        else:
            patch_net(cfg, opt)


if __name__ == "__main__":
    main()
