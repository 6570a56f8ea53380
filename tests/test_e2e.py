"""End-to-end slice: raw PNGs -> 5-stage pipeline -> train -> infer -> eval.

Exercises the same artifact contract the reference's CLIs share
(dataGenerator stage dirs, augmentedPatchesDir file names consumed by
train.py:39-42, resolverDir patches consumed by test.py:37, submission
numbering of test.py:79-100, evaluate.py scoring).
"""

import os

import numpy as np
import pytest

from probav_tpu.config import Config
from probav_tpu.data import pipeline
from probav_tpu.utils.io import load_npy, read_png

from synthetic_data import make_raw_tree, write_cfg


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    raw = make_raw_tree(str(root / "raw"), train_scenes=3, test_scenes=2,
                        frames=5)
    cfg_path = write_cfg(str(root / "synth.cfg"), raw=raw,
                         out=str(root / "chkpt"),
                         model_out=str(root / "modelInfo"),
                         train_out=str(root / "trainout"),
                         test_out=str(root / "testout"))
    cfg = Config.from_file(cfg_path)
    yield cfg, root


@pytest.fixture(scope="module")
def pipeline_done(workspace):
    cfg, root = workspace
    pipeline.run(cfg, "NIR", progress=False)
    return cfg, root


class TestPipelineBackendVariants:
    def test_stage2_time_tech_on_jax_backend(self, tmp_path, rng):
        """Pipeline-level integration of --tech time --reg-backend jax:
        stages 1-2 produce the trimmed-array contract artifacts with
        finite values and exactly the configured frame count."""
        raw = make_raw_tree(str(tmp_path / "raw"), bands=("NIR",),
                            train_scenes=2, test_scenes=1, frames=5,
                            seed=5)
        cfg = Config.from_file(write_cfg(
            str(tmp_path / "synth.cfg"), raw=raw,
            out=str(tmp_path / "chkpt"),
            model_out=str(tmp_path / "modelInfo"),
            train_out=str(tmp_path / "trainout"),
            test_out=str(tmp_path / "testout")))
        pipeline.run(cfg, "NIR", ckpts=[1, 2], progress=False,
                     registration_tech="time",
                     registration_backend="jax")
        for split in ("TRAIN", "TEST"):
            img = load_npy(os.path.join(cfg.stage_dir("trimmedArrayDir"),
                                        f"{split}imgLR_NIR.npy"))
            assert img.shape[1] == cfg.num_low_res_imgs_pre
            assert np.isfinite(np.asarray(img)).all()


class TestPipelineArtifacts:
    def test_stage_artifacts_exist_with_contract_names(self, pipeline_done):
        cfg, root = pipeline_done
        for rel in [
            ("arrayDir", "TRAINimgLR_NIR.npy"),
            ("arrayDir", "TESTmskLR_NIR.npy"),
            ("trimmedArrayDir", "TRAINimgLR_NIR.npy"),
            ("trimmedArrayDir", "TESTimgLR_NIR.npy"),
            ("patchesDir", "TRAINpatchesLR_NIR.npy"),
            ("patchesDir", "TRAINpatchesHR_NIR.npy"),
            ("resolverDir", "TRAINimgHR_NIR.npy"),
            ("resolverDir", "TESTpatchesLR_NIR.npy"),
            ("trimmedPatchesDir", "TRAINpatchesLR_NIR.npy"),
            ("augmentedPatchesDir", "TRAINpatchesLR_NIR.npy"),
            ("augmentedPatchesDir", "TRAINVALpatchesHR_NIR.npy"),
        ]:
            path = os.path.join(cfg.stage_dir(rel[0]), rel[1])
            assert os.path.exists(path), path

    def test_trimmed_has_exactly_k_frames(self, pipeline_done):
        cfg, _ = pipeline_done
        lr = load_npy(os.path.join(cfg.stage_dir("trimmedArrayDir"),
                                   "TRAINimgLR_NIR.npy"))
        assert lr.shape[1] == cfg.num_low_res_imgs_pre   # 5 frames -> 9 dups

    def test_patch_geometry(self, pipeline_done):
        cfg, _ = pipeline_done
        p = load_npy(os.path.join(cfg.stage_dir("resolverDir"),
                                  "TESTpatchesLR_NIR.npy"))
        # 32px LR + 3px pad each side = 38 -> 2x2 grid of 22px patches
        assert p.shape[1:] == (4, 9, 1, 22, 22), p.shape

    def test_model_layout_after_stage4(self, pipeline_done):
        cfg, _ = pipeline_done
        lr = load_npy(os.path.join(cfg.stage_dir("trimmedPatchesDir"),
                                   "TRAINpatchesLR_NIR.npy"))
        hr = load_npy(os.path.join(cfg.stage_dir("trimmedPatchesDir"),
                                   "TRAINpatchesHR_NIR.npy"))
        assert lr.shape[1:] == (22, 22, 9, 1)
        assert hr.shape[1:] == (48, 48, 1)
        assert lr.shape[0] == hr.shape[0]

    def test_augmentation_doubles_with_one_permute(self, pipeline_done):
        cfg, _ = pipeline_done
        tr = load_npy(os.path.join(cfg.stage_dir("augmentedPatchesDir"),
                                   "TRAINpatchesLR_NIR.npy"))
        hr = load_npy(os.path.join(cfg.stage_dir("augmentedPatchesDir"),
                                   "TRAINpatchesHR_NIR.npy"))
        assert len(tr) == len(hr)
        base = load_npy(os.path.join(cfg.stage_dir("trimmedPatchesDir"),
                                     "TRAINpatchesLR_NIR.npy"))
        val = load_npy(os.path.join(cfg.stage_dir("augmentedPatchesDir"),
                                    "TRAINVALpatchesLR_NIR.npy"))
        assert len(tr) == 2 * (len(base) - len(val))

    def test_removed_sets_file_written(self, pipeline_done):
        # Cfg-anchored (under preprocessing_out), independent of CWD.
        cfg, root = pipeline_done
        assert os.path.exists(cfg.removed_sets_path("NIR"))


class TestTrainInferEval:
    @pytest.fixture(scope="class")
    def trained(self, pipeline_done):
        cfg, root = pipeline_done
        import jax.numpy as jnp
        from probav_tpu.models import build_model
        from probav_tpu.ops import ShiftCompensatedLosses
        from probav_tpu.train import ModelTrainer, build_optimizer

        d = cfg.stage_dir("augmentedPatchesDir")
        x = np.asarray(load_npy(os.path.join(d, "TRAINpatchesLR_NIR.npy")),
                       dtype=np.float32)
        y = load_npy(os.path.join(d, "TRAINpatchesHR_NIR.npy"))
        xv = np.asarray(load_npy(os.path.join(d, "TRAINVALpatchesLR_NIR.npy")),
                        dtype=np.float32)
        yv = load_npy(os.path.join(d, "TRAINVALpatchesHR_NIR.npy"))
        y_mask = np.asarray(~y.mask, np.float32)
        yv_mask = np.asarray(~yv.mask, np.float32)
        y, yv = np.asarray(y, np.float32), np.asarray(yv, np.float32)

        model = build_model(cfg, "NIR")
        losses = ShiftCompensatedLosses((48, 48, 1), use_pallas=False)
        trainer = ModelTrainer(model, losses.by_name(cfg.loss), losses.cpsnr,
                               build_optimizer(cfg.optimizer, cfg.learning_rate),
                               ckpt_dir=cfg.ckpt_dir("NIR"),
                               log_dir=cfg.log_dir("NIR"), log_every=50)
        trainer.init_state(x[:1])
        res = trainer.fit(x, [y, y_mask], cfg.batch_size, cfg.epochs,
                          val_data=[xv, yv, yv_mask], val_steps=2,
                          save_best_only=False)
        return cfg, root, model, trainer, res

    def test_training_ran_and_checkpointed(self, trained):
        cfg, root, model, trainer, res = trained
        assert res["steps"] > 0
        assert np.isfinite(res["train_loss"])
        assert trainer.ckpt_mngr.latest_step() is not None

    def test_infer_writes_submission(self, trained):
        cfg, root, model, trainer, _ = trained
        from probav_tpu.infer import Resolver, write_submission

        patches = load_npy(os.path.join(cfg.stage_dir("resolverDir"),
                                        "TESTpatchesLR_NIR.npy"))
        patches = np.asarray(patches, np.float32).transpose(0, 1, 4, 5, 2, 3)
        scene = cfg.patch_size * cfg.scale * int(np.sqrt(patches.shape[1]))
        assert scene == 96
        resolver = Resolver(model, trainer.state.params, scene_size=scene)
        scenes = resolver.resolve_all(patches, progress=False)
        out = str(root / "subm")
        written = write_submission(scenes, out, "NIR", "TEST", removed=[])
        assert len(written) == len(patches)
        img = read_png(written[0])
        assert img.shape == (96, 96) and img.dtype == np.uint16
        assert os.path.basename(written[0]) == "imgset1306.png"

    def test_submission_numbering_skips_removed(self, trained):
        cfg, root, model, trainer, _ = trained
        from probav_tpu.infer import write_submission
        scenes = [np.zeros((96, 96, 1))] * 2
        out = str(root / "subm2")
        written = write_submission(scenes, out, "NIR", "TEST",
                                   removed=[1306, 1308])
        names = [os.path.basename(w) for w in written]
        assert names == ["imgset1307.png", "imgset1309.png"]

    def test_tta_resolver_runs(self, trained):
        cfg, root, model, trainer, _ = trained
        from probav_tpu.infer import Resolver
        patches = load_npy(os.path.join(cfg.stage_dir("resolverDir"),
                                        "TESTpatchesLR_NIR.npy"))
        patches = np.asarray(patches, np.float32).transpose(0, 1, 4, 5, 2, 3)
        resolver = Resolver(model, trainer.state.params, scene_size=96)
        scene = resolver.resolve_scene_tta(patches[0], repeats=3)
        assert scene.shape == (96, 96, 1)

    def test_evaluation_compare(self, trained):
        cfg, root, model, trainer, _ = trained
        from probav_tpu.infer import Resolver, write_submission
        from probav_tpu.evaluation import compare_runs, scatter_plot

        patches = load_npy(os.path.join(cfg.stage_dir("resolverDir"),
                                        "TRAINpatchesLR_NIR.npy"))
        patches = np.asarray(patches, np.float32).transpose(0, 1, 4, 5, 2, 3)
        resolver = Resolver(model, trainer.state.params, scene_size=96)
        scenes = resolver.resolve_all(patches, progress=False)
        out = str(root / "trainout_scenes")
        write_submission(scenes, out, "NIR", "TRAIN", removed=[], start_id=0)

        results = compare_runs(cfg.preprocessing_out, out, out, red_count=0,
                               bands=("NIR",))
        assert "NIR" in results
        psnr = results["NIR"]["candidate"]
        assert np.isfinite(psnr).all()
        np.testing.assert_array_equal(psnr, results["NIR"]["benchmark"])
        plot = scatter_plot(results, str(root / "cmp.png"))
        assert os.path.exists(plot)


class TestFullESAGeometry:
    def test_pipeline_and_resolve_at_128_to_384(self, tmp_path, rng):
        """Real ESA scene geometry: 128x128 LR -> 8x8 grid of 22^2 patches
        -> 384^2 reconstruction -> uint16 submission PNG."""
        import jax
        from synthetic_data import make_raw_tree, write_cfg
        from probav_tpu.models import WDSRConv3D
        from probav_tpu.infer import Resolver, write_submission

        raw = make_raw_tree(str(tmp_path / "raw"), bands=("NIR",),
                            train_scenes=2, test_scenes=1, frames=6,
                            lr_size=128)
        cfgp = write_cfg(str(tmp_path / "synth.cfg"), raw=raw,
                         out=str(tmp_path / "chkpt"),
                         model_out=str(tmp_path / "mi"),
                         train_out=str(tmp_path / "to"),
                         test_out=str(tmp_path / "te"))
        cfg = Config.from_file(cfgp)
        pipeline.run(cfg, "NIR", progress=False)

        p = load_npy(str(tmp_path / "chkpt" / "resolverDir" /
                         "TESTpatchesLR_NIR.npy"))
        assert p.shape == (1, 64, 9, 1, 22, 22), p.shape

        model = WDSRConv3D(scale=3, num_filters=4, num_res_blocks=1,
                           exp_rate=2, decay_rate=0.8, num_img_lr=9,
                           patch_size_lr=16, mean=8075.2045, std=3160.7272)
        patches = np.asarray(p, np.float32).transpose(0, 1, 4, 5, 2, 3)
        params = model.init(jax.random.PRNGKey(0), patches[0][:1])["params"]
        scenes = Resolver(model, params, scene_size=384).resolve_all(
            patches, progress=False)
        assert scenes[0].shape == (384, 384, 1)
        written = write_submission(scenes, str(tmp_path / "subm"), "NIR",
                                   "TEST", removed=[])
        img = read_png(written[0])
        assert img.shape == (384, 384) and img.dtype == np.uint16
        assert os.path.basename(written[0]) == "imgset1306.png"


class TestGroupedFusedResolver:
    def test_grouped_resolve_matches_per_scene(self, rng):
        """Scene batching (fused-tier alignment path): grouped device
        calls with on-device reconstruction + a padded ragged tail must
        reproduce the per-scene plain path."""
        import jax
        import probav_tpu.ops.pallas_tstack as ts
        from probav_tpu.models import WDSRConv3D
        from probav_tpu.infer import Resolver

        kw = dict(scale=3, num_filters=8, num_res_blocks=2, exp_rate=4,
                  decay_rate=0.8, num_img_lr=9, patch_size_lr=16,
                  mean=100.0, std=50.0)
        plain = WDSRConv3D(**kw)
        fused = WDSRConv3D(fused_stack="t", **kw)
        # 3 scenes of 4 patches (2x2 grid of 48^2 -> 96^2 scenes)
        patches = rng.uniform(50, 150, (3, 4, 22, 22, 9, 1)).astype(np.float32)
        params = plain.init(jax.random.PRNGKey(0), patches[0][:1])["params"]

        ref = Resolver(plain, params, scene_size=96)
        expect = [ref.resolve_scene(p) for p in patches]

        # plain model: auto group targets >=512 patches/call to amortize
        # dispatch latency, then clamps to the 3 available scenes
        got_plain = ref.resolve_all(patches, progress=False)
        assert len(got_plain) == 3
        for a, b in zip(got_plain, expect):
            np.testing.assert_allclose(a, b, atol=1.0)

        # grouped plain model (forced group 2, ragged tail of 1)
        ref2 = Resolver(plain, params, scene_size=96, scenes_per_call=2)
        got2 = ref2.resolve_all(patches, progress=False)
        for a, b in zip(got2, expect):
            np.testing.assert_allclose(a, b, atol=1.0)

        # fused model through the interpreter: the 128-lane auto group
        # rule, then a forced small group exercising the Pallas stack
        fr = Resolver(fused, params, scene_size=96)
        # alignment base (lcm(128, P)/P) grown to >=512 patches per call
        assert fr._auto_group(4) == 128 and fr._align_base == 32
        assert fr._auto_group(64) == 8 and fr._align_base == 2
        assert fr._auto_group(128) == 4 and fr._align_base == 1
        # an explicit scenes_per_call is rounded UP to the alignment base
        # (3 x 64 = 192 patches would silently drop to the plain stack)
        fr.scenes_per_call = 3
        assert fr._auto_group(64) == 4
        fr.scenes_per_call = None
        old = ts.INTERPRET
        ts.INTERPRET = True
        try:
            fr.scenes_per_call = 2
            got_f = fr.resolve_all(patches, progress=False)
        finally:
            ts.INTERPRET = old
        assert len(got_f) == 3
        for a, b in zip(got_f, expect):
            # fused kernels differ in reduction order; after round() the
            # largest admissible step is one grey level
            np.testing.assert_allclose(a, b, atol=1.0)

    def test_grouped_tta_matches_per_scene(self, rng):
        """TTA serving goes through the same grouped device call as the
        non-TTA path (on-device round/clip + mean over repeats + paste);
        grouping must not change any scene's average — the per-scene
        permutation stacks are seeded independently of the grouping."""
        import jax
        import probav_tpu.ops.pallas_tstack as ts
        from probav_tpu.models import WDSRConv3D
        from probav_tpu.infer import Resolver

        kw = dict(scale=3, num_filters=8, num_res_blocks=2, exp_rate=4,
                  decay_rate=0.8, num_img_lr=9, patch_size_lr=16,
                  mean=100.0, std=50.0)
        plain = WDSRConv3D(**kw)
        fused = WDSRConv3D(fused_stack="t", **kw)
        patches = rng.uniform(50, 150, (3, 4, 22, 22, 9, 1)).astype(np.float32)
        params = plain.init(jax.random.PRNGKey(0), patches[0][:1])["params"]

        ref = Resolver(plain, params, scene_size=96)
        expect = [ref.resolve_scene_tta(p, repeats=3) for p in patches]
        assert expect[0].shape == (96, 96, 1)

        got = ref.resolve_all(patches, progress=False, tta=True,
                              tta_repeats=3)
        assert len(got) == 3
        for a, b in zip(got, expect):
            np.testing.assert_allclose(a, b, atol=1.0)

        # Fused tier: the auto group reaches the 128-lane alignment over
        # repeats*patches rows (12/scene -> base 32 scenes = 384 rows),
        # then doubles to meet the >=512-row dispatch target.
        fr = Resolver(fused, params, scene_size=96)
        assert fr._auto_group(4, repeats=3) == 64 and fr._align_base == 32
        # flagship TTA: 20 repeats x 64 patches = 1280 rows, already
        # aligned AND above the 512-row dispatch target -> 1 scene/call
        assert fr._auto_group(64, repeats=20) == 1
        old = ts.INTERPRET
        ts.INTERPRET = True
        try:
            got_f = fr.resolve_all(patches, progress=False, tta=True,
                                   tta_repeats=3)
        finally:
            ts.INTERPRET = old
        assert len(got_f) == 3
        for a, b in zip(got_f, expect):
            np.testing.assert_allclose(a, b, atol=1.0)

    def test_chunked_group_call_matches_per_scene(self, rng):
        """Groups above 128 patches run the model over 128-lane chunks
        with lax.map inside the one jitted call (bounded VMEM); the
        chunked branch must reproduce per-scene results for both the
        plain and the fused (interpreter) model."""
        import jax
        import probav_tpu.ops.pallas_tstack as ts
        from probav_tpu.models import WDSRConv3D
        from probav_tpu.infer import Resolver

        kw = dict(scale=3, num_filters=4, num_res_blocks=1, exp_rate=2,
                  decay_rate=0.8, num_img_lr=9, patch_size_lr=16,
                  mean=100.0, std=50.0)
        plain = WDSRConv3D(**kw)
        fused = WDSRConv3D(fused_stack="t", **kw)
        # 4 scenes x 64 patches = 256 total -> two 128-lane chunks
        patches = rng.uniform(
            50, 150, (4, 64, 22, 22, 9, 1)).astype(np.float32)
        params = plain.init(jax.random.PRNGKey(0), patches[0][:1])["params"]

        ref = Resolver(plain, params, scene_size=384)
        expect = [ref.resolve_scene(p) for p in patches]

        for model in (plain, fused):
            r = Resolver(model, params, scene_size=384, scenes_per_call=4)
            assert r._auto_group(64) == 4   # 256 patches > chunk_n=128
            old = ts.INTERPRET
            ts.INTERPRET = True
            try:
                got = r.resolve_all(patches, progress=False)
            finally:
                ts.INTERPRET = old
            assert len(got) == 4
            for a, b in zip(got, expect):
                np.testing.assert_allclose(a, b, atol=1.0)


class TestMeshResolver:
    def test_sharded_inference_matches_single_device(self, rng):
        """Multi-chip serving: the 64-patch grid sharded over 4 chips must
        produce the identical scene as single-device resolution."""
        import jax
        from probav_tpu.models import WDSRConv3D
        from probav_tpu.infer import Resolver
        from probav_tpu.parallel import make_mesh

        model = WDSRConv3D(scale=3, num_filters=4, num_res_blocks=1,
                           exp_rate=2, decay_rate=0.8, num_img_lr=9,
                           patch_size_lr=16, mean=100.0, std=50.0)
        patches = rng.uniform(50, 150, (64, 22, 22, 9, 1)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), patches[:1])["params"]

        single = Resolver(model, params, scene_size=384)
        mesh = make_mesh(num_data=4, num_model=1)
        sharded = Resolver(model, params, scene_size=384, mesh=mesh)
        a = single.resolve_scene(patches)
        b = sharded.resolve_scene(patches)
        np.testing.assert_array_equal(a, b)

    def test_sharded_grouped_chunked_call(self, rng):
        """The grouped call's in-jit lax.map chunking must compose with a
        data mesh: 8 scenes x 64 patches = 512 total over 2 shards
        (chunk_n = 256) -> two chunks, each 128 patches per shard."""
        import jax
        from probav_tpu.models import WDSRConv3D
        from probav_tpu.infer import Resolver
        from probav_tpu.parallel import make_mesh

        model = WDSRConv3D(scale=3, num_filters=4, num_res_blocks=1,
                           exp_rate=2, decay_rate=0.8, num_img_lr=9,
                           patch_size_lr=16, mean=100.0, std=50.0)
        patches = rng.uniform(
            50, 150, (8, 64, 22, 22, 9, 1)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0),
                            patches[0][:1])["params"]

        single = Resolver(model, params, scene_size=384)
        expect = [single.resolve_scene(p) for p in patches[:2]]

        mesh = make_mesh(num_data=2, num_model=1)
        mm = WDSRConv3D(scale=3, num_filters=4, num_res_blocks=1,
                        exp_rate=2, decay_rate=0.8, num_img_lr=9,
                        patch_size_lr=16, mean=100.0, std=50.0, mesh=mesh)
        sharded = Resolver(mm, params, scene_size=384, mesh=mesh,
                           scenes_per_call=8)
        got = sharded.resolve_all(patches, progress=False)
        assert len(got) == 8
        for a, b in zip(got[:2], expect):
            np.testing.assert_allclose(a, b, atol=1.0)

    def test_sharded_tta_matches_single_device(self, rng):
        """Grouped TTA composes with a data mesh: 4 scenes x 2 repeats x
        64 patches = 512 rows over 2 shards (chunk_n=256) -> two in-jit
        chunks; the sharded average must match the single-device one."""
        import jax
        from probav_tpu.models import WDSRConv3D
        from probav_tpu.infer import Resolver
        from probav_tpu.parallel import make_mesh

        model = WDSRConv3D(scale=3, num_filters=4, num_res_blocks=1,
                           exp_rate=2, decay_rate=0.8, num_img_lr=9,
                           patch_size_lr=16, mean=100.0, std=50.0)
        patches = rng.uniform(
            50, 150, (4, 64, 22, 22, 9, 1)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0),
                            patches[0][:1])["params"]

        single = Resolver(model, params, scene_size=384)
        expect = [single.resolve_scene_tta(p, repeats=2)
                  for p in patches[:2]]

        mesh = make_mesh(num_data=2, num_model=1)
        sharded = Resolver(model, params, scene_size=384, mesh=mesh,
                           scenes_per_call=4)
        got = sharded.resolve_all(patches, progress=False, tta=True,
                                  tta_repeats=2)
        assert len(got) == 4
        for a, b in zip(got[:2], expect):
            np.testing.assert_allclose(a, b, atol=1.0)
