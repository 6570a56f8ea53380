"""Scene-level QC unit tests (probav_tpu.data.qc)."""

import numpy as np
import pytest

from probav_tpu.data import qc


def masked_scene(rng, frames=4, size=8, occlusion=0.0):
    data = rng.uniform(0, 60000, (frames, 1, size, size))
    mask = rng.uniform(size=data.shape) < occlusion
    return np.ma.masked_array(data, mask=mask)


class TestOutlierFilter:
    """Legacy v1 removeImageWithOutlierPixels (utils/utils.py:492-531)."""

    def make_scenes(self, rng, frame_counts, hot=()):
        """hot: set of (scene, frame) pairs given one pixel above 40000."""
        img, msk = [], []
        for s, t in enumerate(frame_counts):
            a = rng.uniform(0, 16000, (t, 1, 8, 8))
            for (hs, hf) in hot:
                if hs == s:
                    a[hf, 0, 2, 3] = 50000.0
            img.append(a)
            msk.append(np.ones_like(a, dtype=np.uint16) * 255)
        from probav_tpu.data.ingest import _object_array
        return _object_array(img), _object_array(msk)

    def test_drops_hot_frames_and_short_scenes(self, rng):
        from probav_tpu.data import qc
        img, msk = self.make_scenes(rng, [11, 10],
                                    hot=[(0, 2), (1, 0), (1, 5)])
        out_i, out_m, kept, removed, dropped = qc.remove_outlier_frames(
            img, msk, 40000.0)
        # scene 0: 11 -> 10 frames survives; scene 1: 10 -> 8 is removed
        assert list(kept) == [0] and list(removed) == [1]
        assert dropped == 1
        assert out_i[0].shape[0] == 10
        assert not (np.asarray(out_i[0]) > 40000).any()
        assert out_m[0].shape == out_i[0].shape

    def test_keep_scenes_mode_for_test_split(self, rng):
        from probav_tpu.data import qc
        img, msk = self.make_scenes(rng, [9], hot=[(0, 1), (0, 2)])
        out_i, _, kept, intact, dropped = qc.remove_outlier_frames(
            img, msk, 40000.0, drop_scenes=False)
        # would fall to 7 frames -> kept INTACT (hot frames included)
        assert list(kept) == [0] and list(intact) == [0]
        assert dropped == 0
        assert out_i[0].shape[0] == 9

    def test_pipeline_flag_records_removed_scene(self, tmp_path, rng):
        # End-to-end: a hot train scene lands in removedTrainSets<band>.txt
        # and the trimmed arrays, while the HR dump keeps every scene.
        from synthetic_data import make_raw_tree, write_cfg
        from probav_tpu.config import Config
        from probav_tpu.data import pipeline
        from probav_tpu.utils.io import load_npy, read_png, write_png
        import os

        raw = make_raw_tree(str(tmp_path / "raw"), bands=("NIR",),
                            train_scenes=3, test_scenes=1, frames=5)
        cfgp = write_cfg(str(tmp_path / "synth.cfg"), raw=raw,
                         out=str(tmp_path / "chkpt"),
                         model_out=str(tmp_path / "mi"),
                         train_out=str(tmp_path / "to"),
                         test_out=str(tmp_path / "te"))
        cfg = Config.from_file(cfgp)
        # poison every LR frame of train scene 1 (dir index 1; the
        # recorded id gets the NIR TRAIN offset 594 -> 595)
        sdir = os.path.join(raw, "train", "NIR", "imgset0001")
        for n in sorted(os.listdir(sdir)):
            if n.startswith("LR"):
                img = read_png(os.path.join(sdir, n)).astype(np.int64)
                img[4, 4] = 60000
                write_png(os.path.join(sdir, n), img.astype(np.uint16))
        pipeline.run(cfg, "NIR", ckpts=[1, 2], progress=False,
                     outlier_threshold=50000.0, outlier_min_frames=3)
        removed = np.loadtxt(cfg.removed_sets_path("NIR"))
        assert 595.0 in np.atleast_1d(removed)
        hr_all = load_npy(os.path.join(cfg.stage_dir("resolverDir"),
                                       "TRAINimgHR_NIR.npy"))
        assert len(hr_all) == 3          # HR dump keeps every scene
        trimmed = load_npy(os.path.join(cfg.stage_dir("trimmedArrayDir"),
                                        "TRAINimgLR_NIR.npy"))
        assert len(trimmed) == 2         # filtered scene gone downstream


class TestPickClearFrames:
    def test_picks_k_clearest(self, rng):
        scene = masked_scene(rng, frames=6, occlusion=0.05)
        picked, dup = qc.pick_clear_frames(scene, 3, 0.5,
                                           np.random.default_rng(0))
        assert picked.shape[0] == 3
        assert dup == 0

    def test_duplicates_counted_when_too_few(self, rng):
        scene = masked_scene(rng, frames=2, occlusion=0.0)
        picked, dup = qc.pick_clear_frames(scene, 5, 0.5,
                                           np.random.default_rng(0))
        assert picked.shape[0] == 5
        assert dup == 3

    def test_all_occluded_scene_raises_instead_of_spinning(self, rng):
        # Every frame fails the clarity threshold: the resampling loop has
        # an empty pool and must fail loudly (the pipeline normally
        # guarantees the precondition via remove_corrupted_train_sets).
        scene = masked_scene(rng, frames=3, occlusion=1.0)
        with pytest.raises(ValueError, match="clarity threshold"):
            qc.pick_clear_frames(scene, 2, 0.85, np.random.default_rng(0))
