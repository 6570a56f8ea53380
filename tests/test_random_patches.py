import numpy as np
import pytest

from probav_tpu.data.random_patches import (
    sample_scene_patches, sample_patch_dataset)


def make_scene(rng, t=5, size=32, scale=3, occluded_block=None):
    lr = np.ma.masked_array(
        rng.uniform(0, 65535, (t, 1, size, size)).astype(np.float32),
        mask=np.zeros((t, 1, size, size), bool))
    hr = np.ma.masked_array(
        rng.uniform(0, 65535, (1, 1, size * scale, size * scale)).astype(np.float32),
        mask=np.zeros((1, 1, size * scale, size * scale), bool))
    if occluded_block is not None:
        y0, y1 = occluded_block
        hr.mask[:, :, y0:y1, :] = True
    return lr, hr


def test_shapes_and_alignment(rng):
    lr, hr = make_scene(rng)
    plr, phr = sample_scene_patches(lr, hr, patch_size=16, max_shift=6,
                                    scale=3, num_patches=4,
                                    clarity_threshold=0.85,
                                    rng=np.random.default_rng(0))
    assert plr.shape == (4, 5, 1, 22, 22)
    assert phr.shape == (4, 1, 1, 48, 48)


def test_rejects_occluded_hr_regions(rng):
    # occlude the top half of the HR scene; all accepted patches must come
    # from the clear bottom half.
    lr, hr = make_scene(rng, occluded_block=(0, 48))
    plr, phr = sample_scene_patches(lr, hr, patch_size=16, max_shift=6,
                                    scale=3, num_patches=8,
                                    clarity_threshold=0.85,
                                    rng=np.random.default_rng(0),
                                    max_trials=5000)
    occl = np.ma.getmaskarray(phr).mean(axis=(1, 2, 3, 4))
    assert (occl < 0.15).all()


def test_fully_occluded_raises(rng):
    lr, hr = make_scene(rng)
    hr.mask[:] = True
    with pytest.raises(RuntimeError, match="no acceptable patches"):
        sample_scene_patches(lr, hr, 16, 6, 3, 2, 0.85,
                             np.random.default_rng(0), max_trials=50)


def test_dataset_over_scenes(rng):
    scenes_lr, scenes_hr = [], []
    for _ in range(3):
        lr, hr = make_scene(rng)
        scenes_lr.append(lr[None])
        scenes_hr.append(hr[None])
    lr_all = np.ma.concatenate(scenes_lr)
    hr_all = np.ma.concatenate(scenes_hr)
    plr, phr = sample_patch_dataset(lr_all, hr_all, 16, 6, 3,
                                    patches_per_scene=2,
                                    clarity_threshold=0.85, seed=1)
    assert len(plr) == 6 and len(phr) == 6
    assert plr.shape[1:] == (5, 1, 22, 22)
