"""Native (C++) frame-selection kernel vs the Python reference logic."""

import numpy as np
import pytest

from probav_tpu.data import qc


@pytest.fixture(scope="module")
def native():
    try:
        from probav_tpu.data import _native
        _native._load()
        return _native
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native toolchain unavailable: {e}")


def test_native_matches_python(rng, native):
    s, p, t, k, hw = 5, 7, 9, 6, 64
    occ = rng.integers(0, hw, size=(s, p, t)).astype(np.int64)
    # force some all-dirty patches
    occ[0, 0] = hw
    occ[2, 3] = hw
    thr = 0.85
    want_idx, want_d, want_u = qc._select_frame_indices_py(occ, k, thr, hw)
    got_idx, got_d, got_u = native.select_frames(occ, k, thr, hw)
    np.testing.assert_array_equal(got_idx, want_idx)
    assert (got_d, got_u) == (want_d, want_u)


def test_native_tie_order_matches_reference_tiling(native):
    # All-clear frames (occ == 0 everywhere): the reference tiles whole
    # copies, so the stable sort yields [0..T-1, 0..T-1, ...] truncated.
    occ = np.zeros((1, 1, 3), dtype=np.int64)
    idx, d, u = native.select_frames(occ, 7, 0.85, 100)
    np.testing.assert_array_equal(idx[0, 0], [0, 1, 2, 0, 1, 2, 0])
    assert d == 0 and u == 0


def test_pick_clear_patches_lr_uses_selection(rng):
    # End-to-end through the public QC API on a masked array.
    s, p, t, c, h, w = 2, 3, 5, 1, 8, 8
    data = rng.uniform(0, 100, (s, p, t, c, h, w)).astype(np.float32)
    mask = np.zeros_like(data, dtype=bool)
    mask[0, 0, 0] = True   # frame 0 of patch (0,0) fully occluded
    patches = np.ma.masked_array(data, mask=mask)
    out = qc.pick_clear_patches_lr(patches, k=4, clarity_threshold=0.85,
                                   verbose=False)
    assert out.shape == (s, p, 4, c, h, w)
    # the dirty frame must not be selected for patch (0,0)
    sel_data = np.asarray(out[0, 0])
    assert not np.ma.getmaskarray(out)[0, 0].all(axis=(1, 2, 3)).any()
