"""The batched evaluation scorer vs the training-path loss.

``per_scene_cpsnr`` re-derives shiftCompensatedcPSNR (reference
loss.py:37-53) as a scan over shifts that never materializes the
[49, B, H-6, W-6, 1] crop stack; these tests pin it to
``ShiftCompensatedLosses.cpsnr`` (itself oracle-tested in test_ops.py)
across masking, ragged tails, and the uint16 transfer compaction.
"""

import numpy as np
import pytest

from probav_tpu.evaluation.compare import (
    per_scene_cpsnr, _score_batches, _compact)
from probav_tpu.ops import ShiftCompensatedLosses


def _reference_scores(data, mask, pred):
    import jax
    size = data.shape[1]
    losses = ShiftCompensatedLosses(target_shape=(size, size, 1),
                                    use_pallas=False)
    return np.asarray(jax.jit(losses.cpsnr)(
        data.astype(np.float32), mask.astype(np.float32),
        pred.astype(np.float32)))


@pytest.fixture()
def scene_stack(rng):
    n, size = 5, 24
    data = rng.uniform(0, 60000, (n, size, size, 1)).astype(np.float32)
    hidden = rng.uniform(size=(n, size, size, 1)) < 0.1
    pred = np.clip(data + rng.normal(0, 300, data.shape), 0,
                   65535).astype(np.float32)
    hr = np.ma.masked_array(data, mask=hidden)
    return hr, pred


def test_matches_training_loss(scene_stack):
    hr, pred = scene_stack
    # batch=2 over 5 scenes: two full batches + an edge-padded tail whose
    # padded row must not leak into the returned scores.
    got = per_scene_cpsnr(hr, pred, batch=2)
    want = _reference_scores(np.asarray(hr, np.float32),
                             ~np.ma.getmaskarray(hr), pred)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_batch_size_invariance(scene_stack):
    hr, pred = scene_stack
    a = per_scene_cpsnr(hr, pred, batch=2)
    b = per_scene_cpsnr(hr, pred, batch=16)   # clamps to n=5
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_integral_data_uses_uint16_transfer(scene_stack):
    hr, pred = scene_stack
    data = np.round(np.asarray(hr, np.float32))
    pred_i = np.round(pred)
    assert _compact(data).dtype == np.uint16
    assert _compact(pred).dtype == np.float32   # non-integral passes through
    hr_i = np.ma.masked_array(data, mask=np.ma.getmaskarray(hr))
    got = per_scene_cpsnr(hr_i, pred_i, batch=2)
    want = _reference_scores(data, ~np.ma.getmaskarray(hr_i), pred_i)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_multi_pred_batches_match_separate_calls(scene_stack, rng):
    hr, pred = scene_stack
    other = np.clip(pred + rng.normal(0, 500, pred.shape), 0,
                    65535).astype(np.float32)
    data = np.asarray(hr, np.float32)
    mask = ~np.ma.getmaskarray(hr)
    both = _score_batches(data, mask, [pred, other], batch=2)
    np.testing.assert_allclose(both[0], per_scene_cpsnr(hr, pred, batch=2),
                               rtol=1e-6)
    np.testing.assert_allclose(both[1], per_scene_cpsnr(hr, other, batch=2),
                               rtol=1e-6)


def test_unmasked_scalar_mask(rng):
    # np.ma.masked_array with mask=False yields a scalar mask; the scorer
    # must treat it as fully clear, like the training loss does.
    data = rng.uniform(0, 60000, (3, 16, 16, 1)).astype(np.float32)
    hr = np.ma.masked_array(data, mask=False)
    got = per_scene_cpsnr(hr, data.copy(), batch=3)
    assert (got > 80).all(), got


def test_empty_stack():
    hr = np.ma.masked_array(np.zeros((0, 16, 16, 1), np.float32))
    out = per_scene_cpsnr(hr, np.zeros((0, 16, 16, 1), np.float32))
    assert out.shape == (0,)
