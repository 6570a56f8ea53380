"""Stage-5 split/augment unit tests.

The split's fold membership is a compatibility contract: the reference
splits with sklearn ``train_test_split(test_size=split, random_state=17)``
(dataGenerator.py:282-284).  ``split_indices`` reimplements that without
sklearn (its import costs ~8 s per pipeline process); these tests pin the
reimplementation against the real sklearn on this host.
"""

import numpy as np
import pytest

from probav_tpu.data import augment as aug


class TestSplitSklearnParity:
    @pytest.mark.parametrize("n,split", [
        (10, 0.2), (768, 0.2), (97, 0.25), (5, 0.5), (3, 0.33),
        (1000, 0.1), (7, 0.2),
        # floor((1-split)*n) != n - ceil(split*n) cases: (1-split)*n lands
        # an epsilon below an integer and floor() would drop a train sample
        (90, 0.3), (120, 0.3), (200, 0.3), (300, 0.33),
    ])
    def test_indices_match_sklearn(self, n, split):
        from sklearn.model_selection import train_test_split

        x = np.arange(n)
        sk_tr, sk_va = train_test_split(x, test_size=split, random_state=17)
        tr, va = aug.split_indices(n, split, seed=17)
        np.testing.assert_array_equal(x[tr], sk_tr)
        np.testing.assert_array_equal(x[va], sk_va)

    @pytest.mark.parametrize("split", [0.3, 0.33])
    def test_sizes_match_sklearn_formula_sweep(self, split):
        """Every n up to 2000: the fold SIZES follow sklearn's exact
        train_size=None formula (n_train = n - ceil(split*n)); a size
        mismatch is the failure mode ADVICE flagged (floor() dropping a
        training sample for e.g. n=90, split=0.3)."""
        import math

        for n in range(2, 2000):
            tr, va = aug.split_indices(n, split, seed=17)
            n_test = int(math.ceil(split * n))
            assert len(va) == n_test
            assert len(tr) == n - n_test, f"n={n}: dropped train sample"

    def test_split_patches_lockstep_and_masks(self, rng):
        lr = np.ma.masked_array(
            rng.normal(size=(20, 4, 4, 3, 1)).astype(np.float32),
            mask=rng.uniform(size=(20, 4, 4, 3, 1)) > 0.7)
        hr = np.ma.masked_array(
            rng.normal(size=(20, 12, 12, 1)).astype(np.float32),
            mask=rng.uniform(size=(20, 12, 12, 1)) > 0.7)
        lr_tr, lr_va, hr_tr, hr_va = aug.split_patches(lr, hr, 0.25)
        assert len(lr_va) == 5 and len(lr_tr) == 15
        assert len(hr_va) == 5 and len(hr_tr) == 15
        # img and mask travel in lockstep: recover each row in the source
        tr, va = aug.split_indices(20, 0.25)
        np.testing.assert_array_equal(np.asarray(lr_tr),
                                      np.asarray(lr)[tr])
        np.testing.assert_array_equal(np.ma.getmaskarray(lr_va),
                                      np.ma.getmaskarray(lr)[va])
        np.testing.assert_array_equal(np.asarray(hr_va),
                                      np.asarray(hr)[va])


class TestPermutationAugment:
    def test_shuffle_concat_and_hr_tiling(self, rng):
        lr = np.ma.masked_array(
            rng.normal(size=(4, 2, 2, 5, 1)).astype(np.float32),
            mask=rng.uniform(size=(4, 2, 2, 5, 1)) > 0.5)
        hr = np.ma.masked_array(
            rng.normal(size=(4, 6, 6, 1)).astype(np.float32),
            mask=np.zeros((4, 6, 6, 1), bool))
        out = aug.augment_by_shuffling(lr, 2, np.random.default_rng(3))
        hr_out = aug.tile_hr_for_permutations(hr, 2)
        assert out.shape == (12, 2, 2, 5, 1)
        assert hr_out.shape == (12, 6, 6, 1)
        # first copy is the original; later copies are frame permutations
        np.testing.assert_array_equal(np.asarray(out[:4]), np.asarray(lr))
        for k in (1, 2):
            blk = np.asarray(out[4 * k:4 * (k + 1)])
            assert sorted(
                tuple(np.asarray(lr)[..., t, :].ravel())
                for t in range(5)
            ) == sorted(
                tuple(blk[..., t, :].ravel()) for t in range(5))
        np.testing.assert_array_equal(np.asarray(hr_out[4:8]),
                                      np.asarray(hr))
