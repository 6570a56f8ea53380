import numpy as np
import jax
import jax.numpy as jnp
import pytest

from probav_tpu.ops import (
    ShiftCompensatedLosses, sobel_edges, extract_patches, extract_patches_np,
    reconstruct_from_patches, phase_correlation_shift, register_image_set,
)
from probav_tpu.ops.patches import depth_to_space
from probav_tpu.ops.registration import register_image_set_jax

from oracles import (
    shift_losses_oracle, sobel_edges_oracle, unfold_patches_oracle,
    fourier_register_oracle, rev_msssim_oracle,
)


def make_batch(rng, b=3, size=48, c=1):
    hr = rng.uniform(0, 65535, size=(b, size, size, c)).astype(np.float32)
    mask = (rng.uniform(size=(b, size, size, c)) > 0.15).astype(np.float32)
    pred = rng.uniform(0, 65535, size=(b, size, size, c)).astype(np.float32)
    return hr, mask, pred


class TestShiftLosses:
    @pytest.fixture(scope="class")
    def losses(self):
        return ShiftCompensatedLosses(target_shape=(48, 48, 1), use_pallas=False)

    def test_l1_matches_oracle(self, rng, losses):
        hr, mask, pred = make_batch(rng)
        want = shift_losses_oracle(hr, mask, pred)
        got = jax.jit(losses.l1)(hr, mask, pred)
        np.testing.assert_allclose(float(got), want["l1"], rtol=2e-4)

    def test_l2_matches_oracle(self, rng, losses):
        hr, mask, pred = make_batch(rng)
        want = shift_losses_oracle(hr, mask, pred)
        got = jax.jit(losses.l2)(hr, mask, pred)
        np.testing.assert_allclose(float(got), want["l2"], rtol=2e-4)

    def test_cpsnr_matches_oracle(self, rng, losses):
        hr, mask, pred = make_batch(rng)
        want = shift_losses_oracle(hr, mask, pred)
        got = jax.jit(losses.cpsnr)(hr, mask, pred)
        assert got.shape == (hr.shape[0],)
        np.testing.assert_allclose(np.asarray(got), want["cpsnr"], rtol=1e-4)

    def test_cpsnr_perfect_prediction_is_high(self, rng, losses):
        # Under a full mask a perfect prediction saturates cPSNR.  (With mask
        # holes it does NOT — occluded truth pixels still enter the residual,
        # a reference contract we preserve; see module docstring.)
        hr, mask, _ = make_batch(rng, b=2)
        got = losses.cpsnr(hr, np.ones_like(mask), hr)
        assert np.all(np.asarray(got) > 80.0)

    def test_shift_compensation_recovers_translated_pred(self, rng, losses):
        # A prediction translated by +-2px must incur (almost) no extra L2.
        hr, mask, _ = make_batch(rng, b=1)
        hr_s = np.asarray(jnp.ones_like(hr) * hr)
        shifted = np.roll(hr_s, (2, 2), axis=(1, 2))
        base = float(losses.l2(hr, np.ones_like(mask), hr))
        shifted_loss = float(losses.l2(hr, np.ones_like(mask), shifted))
        assert shifted_loss <= base + 1e-3

    def test_brightness_bias_invariance(self, rng, losses):
        # Constant brightness offsets are absorbed by the bias correction.
        hr, mask, _ = make_batch(rng, b=2)
        l_plain = float(losses.l1(hr, mask, hr))
        l_offset = float(losses.l1(hr, mask, hr + 1234.5))
        np.testing.assert_allclose(l_offset, l_plain, atol=2e-2)

    def test_l1_edge_runs_and_beats_garbage(self, rng, losses):
        hr, mask, pred = make_batch(rng, b=2)
        good = float(losses.l1_edge(hr, mask, hr))
        bad = float(losses.l1_edge(hr, mask, pred))
        assert good < bad

    def test_rev_msssim_runs(self, rng, losses):
        hr, mask, pred = make_batch(rng, b=2)
        val = float(losses.rev_msssim(hr, mask, pred))
        assert np.isfinite(val)

    def test_gradients_flow(self, rng, losses):
        hr, mask, pred = make_batch(rng, b=2)
        g = jax.grad(lambda p: losses.l1(hr, mask, p))(pred)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    @pytest.mark.parametrize("name", ["l1", "l2", "sobel_l1_mix",
                                      "l1msssim"])
    def test_weighted_losses_exact_under_padding(self, rng, losses, name):
        # weighted(name) over a wrap-padded batch with 0-weighted pad rows
        # must equal by_name(name) over the unpadded batch — incl. the
        # batch-coupled rev_msssim, whose b*c denominator and luminance sum
        # are re-derived over sum(w) (this is what keeps the trainer's
        # padded validation loss exact for every cfg loss).
        hr, mask, pred = make_batch(rng, b=5)
        pad_to = 8
        pad = lambda a: np.resize(a, (pad_to,) + a.shape[1:])
        w = np.zeros(pad_to, np.float32)
        w[:5] = 1.0
        want = float(losses.by_name(name)(hr, mask, pred))
        got = float(jax.jit(losses.weighted(name))(
            pad(hr), pad(mask), pad(pred), w))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_by_name_dispatch(self, losses):
        assert losses.by_name("l1") == losses.l1
        assert losses.by_name("sobel_l1_mix") == losses.l1_edge
        assert losses.by_name("l2") == losses.l2
        assert losses.by_name("l1msssim") == losses.rev_msssim


class TestSobel:
    def test_matches_oracle(self, rng):
        img = rng.uniform(0, 100, size=(2, 8, 9, 2)).astype(np.float32)
        want = sobel_edges_oracle(img)
        got = np.asarray(jax.jit(sobel_edges)(img))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


class TestPatches:
    def test_np_matches_unfold_order(self, rng):
        imgs = rng.uniform(size=(2, 3, 1, 20, 20)).astype(np.float32)
        want = unfold_patches_oracle(imgs, patch=8, stride=4)
        got = extract_patches_np(imgs, patch=8, stride=4)
        np.testing.assert_array_equal(got, want)

    def test_jax_matches_np(self, rng):
        imgs = rng.uniform(size=(2, 1, 22, 22)).astype(np.float32)
        got = np.asarray(extract_patches(jnp.asarray(imgs), patch=16, stride=3))
        want = extract_patches_np(imgs, patch=16, stride=3)
        np.testing.assert_array_equal(got, want)

    def test_reconstruct_roundtrip(self, rng):
        scene = rng.uniform(size=(384, 384, 1)).astype(np.float32)
        patches = extract_patches_np(scene.transpose(2, 0, 1), 48, 48)
        patches = patches.transpose(1, 2, 3, 0)  # [64, 48, 48, 1]
        rec = np.asarray(reconstruct_from_patches(jnp.asarray(patches), 384))
        np.testing.assert_array_equal(rec, scene)

    def test_depth_to_space(self):
        # Golden semantics: out[h*r+dh, w*r+dw] = in[h, w, dh*r+dw].
        x = np.arange(1 * 2 * 2 * 9, dtype=np.float32).reshape(1, 2, 2, 9)
        y = np.asarray(depth_to_space(jnp.asarray(x), 3))
        assert y.shape == (1, 6, 6, 1)
        for h in range(2):
            for w in range(2):
                for dh in range(3):
                    for dw in range(3):
                        assert y[0, h * 3 + dh, w * 3 + dw, 0] == x[0, h, w, dh * 3 + dw]


class TestRegistration:
    def test_phase_correlation_recovers_known_shift(self, rng):
        base = rng.uniform(size=(1, 32, 32))
        moved = np.roll(base, (0, 3, -5), axis=(0, 1, 2))
        # Returns the shift to APPLY to `moved` to re-align it with `base`.
        shift = phase_correlation_shift(base, moved)
        np.testing.assert_array_equal(shift, [0, -3, 5])

    def test_register_frame_matches_fourier_oracle(self, rng):
        ref = rng.uniform(size=(1, 16, 16))
        img = np.roll(ref, (0, -2, 4), axis=(0, 1, 2)) + rng.normal(0, 1e-3, (1, 16, 16))
        msk = rng.uniform(size=(1, 16, 16)) > 0.2
        shifts, want_img, want_msk = fourier_register_oracle(ref, img, msk)
        from probav_tpu.ops.registration import register_frame
        got_img, got_msk = register_frame(img, msk, ref, np.ones_like(msk, bool))
        np.testing.assert_allclose(got_img, want_img, atol=1e-9)
        np.testing.assert_array_equal(got_msk, want_msk)

    def test_register_image_set_reference_frame_first(self, rng):
        imgs = rng.uniform(0, 65535, size=(4, 1, 16, 16))
        msks = (rng.uniform(size=(4, 1, 16, 16)) > 0.3).astype(np.uint16) * 255
        msks[2] = 255  # frame 2 is the clearest -> becomes the reference
        out = register_image_set(imgs, msks)
        assert out.shape == imgs.shape
        np.testing.assert_array_equal(out.data[0], imgs[2])
        assert not out.mask[0].any()

    def test_jax_set_matches_numpy_set(self, rng):
        imgs = rng.uniform(0, 255, size=(3, 1, 16, 16)).astype(np.float32)
        base = imgs[0]
        imgs[1] = np.roll(base, (2, 1), axis=(1, 2))
        imgs[2] = np.roll(base, (-1, 3), axis=(1, 2))
        msks = np.full(imgs.shape, 255, dtype=np.uint16)
        msks[0, :, :2] = 0  # make frame order deterministic: 1 or 2 clearest
        a = register_image_set(imgs, msks)
        b = register_image_set_jax(imgs, msks)
        np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data), atol=1e-2)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))

    def test_batched_jax_backend_matches_per_scene(self, rng):
        # register_images(backend='jax') buckets scenes by frame count and
        # runs chunked multi-scene device calls; every scene's result must
        # equal the per-scene jit path bit-for-bit (same core body), for
        # uniform AND ragged scene sets, across the chunk-padding branch.
        from probav_tpu.ops.registration import (register_images,
                                                 register_scenes_jax)

        def make_scene(n_frames):
            imgs = rng.uniform(0, 255, (n_frames, 1, 16, 16)).astype(
                np.float32)
            for k in range(1, n_frames):
                imgs[k] = np.roll(imgs[0], (k % 3 - 1, k % 5 - 2),
                                  axis=(1, 2))
            msks = (rng.uniform(size=imgs.shape) > 0.2).astype(
                np.uint16) * 255
            msks[0] = 255   # deterministic clearest frame
            return imgs, msks

        # uniform frame count, 5 scenes, chunk 2 -> exercises the ragged
        # final chunk's repeat-pad + drop
        scenes = [make_scene(3) for _ in range(5)]
        imgs = np.stack([s[0] for s in scenes])
        msks = np.stack([s[1] for s in scenes])
        got = register_scenes_jax(imgs, msks, chunk=2)
        for i in range(5):
            want = register_image_set_jax(imgs[i], msks[i])
            np.testing.assert_array_equal(got[i].data, want.data)
            np.testing.assert_array_equal(got[i].mask, want.mask)

        # same 5 scenes with a LARGE chunk -> exercises the canonical
        # power-of-two pad (5 scenes staged as 8, extras dropped)
        got = register_scenes_jax(imgs, msks, chunk=8)
        for i in range(5):
            want = register_image_set_jax(imgs[i], msks[i])
            np.testing.assert_array_equal(got[i].data, want.data)
            np.testing.assert_array_equal(got[i].mask, want.mask)

        # ragged frame counts (the raw PROBA-V layout) via the public
        # register_images entry: object arrays in, scene order preserved
        ragged = [make_scene(n) for n in (3, 4, 3, 4)]
        oi = np.empty(4, dtype=object)
        om = np.empty(4, dtype=object)
        for i, (im, mk) in enumerate(ragged):
            oi[i], om[i] = im, mk
        got = register_images(oi, om, backend="jax")
        for i, (im, mk) in enumerate(ragged):
            want = register_image_set_jax(im, mk)
            np.testing.assert_array_equal(got[i].data, want.data)
            np.testing.assert_array_equal(got[i].mask, want.mask)


class TestMaskedRegistration:
    """tech='time' path: Padfield masked NCC + reflect-mode resample
    (reference utils/dataGenerator.py:663-666)."""

    def linear_shift_pair(self, rng, dy, dx, size=32, margin=8):
        """Two windows of one big image, offset by (dy, dx): a TRUE linear
        (non-circular) translation, the case masked NCC is built for."""
        big = rng.uniform(0, 255, (size + 2 * margin, size + 2 * margin))
        ref = big[margin:margin + size, margin:margin + size][None]
        mov = big[margin + dy:margin + dy + size,
                  margin + dx:margin + dx + size][None]
        return ref, mov

    def test_recovers_shift_under_heavy_occlusion(self, rng):
        from probav_tpu.ops.registration import masked_phase_correlation_shift
        for dy, dx in ((-4, 3), (5, 5), (0, -6)):
            ref, mov = self.linear_shift_pair(rng, dy, dx)
            ref_mask = np.ones(ref.shape, bool)
            mov_mask = rng.uniform(size=mov.shape) > 0.3
            corrupt = mov.copy()
            # Occluded pixels carry garbage — masked NCC must ignore them.
            corrupt[~mov_mask] = rng.uniform(0, 255, int((~mov_mask).sum()))
            shift = masked_phase_correlation_shift(ref, corrupt,
                                                   ref_mask, mov_mask)
            np.testing.assert_array_equal(shift, [0, dy, dx])

    def test_recovers_shift_with_15pct_valid_pixels(self):
        # 85% occlusion + garbage fill + a reference mask with holes.
        from probav_tpu.ops.registration import masked_phase_correlation_shift
        rng = np.random.default_rng(7)
        ref, mov = self.linear_shift_pair(rng, 5, -4)
        ref_mask = rng.uniform(size=ref.shape) > 0.2
        mov_mask = rng.uniform(size=mov.shape) > 0.85
        corrupt = mov.copy()
        corrupt[~mov_mask] = rng.uniform(0, 255, int((~mov_mask).sum()))
        shift = masked_phase_correlation_shift(ref, corrupt,
                                               ref_mask, mov_mask)
        np.testing.assert_array_equal(shift, [0, 5, -4])

    def test_register_frame_time_resamples_reflect(self, rng):
        from scipy import ndimage
        from probav_tpu.ops.registration import register_frame
        dy, dx = 3, -2
        ref, mov = self.linear_shift_pair(rng, dy, dx)
        msk = rng.uniform(size=mov.shape) > 0.2
        ref_msk = np.ones(ref.shape, bool)
        reg_img, reg_msk = register_frame(mov, msk, ref, ref_msk,
                                          tech="time")
        # The resample is scipy reflect-mode at the recovered shift …
        want_img = ndimage.shift(mov.astype(np.float64), (0, dy, dx),
                                 mode="reflect")
        want_msk = ndimage.shift(msk.astype(np.float64), (0, dy, dx),
                                 mode="constant", cval=0.0) > 0.5
        np.testing.assert_allclose(reg_img, want_img, atol=1e-9)
        np.testing.assert_array_equal(reg_msk, want_msk)
        # … and the registered interior actually matches the reference.
        inner = (slice(None), slice(8, 24), slice(8, 24))
        match = np.isclose(reg_img[inner], ref[inner], atol=1e-9)
        assert match[reg_msk[inner]].all()

    def test_register_image_set_time_smoke(self, rng):
        from probav_tpu.ops.registration import register_image_set
        imgs = rng.uniform(0, 255, size=(3, 1, 16, 16))
        msks = (rng.uniform(size=(3, 1, 16, 16)) > 0.2).astype(np.uint16)
        out = register_image_set(imgs, msks, tech="time")
        assert out.shape == imgs.shape
        assert np.isfinite(out.data).all()

    def make_time_scene(self, rng, n_frames, size=32, margin=8):
        """Scene of true LINEAR translations of one underlying image with
        per-frame occlusion — the case masked NCC recovers unambiguously
        (so the f32 device argmax and the f64 host argmax agree)."""
        big = rng.uniform(0, 255, (size + 2 * margin,) * 2)
        offs = [(0, 0)] + [((k * 3) % 9 - 4, (k * 5) % 7 - 3)
                           for k in range(1, n_frames)]
        imgs = np.stack([
            big[margin + dy:margin + dy + size,
                margin + dx:margin + dx + size][None]
            for dy, dx in offs]).astype(np.float32)
        msks = (rng.uniform(size=imgs.shape) > 0.25).astype(np.uint16) * 255
        msks[0] = 255   # deterministic clearest (reference) frame
        imgs[msks == 0] = rng.uniform(0, 255, int((msks == 0).sum()))
        return imgs, msks

    def test_batched_jax_time_backend_matches_host_path(self, rng):
        # register_images(backend='jax', tech='time') — the bucketed
        # multi-scene masked-NCC device path — must reproduce the host
        # numpy/scipy per-scene path: identical masks and shifts (gather
        # == scipy reflect/constant shift at integer offsets), image
        # values equal up to the host path's float64 spline noise.
        # Ragged frame counts exercise the bucketing; 5 scenes at chunk 2
        # exercise the repeat-pad + drop branch.
        from probav_tpu.ops.registration import (register_image_set,
                                                 register_images,
                                                 register_scenes_jax)

        ragged = [self.make_time_scene(rng, n) for n in (3, 4, 3, 4)]
        oi = np.empty(4, dtype=object)
        om = np.empty(4, dtype=object)
        for i, (im, mk) in enumerate(ragged):
            oi[i], om[i] = im, mk
        got = register_images(oi, om, backend="jax", tech="time")
        for i, (im, mk) in enumerate(ragged):
            want = register_image_set(im, mk, tech="time")
            np.testing.assert_array_equal(got[i].mask, want.mask)
            np.testing.assert_allclose(got[i].data, want.data, atol=1e-4)

        scenes = [self.make_time_scene(rng, 3) for _ in range(5)]
        imgs = np.stack([s[0] for s in scenes])
        msks = np.stack([s[1] for s in scenes])
        got = register_scenes_jax(imgs, msks, chunk=2, tech="time")
        for i in range(5):
            want = register_image_set(imgs[i], msks[i], tech="time")
            np.testing.assert_array_equal(got[i].mask, want.mask)
            np.testing.assert_allclose(got[i].data, want.data, atol=1e-4)


class TestRevSSIMFaithfulness:
    def test_fixed_points_of_reference_formula(self):
        # The reference "structure" term uses VARIANCES, not stds
        # (loss.py:208): struct = (2*cov + C3)/(var_hr*var_sr + C3).  For
        # high-variance 16-bit data that drives pcs ~ 0, so a PERFECT
        # prediction under a full mask lands at eta * 1.0 = 0.25 exactly —
        # a quirky but faithful fixed point we pin, plus a seeded
        # regression value for a garbage prediction.
        losses = ShiftCompensatedLosses((48, 48, 1), use_pallas=False)
        rng = np.random.default_rng(42)
        hr = rng.uniform(0, 65535, (2, 48, 48, 1)).astype(np.float32)
        mask = np.ones_like(hr)
        assert abs(float(losses.rev_msssim(hr, mask, hr)) - 0.25) < 1e-4
        pred = rng.uniform(0, 65535, (2, 48, 48, 1)).astype(np.float32)
        val = float(losses.rev_msssim(hr, mask, pred))
        assert abs(val - 1.29422) < 2e-3, val

    def test_matches_numpy_oracle(self, rng):
        # Full independent re-derivation (tests/oracles.py) of
        # loss.py:99-110 + 189-217, random data, mask with holes.
        losses = ShiftCompensatedLosses((48, 48, 1), use_pallas=False)
        hr, mask, pred = make_batch(rng, b=2)
        want = rev_msssim_oracle(hr, mask, pred)
        got = float(jax.jit(losses.rev_msssim)(hr, mask, pred))
        np.testing.assert_allclose(got, want, rtol=2e-3)

    def test_oracle_match_with_scaled_prediction(self, rng):
        # A second operating point (pred correlated with hr) so both the
        # SSIM product and the weighted-L1 mix terms are exercised away
        # from the garbage regime.
        losses = ShiftCompensatedLosses((48, 48, 1), use_pallas=False)
        hr, mask, _ = make_batch(rng, b=2)
        pred = hr * 0.9 + rng.normal(0, 500, hr.shape).astype(np.float32)
        want = rev_msssim_oracle(hr, mask, pred)
        got = float(jax.jit(losses.rev_msssim)(hr, mask, pred))
        np.testing.assert_allclose(got, want, rtol=2e-3)
