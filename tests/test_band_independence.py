"""Band-independent executables: normalization as data, not code.

The reference builds one model per band with the band's dataset mean/std
baked in (train.py:66-74); translated naively to jit, those constants made
the NIR and RED executables distinct persistent-cache entries, so serving
the second band cold-compiled a full fused-tier copy (~384 s, the
REHEARSAL_r04 RED/NIR 4x asymmetry).  The production call paths now pass
``norm=[mean, std]`` as a traced argument (models/wdsr.py); these tests pin

  1. numerics: norm-as-argument output is bit-identical to the baked path,
  2. the cache key: the lowered HLO of the trainer step and the resolver's
     grouped serving fn is byte-identical across bands.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probav_tpu.models import WDSRConv3D, IWDSRConv3D
from probav_tpu.infer import Resolver

BAND_STATS = {"NIR": (8075.2045, 3160.7272), "RED": (5266.2245, 3431.8614)}


def _model(cls, band, **kw):
    mean, std = BAND_STATS[band]
    return cls(scale=3, num_filters=4, num_res_blocks=1, exp_rate=2,
               decay_rate=0.8, num_img_lr=9, patch_size_lr=16,
               mean=mean, std=std, **kw)


@pytest.mark.parametrize("cls", [WDSRConv3D, IWDSRConv3D])
def test_norm_argument_matches_baked_constants(cls, rng):
    model = _model(cls, "NIR")
    x = jnp.asarray(rng.uniform(4000, 12000, (2, 22, 22, 9, 1))
                    .astype(np.float32))
    norm = jnp.asarray([model.mean, model.std], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    baked = model.apply({"params": params}, x)
    passed = model.apply({"params": params}, x, norm)
    np.testing.assert_array_equal(np.asarray(baked), np.asarray(passed))


def test_trainer_step_hlo_identical_across_bands(tmp_path, rng):
    from probav_tpu.ops import ShiftCompensatedLosses
    from probav_tpu.train import ModelTrainer, build_optimizer

    x = rng.uniform(4000, 12000, (4, 22, 22, 9, 1)).astype(np.float32)
    hr = rng.uniform(4000, 12000, (4, 48, 48, 1)).astype(np.float32)
    mask = np.ones_like(hr)
    w = np.ones(4, np.float32)
    texts_train, texts_eval = {}, {}
    for band in ("NIR", "RED"):
        model = _model(WDSRConv3D, band)
        losses = ShiftCompensatedLosses(target_shape=(48, 48, 1),
                                        use_pallas=False)
        t = ModelTrainer(model, losses.l1, losses.cpsnr,
                         build_optimizer("nadam", 1e-3),
                         ckpt_dir=str(tmp_path / f"ck_{band}"),
                         log_dir=str(tmp_path / f"lg_{band}"),
                         loss_weighted_fn=losses.weighted("l1"))
        t.init_state(x[:1])
        t._build_steps()
        texts_train[band] = t._jit_train.inner.lower(
            t.state, x, hr, mask, t._norm).as_text()
        texts_eval[band] = t._jit_eval.inner.lower(
            t.state, x, hr, mask, w, t._norm).as_text()
    assert texts_train["NIR"] == texts_train["RED"]
    assert texts_eval["NIR"] == texts_eval["RED"]


def test_resolver_group_fn_hlo_identical_across_bands(rng):
    probe = rng.uniform(4000, 12000, (1, 22, 22, 9, 1)).astype(np.float32)
    texts = {}
    for band in ("NIR", "RED"):
        model = _model(WDSRConv3D, band)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(probe))["params"]
        r = Resolver(model, params, scene_size=384)
        fn = r._group_fn(64, 2)
        flat = jnp.zeros((2 * 64, 22, 22, 9, 1), jnp.float32)
        texts[band] = fn.inner.lower(params, flat, r._norm).as_text()
    assert texts["NIR"] == texts["RED"]


def test_resolver_norm_path_matches_baked(rng):
    """End-to-end: resolve_scene through the norm-argument path equals a
    baked-constant forward + reconstruct, up to the rounding quantum.

    With baked constants XLA constant-folds ``x / std`` into a multiply
    by the reciprocal; with norm-as-argument the divide happens at run
    time.  The two differ by float ulps, which ``jnp.round`` can flip
    across a .5 boundary — observed 2 of 9216 pixels off by exactly one
    16-bit count on the CPU backend.  Pin that contract: at most 1 count
    anywhere, and essentially everywhere bit-equal."""
    from probav_tpu.ops.patches import reconstruct_from_patches

    model = _model(WDSRConv3D, "RED")
    patches = rng.uniform(4000, 12000, (4, 22, 22, 9, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.asarray(patches[:1]))["params"]
    r = Resolver(model, params, scene_size=96)
    got = r.resolve_scene(patches)
    pred = model.apply({"params": params}, jnp.asarray(patches))
    want = np.asarray(reconstruct_from_patches(
        jnp.round(jnp.clip(pred, 0.0, 2.0 ** 16)), 96))
    diff = np.abs(got - want)
    assert diff.max() <= 1.0
    assert (diff != 0).mean() < 0.005
