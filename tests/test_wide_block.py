"""Fused wide-block kernel numerics (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from probav_tpu.ops import pallas_wide_block as pwb
from probav_tpu.models import WDSRConv3D


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pwb.INTERPRET
    pwb.INTERPRET = True
    yield
    pwb.INTERPRET = old


def ref_chain(x, w1, b1, w2, b2):
    return jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2


def test_forward_and_vjp_match_xla(rng):
    n, cin, cmid, cout = 300, 8, 32, 8   # n deliberately not tile-aligned
    x = jnp.asarray(rng.normal(size=(n, cin)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(cin, cmid)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(cmid,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(cmid, cout)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

    want = ref_chain(x, w1, b1, w2, b2)
    got = pwb.fused_expand_decay(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)

    gr = jax.grad(lambda a: jnp.sum(jnp.sin(ref_chain(*a))))((x, w1, b1, w2, b2))
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(pwb.fused_expand_decay(*a))))(
        (x, w1, b1, w2, b2))
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-5 * float(jnp.abs(a).max() + 1e-9))


def test_fused_model_matches_plain_forward(rng):
    common = dict(scale=3, num_filters=4, num_res_blocks=2, exp_rate=2,
                  decay_rate=0.8, num_img_lr=9, patch_size_lr=16,
                  mean=100.0, std=50.0)
    plain = WDSRConv3D(**common)
    fused = WDSRConv3D(fused_block=True, **common)
    x = jnp.asarray(rng.uniform(50, 150, (2, 22, 22, 9, 1)), jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)
    # identical param tree in both modes
    assert (jax.tree.structure(params) ==
            jax.tree.structure(fused.init(jax.random.PRNGKey(0), x)))
    y0 = plain.apply(params, x)
    y1 = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5,
                               atol=1e-2)
