"""Stack-level fused backward numerics (interpreter mode on CPU).

The custom backward of ops/pallas_block_stack.py must reproduce XLA
autodiff of the identical forward — including through the weight-norm
reparameterization when driven from the model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from probav_tpu.ops import pallas_wide_block as pwb
from probav_tpu.ops.pallas_block_stack import _block_fwd, fused_block_stack
from probav_tpu.models import WDSRConv3D


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pwb.INTERPRET
    pwb.INTERPRET = True
    yield
    pwb.INTERPRET = old


def make_blocks(rng, n_blocks, c, c_mid, c_dec, kt=3):
    out = []
    for _ in range(n_blocks):
        out.append(tuple(
            jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
            for s in [(c, c_mid), (c_mid,), (c_mid, c_dec), (c_dec,),
                      (kt, kt, kt, c_dec, c), (c,)]))
    return tuple(out)


def plain_stack(x, blocks):
    h = x
    for p in blocks:
        h, _ = _block_fwd(h, p)   # same XLA forward, no custom_vjp
    return h


class TestFusedBlockStack:
    def test_forward_matches_plain(self, rng):
        blocks = make_blocks(rng, 3, c=8, c_mid=16, c_dec=6)
        x = jnp.asarray(rng.normal(size=(2, 6, 6, 5, 8)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(fused_block_stack(x, blocks)),
            np.asarray(plain_stack(x, blocks)), rtol=1e-6, atol=1e-6)

    def test_vjp_matches_xla_autodiff(self, rng):
        blocks = make_blocks(rng, 2, c=8, c_mid=16, c_dec=6)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 5, 8)), jnp.float32)

        def loss_plain(args):
            return jnp.sum(jnp.sin(plain_stack(*args)))

        def loss_fused(args):
            return jnp.sum(jnp.sin(fused_block_stack(*args)))

        gr = jax.grad(loss_plain)((x, blocks))
        gf = jax.grad(loss_fused)((x, blocks))
        for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4,
                atol=1e-5 * float(jnp.abs(a).max() + 1e-9))


class TestFusedStackModel:
    common = dict(scale=3, num_filters=4, num_res_blocks=2, exp_rate=2,
                  decay_rate=0.8, num_img_lr=9, patch_size_lr=16,
                  mean=100.0, std=50.0)

    def test_param_tree_and_forward_parity(self, rng):
        plain = WDSRConv3D(**self.common)
        fused = WDSRConv3D(fused_stack=True, **self.common)
        x = jnp.asarray(rng.uniform(50, 150, (2, 22, 22, 9, 1)), jnp.float32)
        params = plain.init(jax.random.PRNGKey(0), x)
        assert (jax.tree.structure(params) ==
                jax.tree.structure(fused.init(jax.random.PRNGKey(0), x)))
        y0 = plain.apply(params, x)
        y1 = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-5, atol=1e-2)

    def test_model_grads_match_through_weight_norm(self, rng):
        # Gradients w.r.t. v/g/bias must chain through the WN reparam
        # outside the custom_vjp boundary.
        plain = WDSRConv3D(**self.common)
        fused = WDSRConv3D(fused_stack=True, **self.common)
        x = jnp.asarray(rng.uniform(50, 150, (1, 22, 22, 9, 1)), jnp.float32)
        params = plain.init(jax.random.PRNGKey(1), x)

        def loss(model):
            def f(p):
                return jnp.mean(jnp.abs(model.apply(p, x))) * 1e-2
            return f

        gp = jax.grad(loss(plain))(params)
        gf = jax.grad(loss(fused))(params)
        # identical tree structure -> leaves_with_path align positionally
        for (kp, a), (kf, b) in zip(
                jax.tree_util.tree_leaves_with_path(gp),
                jax.tree_util.tree_leaves_with_path(gf)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4,
                atol=1e-6 + 1e-4 * float(jnp.abs(a).max()),
                err_msg=str(kp))
