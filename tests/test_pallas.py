"""Pallas shift-loss kernel correctness (interpreter mode on the CPU mesh).

The fused kernel is opt-in on device (see module STATUS note); these tests
pin its numerics — forward table parity and the hand-derived custom-VJP
gradient — against the vectorized XLA implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from probav_tpu.ops.shift_loss import ShiftCompensatedLosses
from probav_tpu.ops import pallas_shift_loss as psl


@pytest.fixture(autouse=True)
def interpret_mode():
    old = psl.INTERPRET
    psl.INTERPRET = True
    yield
    psl.INTERPRET = old


def make(rng, b):
    hr = rng.uniform(0, 65535, (b, 48, 48, 1)).astype(np.float32)
    mask = (rng.uniform(size=(b, 48, 48, 1)) > 0.2).astype(np.float32)
    pred = rng.uniform(0, 65535, (b, 48, 48, 1)).astype(np.float32)
    return hr, mask, pred


@pytest.mark.parametrize("kind", ["l1", "l2"])
def test_forward_table_matches_xla(rng, kind):
    hr, mask, pred = make(rng, 8)
    xla = ShiftCompensatedLosses((48, 48, 1), use_pallas=False)
    want = np.asarray(getattr(xla, f"_per_shift_{kind}")(hr, mask, pred))
    got = np.asarray(psl.per_shift_table(kind, jnp.asarray(hr),
                                         jnp.asarray(mask),
                                         jnp.asarray(pred)))
    np.testing.assert_allclose(got, want, rtol=3e-5)


def test_batch_padding_roundtrip(rng):
    # B=5 exercises the pad-to-TILE_B path; values must match B=5 of B=8.
    hr, mask, pred = make(rng, 5)
    xla = ShiftCompensatedLosses((48, 48, 1), use_pallas=False)
    want = np.asarray(xla._per_shift_l1(hr, mask, pred))
    got = np.asarray(psl.per_shift_table("l1", jnp.asarray(hr),
                                         jnp.asarray(mask),
                                         jnp.asarray(pred)))
    assert got.shape == (49, 5)
    np.testing.assert_allclose(got, want, rtol=3e-5)


@pytest.mark.parametrize("kind", ["l1", "l2"])
def test_custom_vjp_matches_autodiff(rng, kind):
    hr, mask, pred = make(rng, 8)
    xla = ShiftCompensatedLosses((48, 48, 1), use_pallas=False)

    def xla_loss(p):
        tab = getattr(xla, f"_per_shift_{kind}")(hr, mask, p)
        return jnp.mean(jnp.min(tab, axis=0))

    def pal_loss(p):
        tab = psl.per_shift_table(kind, jnp.asarray(hr), jnp.asarray(mask), p)
        return jnp.mean(jnp.min(tab, axis=0))

    gx = np.asarray(jax.grad(xla_loss)(jnp.asarray(pred)))
    gp = np.asarray(jax.grad(pal_loss)(jnp.asarray(pred)))
    np.testing.assert_allclose(gp, gx, rtol=1e-4,
                               atol=1e-6 * np.abs(gx).max())


def test_supports_gate():
    assert psl.supports(jnp.zeros((2, 48, 48, 1)), 3)
    assert not psl.supports(jnp.zeros((2, 48, 48, 3)), 3)   # multichannel
    assert not psl.supports(jnp.zeros((2, 48, 42, 1)), 3)   # non-square
    assert not psl.supports(jnp.zeros((2, 6, 6, 1)), 3)     # too small
