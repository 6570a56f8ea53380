"""Parity tests for the transposed fused WDSR-B stack (ops/pallas_tstack).

Runs the Pallas kernels through the interpreter on a small geometry and
checks forward and full gradients (input + all six per-block params)
against a plain-XLA reference built from the same effective parameters —
the same contract as the reference's block loop (modelsTF.py:177-189).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

import probav_tpu.ops.pallas_tstack as ts

B, H, W, T, C = 4, 5, 6, 3, 8
CMID, CDEC, NBLK = 16, 7, 3
DIMS3 = ("NHWDC", "HWDIO", "NHWDC")


@pytest.fixture(autouse=True)
def _interpret():
    old = ts.INTERPRET
    ts.INTERPRET = True
    yield
    ts.INTERPRET = old


@pytest.fixture(scope="module")
def blocks():
    r = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(r.normal(0, 0.3, s), jnp.float32)
    return tuple(
        (mk(C, CMID), mk(CMID), mk(CMID, CDEC), mk(CDEC),
         mk(3, 3, 3, CDEC, C), mk(C))
        for _ in range(NBLK))


@pytest.fixture(scope="module")
def x5():
    r = np.random.default_rng(4)
    return jnp.asarray(r.normal(0, 1, (B, H, W, T, C)), jnp.float32)


def ref_stack(x, blocks):
    h = x
    for (w1, b1, w2, b2, wc, bc) in blocks:
        flat = h.reshape(-1, C)
        d = (jnp.maximum(flat @ w1 + b1, 0.0) @ w2 + b2)
        d = d.reshape(h.shape[:-1] + (CDEC,))
        h = h + lax.conv_general_dilated(
            d, wc, (1, 1, 1), "SAME", dimension_numbers=DIMS3) + bc
    return h


def t_stack(x, blocks):
    return ts.stack_apply_5d(x, blocks, target_rows=18, target_ch=6)


def test_forward_parity(x5, blocks):
    out = t_stack(x5, blocks)
    ref = ref_stack(x5, blocks)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) < 2e-5 * scale


def test_gradient_parity(x5, blocks):
    def loss_t(x, b):
        return jnp.sum(jnp.sin(t_stack(x, b)))

    def loss_r(x, b):
        return jnp.sum(jnp.sin(ref_stack(x, b)))

    gt = jax.grad(loss_t, argnums=(0, 1))(x5, blocks)
    gr = jax.grad(loss_r, argnums=(0, 1))(x5, blocks)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() /
                           (jnp.abs(b).max() + 1e-8)), gt, gr)
    worst = max(jax.tree_util.tree_leaves(rel))
    assert worst < 1e-4, rel


def test_wide_decay_channels(x5):
    """c_dec > c_out exercises the channel-derived tap-piece stride
    (the 64-filter reference model has c_dec=51 > 32)."""
    r = np.random.default_rng(9)
    mk = lambda *s: jnp.asarray(r.normal(0, 0.3, s), jnp.float32)
    cdec = 12   # > C=8, not a multiple of 8 -> sub = 16
    blocks = ((mk(C, CMID), mk(CMID), mk(CMID, cdec), mk(cdec),
               mk(3, 3, 3, cdec, C), mk(C)),)

    def ref(x, b):
        (w1, b1, w2, b2, wc, bc) = b[0]
        d = (jnp.maximum(x.reshape(-1, C) @ w1 + b1, 0.0) @ w2 + b2)
        d = d.reshape(x.shape[:-1] + (cdec,))
        return x + lax.conv_general_dilated(
            d, wc, (1, 1, 1), "SAME", dimension_numbers=DIMS3) + bc

    out = t_stack(x5, blocks)
    expect = ref(x5, blocks)
    assert float(jnp.abs(out - expect).max()) < \
        2e-5 * float(jnp.abs(expect).max())
    gt = jax.grad(lambda x, b: jnp.sum(jnp.sin(t_stack(x, b))),
                  argnums=(0, 1))(x5, blocks)
    gr = jax.grad(lambda x, b: jnp.sum(jnp.sin(ref(x, b))),
                  argnums=(0, 1))(x5, blocks)
    rel = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max() /
                                          (jnp.abs(b).max() + 1e-8)),
                       gt, gr)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-4, rel


def scan_stack(x, blocks, loop="scan"):
    return ts.stack_apply_5d(x, blocks, target_rows=18, target_ch=6,
                             loop=loop)


# scan:2 does not divide NBLK=3 — exercises lax.scan's remainder path;
# scan:3 fully unrolls inside one scan iteration.
SCAN_LOOPS = ["scan", "scan:2", "scan:3"]


@pytest.mark.parametrize("loop", SCAN_LOOPS)
def test_scan_loop_forward_matches_unrolled(x5, blocks, loop):
    """loop='scan[:k]' runs the SAME kernels via lax.scan — outputs must
    match the unrolled stack to numerical noise."""
    un = t_stack(x5, blocks)
    sc = scan_stack(x5, blocks, loop)
    scale = float(jnp.abs(un).max())
    assert float(jnp.abs(sc - un).max()) < 1e-6 * scale


@pytest.mark.parametrize("loop", SCAN_LOOPS)
def test_scan_loop_gradient_matches_unrolled(x5, blocks, loop):
    gu = jax.grad(lambda x, b: jnp.sum(jnp.sin(t_stack(x, b))),
                  argnums=(0, 1))(x5, blocks)
    gs = jax.grad(lambda x, b: jnp.sum(jnp.sin(scan_stack(x, b, loop))),
                  argnums=(0, 1))(x5, blocks)
    assert jax.tree_util.tree_structure(gu) == \
        jax.tree_util.tree_structure(gs)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() /
                           (jnp.abs(b).max() + 1e-8)), gs, gu)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-6, rel


def test_parse_loop():
    assert ts.parse_loop("unroll") == ("unroll", 0)
    assert ts.parse_loop("scan") == ("scan", 1)
    assert ts.parse_loop("scan:4") == ("scan", 4)
    with pytest.raises(ValueError):
        ts.parse_loop("scan:0")
    with pytest.raises(ValueError):
        ts.parse_loop("rolled")


def test_model_stack_loop_scan_parity():
    """WDSRConv3D(fused_stack='t', stack_loop='scan') matches the plain
    path with the same parameter tree (the cold-start-optimized form)."""
    from probav_tpu.models import WDSRConv3D

    kw = dict(scale=3, num_filters=8, num_res_blocks=2, exp_rate=4,
              decay_rate=0.8, num_img_lr=7, patch_size_lr=4,
              mean=100.0, std=50.0)
    plain = WDSRConv3D(**kw)
    fused = WDSRConv3D(fused_stack="t", stack_loop="scan", **kw)
    r = np.random.default_rng(8)
    x = jnp.asarray(r.uniform(0, 300, (2, 10, 10, 7, 1)), jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    out_p = plain.apply({"params": params}, x)
    out_f = fused.apply({"params": params}, x)
    scale = float(jnp.abs(out_p).max())
    assert float(jnp.abs(out_p - out_f).max()) < 1e-4 * scale

    def loss(fn, p):
        return jnp.mean(jnp.square(fn.apply({"params": p}, x) / 100.0))

    gp = jax.grad(lambda p: loss(plain, p))(params)
    gf = jax.grad(lambda p: loss(fused, p))(params)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() /
                           (jnp.abs(a).max() + 1e-8)), gp, gf)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-3, rel


def test_adapters_roundtrip(x5):
    g = ts.make_geom(H, W, T, B, target_rows=18, target_ch=6)
    x2 = ts.to_t(x5, g)
    assert x2.shape == (C, g.ext)
    # pad lanes and margins are zero
    im = ts.interior_mask(g, jnp.float32)
    assert float(jnp.abs(x2 * (1 - im)).max()) == 0.0
    back = ts.from_t(x2, g, B, H, W, T)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x5))


def test_geom_divisors():
    g = ts.make_geom(22, 22, 9, 128)
    assert g.S % g.rows == 0 and g.rows % g.ch_rows == 0
    assert g.S == 22 * 24 * 11


def test_model_fused_stack_t_mesh():
    """fused_stack='t' under a data mesh: the stack runs per-shard via
    shard_map and matches the single-device plain path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from probav_tpu.models import WDSRConv3D

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    kw = dict(scale=3, num_filters=8, num_res_blocks=2, exp_rate=4,
              decay_rate=0.8, num_img_lr=7, patch_size_lr=4,
              mean=100.0, std=50.0)
    plain = WDSRConv3D(**kw)
    fused = WDSRConv3D(fused_stack="t", mesh=mesh, **kw)
    r = np.random.default_rng(6)
    x = jnp.asarray(r.uniform(0, 300, (8, 10, 10, 7, 1)), jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out_f = jax.jit(lambda p, xx: fused.apply({"params": p}, xx))(
        params, xs)
    out_p = plain.apply({"params": params}, x)
    scale = float(jnp.abs(out_p).max())
    assert float(jnp.abs(out_p - out_f).max()) < 1e-4 * scale

    # Gradient parity under the mesh: shard_map with replicated weight
    # specs + check_vma=False is exactly where silent gradient-scaling
    # bugs would live (cf. the reference's per-replica loss scaling,
    # debug/trainClassMultiGPU.py:134-142) — the full param gradient of
    # the sharded fused model must match the single-device plain path.
    def loss(m, p, xx):
        return jnp.mean(jnp.square(m.apply({"params": p}, xx) / 100.0))

    gp = jax.grad(lambda p: loss(plain, p, x))(params)
    gf = jax.jit(jax.grad(lambda p: loss(fused, p, xs)))(params)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() /
                           (jnp.abs(a).max() + 1e-8)), gp, gf)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-3, rel


def test_model_fused_stack_t_parity():
    """WDSRConv3D(fused_stack='t') matches the plain path with the SAME
    parameter tree (weight norm chains through the fused custom_vjp)."""
    from probav_tpu.models import WDSRConv3D

    kw = dict(scale=3, num_filters=8, num_res_blocks=2, exp_rate=4,
              decay_rate=0.8, num_img_lr=7, patch_size_lr=4,
              mean=100.0, std=50.0)
    plain = WDSRConv3D(**kw)
    fused = WDSRConv3D(fused_stack="t", **kw)
    r = np.random.default_rng(5)
    x = jnp.asarray(r.uniform(0, 300, (2, 10, 10, 7, 1)), jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    p2 = fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)

    out_p = plain.apply({"params": params}, x)
    out_f = fused.apply({"params": params}, x)
    scale = float(jnp.abs(out_p).max())
    assert float(jnp.abs(out_p - out_f).max()) < 1e-4 * scale

    def loss(fn, p):
        return jnp.mean(jnp.square(fn.apply({"params": p}, x) / 100.0))

    gp = jax.grad(lambda p: loss(plain, p))(params)
    gf = jax.grad(lambda p: loss(fused, p))(params)
    rel = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max() /
                           (jnp.abs(a).max() + 1e-8)), gp, gf)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-3, rel
