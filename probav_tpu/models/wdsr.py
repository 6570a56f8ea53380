"""WDSR-B multi-frame super-resolution networks (flax).

TPU-first rebuild of the reference model family (models/modelsTF.py):

- ``WDSRConv3D`` — the flagship two-path net (modelsTF.py:7-203).  Input is a
  channels-last 5D batch ``[B, H, W, T, C]`` with H = W = patch + max_shift.
  The main path runs a weight-normalized Conv3D stem, ``num_res_blocks``
  WDSR-B wide-activation residual blocks (1x1x1 expand x exp_rate -> 1x1x1
  decay -> k^3 conv, residual add), then a temporal reduction ladder that
  collapses the T axis to 1 while trimming H,W from patch+6 to patch, a conv
  to scale^2 channels, and a depth-to-space pixel shuffle.  The residual path
  averages the frames and runs ``scale`` valid 2D convs + pixel shuffle.
  Dataset mean/std normalization defaults to in-graph constants; production
  call sites (trainer, resolver) instead pass ``norm=[mean, std]`` as a
  TRACED argument so the compiled executable is band-independent — the
  NIR and RED graphs are otherwise byte-identical HLO, and baking the
  band stats as constants forced a full recompile per band (a ~384 s
  fused-tier compile observed as the REHEARSAL_r04 RED/NIR serving
  asymmetry).

- ``IWDSRConv3D`` — the instance-norm + mish variant (modelsTF.py:206-388).

- ``FuseNetConv2D`` — the full-scene fusion/stitching net
  (modelsTF.py:391-474), variants v1/v2/v3.

Temporal reduction generalizes the reference's per-T hand-rolled variants
(``ConvReduceAndUpscale{,v2,v3,Ex}``, modelsTF.py:62-175): for kernel depth
kt the ladder needs ``(T - kt) // (kt - 1)`` relu convs, the first
``n_convs - 2`` of which reflect-pad H,W by 1 so the spatial budget works out
to patch+6 -> patch.  This reproduces the exact reference geometry for
T in {7, 9, 13}; T=19 keeps the reference's experimental bespoke schedule.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from probav_tpu.models.layers import WNConv, InstanceNorm, reflect_pad
from probav_tpu.ops.patches import depth_to_space

Dtype = Any


def reduction_schedule(num_img: int, kernel_t: int) -> Sequence[dict]:
    """Temporal-reduction ladder: list of conv steps before the upscale conv.

    Each step: {'pad': (ph, pw, pt), 'kernel': (kh, kw, kt)}.  Covers the
    reference variants exactly for T in {7, 9, 13} via the closed form and
    T=19 via the bespoke experimental schedule (modelsTF.py:76-121).
    """
    if num_img == 19 and kernel_t == 3:
        k3 = (3, 3, 3)
        return [
            {"pad": (2, 2, 2), "kernel": (5, 5, 5)},
            {"pad": (2, 2, 1), "kernel": k3},
            {"pad": (2, 2, 0), "kernel": k3},
            {"pad": (2, 2, 0), "kernel": k3},
            {"pad": (1, 1, 0), "kernel": k3},
        ] + [{"pad": (0, 0, 0), "kernel": k3}] * 5
    n_convs = (num_img - kernel_t) // (kernel_t - 1)
    if n_convs * (kernel_t - 1) + kernel_t != num_img:
        raise ValueError(
            f"num_low_res_imgs={num_img} incompatible with temporal kernel "
            f"{kernel_t}: need T = n*(kt-1) + kt for integer n")
    n_padded = max(0, n_convs - 2)
    k = (kernel_t,) * 3
    return ([{"pad": (1, 1, 0), "kernel": k}] * n_padded +
            [{"pad": (0, 0, 0), "kernel": k}] * (n_convs - n_padded))


class WDSRBlock(nn.Module):
    """WDSR-B wide-activation residual block (modelsTF.py:177-189):
    1x1x1 expand x exp_rate (relu) -> 1x1x1 decay -> k^3 conv -> add.

    ``fused=True`` runs expand->relu->decay through the Pallas wide-block
    kernel (ops/pallas_wide_block.py), which streams row tiles through VMEM
    instead of materializing the [*, filters*exp_rate] activation in HBM —
    the model's dominant memory traffic.  The parameter tree is identical
    in both modes.  ``effective_params`` exposes the weight-normalized
    kernels for the stack-level fused path (ops/pallas_block_stack.py).
    """

    num_filters: int
    exp_rate: int
    decay_rate: float
    kernel_size: Tuple[int, int, int]
    dtype: Dtype = jnp.float32
    fused: bool = False

    def setup(self):
        f = self.num_filters
        self.expand = WNConv(f * self.exp_rate, (1, 1, 1), "SAME", "relu",
                             dtype=self.dtype)
        self.decay = WNConv(int(f * self.decay_rate), (1, 1, 1), "SAME",
                            None, dtype=self.dtype)
        self.conv = WNConv(f, self.kernel_size, "SAME", None,
                           dtype=self.dtype)

    def effective_params(self, c_in: int):
        """(w1, b1, w2, b2, wc, bc) with weight norm applied; the 1x1x1
        kernels are flattened to matmul weights.  Declares the same params
        as ``__call__`` (linen scopes submodule methods together)."""
        f = self.num_filters
        c_mid = f * self.exp_rate
        c_dec = int(f * self.decay_rate)
        k1, b1 = self.expand.effective_kernel(c_in)
        k2, b2 = self.decay.effective_kernel(c_mid)
        kc, bc = self.conv.effective_kernel(c_dec)
        d = self.dtype
        return (k1.reshape(c_in, c_mid).astype(d), b1.astype(d),
                k2.reshape(c_mid, c_dec).astype(d), b2.astype(d),
                kc.astype(d), bc.astype(d))

    def __call__(self, x_in: jnp.ndarray) -> jnp.ndarray:
        f = self.num_filters
        c_mid = f * self.exp_rate
        c_dec = int(f * self.decay_rate)
        if self.fused:
            from probav_tpu.ops.pallas_wide_block import fused_expand_decay
            c_in = x_in.shape[-1]
            k1, b1 = self.expand.effective_kernel(c_in)
            k2, b2 = self.decay.effective_kernel(c_mid)
            flat = x_in.reshape(-1, c_in).astype(self.dtype)
            y = fused_expand_decay(
                flat,
                k1.reshape(c_in, c_mid).astype(self.dtype),
                b1.astype(self.dtype),
                k2.reshape(c_mid, c_dec).astype(self.dtype),
                b2.astype(self.dtype))
            x = y.reshape(x_in.shape[:-1] + (c_dec,))
        else:
            x = self.decay(self.expand(x_in))
        x = self.conv(x)
        return x + x_in


class WDSRConv3D(nn.Module):
    """Flagship WDSR-B 3D fusion net.  Call with [B, H, W, T, C].

    ``remat`` wraps each residual block in jax.checkpoint, trading recompute
    for activation memory (the 256-channel expand activations dominate) —
    useful for very large batches on one chip.
    """

    scale: int = 3
    num_filters: int = 32
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    num_res_blocks: int = 12
    exp_rate: int = 8
    decay_rate: float = 0.8
    num_img_lr: int = 9
    patch_size_lr: int = 16
    mean: float = 0.0
    std: float = 1.0
    dtype: Dtype = jnp.float32
    remat: bool = False
    fused_block: bool = False
    fused_stack: Any = False   # False | True (flat v1) | "t" (transposed)
    stack_loop: str = "unroll"  # "unroll" | "scan" | "scan:<k>" —
    #                            fused_stack="t" block loop form; scan =
    #                            same kernels, one executable instance each
    #                            (fast cold start); scan:<k> unrolls k
    #                            blocks per scan iteration (middle ground)
    mesh: Any = None           # with fused_stack="t": run the stack under
    #                            shard_map, batch split over the 'data' axis

    @nn.compact
    def __call__(self, x: jnp.ndarray, norm=None) -> jnp.ndarray:
        if x.ndim != 5 or x.shape[3] != self.num_img_lr:
            raise ValueError(
                f"WDSRConv3D expects [B, H, W, T={self.num_img_lr}, C] "
                f"input, got {x.shape}")
        # norm: optional [2] array (mean, std) passed as traced data so one
        # compiled executable serves every band (see module docstring);
        # None falls back to the baked attribute constants.
        mean, std = ((self.mean, self.std) if norm is None
                     else (norm[0], norm[1]))
        x = x.astype(jnp.float32)
        mean_lr = jnp.mean(x, axis=3)                     # [B, H, W, C]
        xn = ((x - mean) / std).astype(self.dtype)
        mn = ((mean_lr - mean) / std).astype(self.dtype)

        main = self._main_path(xn)
        residual = self._residual_path(mn)
        out = main + residual
        return out.astype(jnp.float32) * std + mean

    # -- high-frequency path (modelsTF.py:55-74) ------------------------- #

    def _main_path(self, x: jnp.ndarray) -> jnp.ndarray:
        f, k = self.num_filters, self.kernel_size
        x = WNConv(f, k, "SAME", "relu", dtype=self.dtype, name="mainConv1")(x)
        from probav_tpu.ops import pallas_tstack
        # The transposed stack needs the (per-shard) batch to fill whole
        # 128-lane groups (tap shifts are multiples of B); odd batches —
        # notably model.init's sample of 1 — take the plain loop, which
        # declares the identical parameter tree.
        shards = 1
        if self.mesh is not None and "data" in self.mesh.shape:
            shards = self.mesh.shape["data"]
        aligned = (x.shape[0] % shards == 0 and
                   ((x.shape[0] // shards) % 128 == 0 or
                    pallas_tstack.INTERPRET))
        use_t = self.fused_stack == "t" and aligned
        if self.fused_stack == "t" and not aligned and x.shape[0] > 1:
            # Loud fallback (batch 1 is model.init's probe — stay quiet).
            import logging
            logging.getLogger("probav_tpu.models").warning(
                "fused_stack='t' requested but batch %d over %d data "
                "shard(s) does not fill whole 128-lane groups; this "
                "compilation falls back to the plain XLA stack (~40%% "
                "slower). Use a global batch of 128 x data-shards.",
                x.shape[0], shards)
        if use_t:
            # Transposed fully-fused stack (ops/pallas_tstack.py): one
            # custom_vjp, activations in XLA's batch-minor orientation,
            # conv taps as lane shifts; identical param tree.
            import functools
            from probav_tpu.ops.pallas_tstack import stack_apply_5d
            apply_stack = functools.partial(stack_apply_5d,
                                            loop=self.stack_loop)
            blocks = tuple(
                WDSRBlock(f, self.exp_rate, self.decay_rate, k,
                          dtype=self.dtype,
                          name=f"resBlock_{i}").effective_params(f)
                for i in range(self.num_res_blocks))
            if shards > 1:
                # SPMD: the partitioner cannot split a custom call, so
                # run the stack under shard_map — each chip applies the
                # kernels to its batch shard with replicated weights
                # (debug/trainMultiGPU.py:65-68 capability, kernel tier).
                import jax
                from jax.sharding import PartitionSpec as P
                bspecs = jax.tree.map(lambda _: P(), blocks)
                x = jax.shard_map(
                    apply_stack, mesh=self.mesh,
                    in_specs=(P("data"), bspecs),
                    out_specs=P("data"), check_vma=False)(x, blocks)
            else:
                x = apply_stack(x, blocks)
        elif self.fused_stack and self.fused_stack != "t":
            # ONE custom_vjp around the whole stack (see
            # ops/pallas_block_stack.py); identical param tree.  remat is
            # moot here — the stack saves only narrow residuals by design.
            from probav_tpu.ops.pallas_block_stack import fused_block_stack
            blocks = tuple(
                WDSRBlock(f, self.exp_rate, self.decay_rate, k,
                          dtype=self.dtype,
                          name=f"resBlock_{i}").effective_params(f)
                for i in range(self.num_res_blocks))
            x = fused_block_stack(x, blocks)
        else:
            block_cls = nn.remat(WDSRBlock) if self.remat else WDSRBlock
            for i in range(self.num_res_blocks):
                x = block_cls(f, self.exp_rate, self.decay_rate, k,
                              dtype=self.dtype, fused=self.fused_block,
                              name=f"resBlock_{i}")(x)
        for s, step in enumerate(reduction_schedule(self.num_img_lr, k[2])):
            ph, pw, pt = step["pad"]
            if ph or pw or pt:
                x = reflect_pad(x, (ph, pw, pt))
            x = WNConv(f, step["kernel"], "VALID", "relu", dtype=self.dtype,
                       name=f"convReducer_{s + 1}")(x)
        x = WNConv(self.scale ** 2, k, "VALID", None, dtype=self.dtype,
                   name="upscaleConv1")(x)                # [B, p, p, 1, s^2]
        b, h, w = x.shape[:3]
        x = x.reshape(b, h, w, self.scale ** 2)
        return depth_to_space(x, self.scale)

    # -- low-frequency path (modelsTF.py:45-53) -------------------------- #

    def _residual_path(self, x: jnp.ndarray) -> jnp.ndarray:
        k2 = self.kernel_size[:2]
        for i in range(self.scale):
            act = "relu" if i == 0 else None
            x = WNConv(self.scale ** 2, k2, "VALID", act, dtype=self.dtype,
                       name=f"residConv{i + 1}")(x)
        return depth_to_space(x, self.scale)


class IWDSRConv3D(nn.Module):
    """Instance-norm + mish WDSR variant (modelsTF.py:206-388).

    Deviation from the reference, documented: the reference's residual path
    prepends three extra VALID 3x3 convs (modelsTF.py:244-250), which is
    geometrically inconsistent with the main path for max_shift=6 (22->10 vs
    ->16) — the model as written in the reference cannot run.  Here those
    three extra convs use SAME padding so the published topology is usable.
    """

    scale: int = 3
    num_filters: int = 32
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    num_res_blocks: int = 12
    exp_rate: int = 8
    decay_rate: float = 0.8
    num_img_lr: int = 9
    patch_size_lr: int = 16
    mean: float = 0.0
    std: float = 1.0
    dtype: Dtype = jnp.float32

    def _conv_in(self, x, features, kernel, padding, act, name):
        x = WNConv(features, kernel, padding, None, dtype=self.dtype,
                   name=name)(x)
        x = InstanceNorm(dtype=self.dtype, name=f"{name}_in")(x)
        if act is not None:
            from probav_tpu.models.layers import _ACTS
            x = _ACTS[act](x)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, norm=None) -> jnp.ndarray:
        mean, std = ((self.mean, self.std) if norm is None
                     else (norm[0], norm[1]))
        x = x.astype(jnp.float32)
        mean_lr = jnp.mean(x, axis=3)
        xn = ((x - mean) / std).astype(self.dtype)
        mn = ((mean_lr - mean) / std).astype(self.dtype)

        f, k = self.num_filters, self.kernel_size
        h = self._conv_in(xn, f, k, "SAME", "mish", "mainConv1")
        for i in range(self.num_res_blocks):
            r = self._conv_in(h, f * self.exp_rate, (1, 1, 1), "SAME", "mish",
                              f"expConv_{i}")
            r = self._conv_in(r, int(f * self.decay_rate), (1, 1, 1), "SAME",
                              None, f"decConv_{i}")
            r = self._conv_in(r, f, k, "SAME", None, f"normConv_{i}")
            h = h + r
        for s, step in enumerate(reduction_schedule(self.num_img_lr, k[2])):
            ph, pw, pt = step["pad"]
            if ph or pw or pt:
                h = reflect_pad(h, (ph, pw, pt))
            h = self._conv_in(h, f, step["kernel"], "VALID", "mish",
                              f"convReducer_{s}")
        h = self._conv_in(h, self.scale ** 2, k, "VALID", None, "upscaleConv1")
        b, hh, ww = h.shape[:3]
        main = depth_to_space(h.reshape(b, hh, ww, self.scale ** 2), self.scale)

        k2 = k[:2]
        r = self._conv_in(mn, self.scale ** 2, k2, "SAME", "mish", "residConv1")
        r = self._conv_in(r, self.scale ** 2, k2, "SAME", None, "residConv2")
        r = self._conv_in(r, self.scale ** 2, k2, "SAME", None, "residConv3")
        for i in range(self.scale):
            act = "mish" if i == 0 else None
            r = self._conv_in(r, self.scale ** 2, k2, "VALID", act,
                              f"residConv{i + 4}")
        residual = depth_to_space(r, self.scale)

        out = (main + residual).astype(jnp.float32)
        return out * std + mean


class FuseNetConv2D(nn.Module):
    """Full-scene fusion/stitching net (modelsTF.py:391-474).

    Input [B, 384, 384, 1]; output adds a learned correction to the input.
    ``variant`` selects v1 (stride-3 conv stack + dts), v2 (stride-8 + dts),
    or v3 (single wide k48 conv + channel mean), v3 being the live one.
    """

    variant: str = "v3"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, norm=None) -> jnp.ndarray:
        # norm accepted for call-signature uniformity with the WDSR family
        # (the trainer/resolver pass it unconditionally); FuseNet has no
        # dataset normalization in the reference (modelsTF.py:391-474).
        del norm
        x = x.astype(self.dtype)
        if self.variant == "v3":
            h = nn.Conv(64, (48, 48), padding="SAME", dtype=self.dtype,
                        name="conv1")(x)
            h = InstanceNorm(name="in1")(h)
            h = nn.leaky_relu(h, negative_slope=0.3)
            main = jnp.mean(h, axis=3, keepdims=True)
        elif self.variant == "v2":
            h = nn.Conv(64, (8, 8), strides=(8, 8), padding="SAME",
                        dtype=self.dtype, name="conv1")(x)
            h = InstanceNorm(name="in1")(h)
            h = nn.leaky_relu(h, negative_slope=0.3)
            h = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv2")(h)
            h = InstanceNorm(name="in2")(h)
            h = nn.leaky_relu(h, negative_slope=0.3)
            main = depth_to_space(h, 8)
        elif self.variant == "v1":
            h = nn.Conv(128, (3, 3), strides=(3, 3), padding="SAME",
                        dtype=self.dtype, name="conv1")(x)
            h = InstanceNorm(name="in1")(h)
            h = nn.leaky_relu(h, negative_slope=0.3)
            for j, feats in enumerate((64, 32, 9), start=2):
                h = nn.Conv(feats, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{j}")(h)
                h = InstanceNorm(name=f"in{j}")(h)
                h = nn.leaky_relu(h, negative_slope=0.3)
            main = depth_to_space(h, 3)
        else:
            raise ValueError(f"unknown FuseNet variant {self.variant!r}")
        return (x + main).astype(jnp.float32)


def build_model(cfg, band: str, model_type: str = "wdsr",
                dtype: Dtype = jnp.float32, remat: bool = False,
                fused_block: bool = False,
                fused_stack: Any = False, mesh: Any = None,
                stack_loop: str = "unroll") -> nn.Module:
    """Construct the model described by a Config for one band.

    Mirrors the build call sites (train.py:66-74, test.py:48-56): kernel_size
    expands to a cube, mean/std come from the band's dataset statistics.

    Kernel tiers: ``fused_stack='t'`` (the transposed Pallas stack) is the
    ONLY production tier — measured fastest at every tested width/dtype
    (BENCH_NOTES.md).  ``fused_block=True`` and ``fused_stack=True`` (flat)
    are retained as measured-losing archive paths documenting the round-1/2
    kernel iterations; selecting them is a deliberate benchmark-replay
    action, not a production configuration.
    """
    if model_type == "fusenet":
        return FuseNetConv2D(dtype=dtype)
    mean, std = cfg.band_stats(band)
    cls = {"wdsr": WDSRConv3D, "iwdsr": IWDSRConv3D}[model_type]
    extra = ({"remat": remat, "fused_block": fused_block,
              "fused_stack": fused_stack, "mesh": mesh,
              "stack_loop": stack_loop}
             if model_type == "wdsr" else {})
    return cls(
        **extra,
        scale=cfg.scale,
        num_filters=cfg.num_filters,
        kernel_size=(cfg.kernel_size,) * 3,
        num_res_blocks=cfg.num_res_blocks,
        exp_rate=cfg.exp_rate,
        decay_rate=cfg.decay_rate,
        num_img_lr=cfg.num_low_res_imgs,
        patch_size_lr=cfg.patch_size,
        mean=mean,
        std=std,
        dtype=dtype,
    )


def input_shape(cfg, batch: int = 1) -> Tuple[int, ...]:
    """Model input shape [B, p+shift, p+shift, T, C] (modelsTF.py:19-20)."""
    s = cfg.lr_input_size
    c = 1 if cfg.is_grayscale else 3
    return (batch, s, s, cfg.num_low_res_imgs, c)
