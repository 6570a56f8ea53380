"""Building-block layers: weight-normalized convs, instance norm, activations.

TPU-native equivalents of the reference's Keras layer zoo
(models/modelsTF.py:191-197, 319-382):

- ``WNConv`` — Conv2D/Conv3D with weight normalization, reproducing
  tensorflow_addons ``WeightNormalization(conv, data_init=False)``: the kernel
  is reparameterized as ``g * v / ||v||`` with the norm taken over every axis
  except output channels, and ``g`` initialized to ``||v||`` so the initial
  effective kernel equals the plain Glorot-uniform init.
- ``InstanceNorm`` — tfa InstanceNormalization (per-sample, per-channel
  spatial normalization, eps 1e-3, uniform-random gamma/beta init).
- ``mish`` — x * tanh(softplus(x)).

Convs are channels-last ("NHWC" / "NHWDC" with the temporal axis as the third
spatial dim), which is the layout XLA tiles best onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any

_DIMS = {
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NHWDC", "HWDIO", "NHWDC"),
}


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jnp.log1p(jnp.exp(x)))


_ACTS = {
    None: lambda x: x,
    "relu": nn.relu,
    "mish": mish,
    "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.3),
}


def reflect_pad(x: jnp.ndarray, pads: Sequence[int]) -> jnp.ndarray:
    """Reflect-pad the spatial axes (all but first/last) by ``pads`` per side."""
    cfg = [(0, 0)] + [(p, p) for p in pads] + [(0, 0)]
    return jnp.pad(x, cfg, mode="reflect")


class WNConv(nn.Module):
    """Weight-normalized N-D convolution (N = len(kernel_size) in {2, 3})."""

    features: int
    kernel_size: Tuple[int, ...]
    padding: str = "SAME"             # 'SAME' | 'VALID'
    activation: Optional[str] = None  # None | 'relu' | 'mish' | 'leakyrelu'
    use_bias: bool = True
    dtype: Dtype = jnp.float32        # compute dtype (params stay f32)

    @nn.compact
    def effective_kernel(self, in_features: int):
        """(kernel, bias) with the weight-norm reparam applied.

        Same parameter definitions as ``__call__`` (linen scopes methods of
        one submodule together), so callers may fuse the conv elsewhere —
        e.g. the Pallas wide-block kernel — without changing the param tree.
        """
        kshape = tuple(self.kernel_size) + (in_features, self.features)
        v = self.param("kernel_v", nn.initializers.glorot_uniform(), kshape,
                       jnp.float32)
        reduce_axes = tuple(range(v.ndim - 1))

        def g_init(_rng, *_args):
            # data_init=False in tfa: g <- ||v|| so initial kernel == v.
            return jnp.sqrt(jnp.sum(jnp.square(v), axis=reduce_axes))

        g = self.param("wn_g", g_init, (self.features,), jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=reduce_axes))
        kernel = v * (g / norm)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = len(self.kernel_size)
        kernel, b = self.effective_kernel(x.shape[-1])

        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,) * ndim,
            padding=self.padding,
            dimension_numbers=_DIMS[ndim],
        )
        if b is not None:
            y = y + b.astype(self.dtype)
        return _ACTS[self.activation](y)


class InstanceNorm(nn.Module):
    """tfa InstanceNormalization: normalize over spatial axes per sample."""

    epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # keras 'random_uniform' initializer semantics: U(-0.05, 0.05)
        # (the reference passes the string name, modelsTF.py:326-327).
        def init(key, shape, dtype=jnp.float32):
            import jax
            return jax.random.uniform(key, shape, dtype, -0.05, 0.05)

        gamma = self.param("gamma", init, (c,), jnp.float32)
        beta = self.param("beta", init, (c,), jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mu) * lax.rsqrt(var + self.epsilon)
        return y * gamma.astype(y.dtype) + beta.astype(y.dtype)
