"""Device mesh and sharding layout for multi-chip training.

TPU-native replacement for the reference's experimental
tf.distribute.MirroredStrategy data parallelism (debug/trainMultiGPU.py:65-68,
debug/trainClassMultiGPU*.py): instead of replica fan-out + NCCL reduce, we
lay a 2D ``jax.sharding.Mesh`` over the chips with axes

- ``data``  — batch dimension sharding (pure DP; gradient all-reduce rides
  ICI, inserted automatically by the SPMD partitioner because parameters are
  replicated along this axis), and
- ``model`` — tensor parallelism for the wide WDSR-B blocks: the expand
  conv's output channels and the decay conv's input channels are sharded so
  the (C -> 8C -> 0.8C) channel bottleneck splits across chips; XLA inserts
  the reduce-scatter/all-gather pair on the block boundary.

Everything is jit + NamedSharding; no hand-written collectives are needed for
this model family (conv nets, no attention).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = max(1, len(devices) // num_model)
    need = num_data * num_model
    if need > len(devices):
        raise ValueError(
            f"mesh {num_data}x{num_model} needs {need} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:need], dtype=object).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, leaf) -> P:
    """Tensor-parallel layout rules for WDSR-B parameters.

    The block's expand conv shards output channels (last axis) over 'model';
    the decay conv shards input channels (second-to-last) so the
    expand->decay pair contracts over the sharded axis (one collective per
    block).  Vector params (g, bias) of the expand conv shard with their
    channel.  Param paths follow models/wdsr.py::WDSRBlock naming
    (resBlock_i/expand, resBlock_i/decay).
    """
    nd = getattr(leaf, "ndim", 0)
    if "expand" in path:
        if nd >= 2:   # kernel_v
            return P(*([None] * (nd - 1) + ["model"]))
        return P("model")  # wn_g / bias follow output channels
    if "decay" in path and nd >= 2:
        return P(*([None] * (nd - 2) + ["model", None]))
    return P()


def param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding pytree for a model's parameters on this mesh."""

    def one(path, leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _spec_for_param(keys, leaf) if (
            tensor_parallel and mesh.shape.get("model", 1) > 1) else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def state_shardings(state: Any, mesh: Mesh, tensor_parallel: bool = True):
    """Shardings for a full TrainState: params + matching opt-state layout.

    Optimizer moments mirror their parameter's sharding (optax state trees
    contain arrays shaped like params plus scalar counters, which replicate).
    """

    def one(path, leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        nd = getattr(leaf, "ndim", 0)
        if nd == 0:
            return NamedSharding(mesh, P())
        spec = _spec_for_param(keys, leaf) if (
            tensor_parallel and mesh.shape.get("model", 1) > 1) else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)
