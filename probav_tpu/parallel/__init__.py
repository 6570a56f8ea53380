from probav_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    state_shardings,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "param_shardings", "state_shardings",
]
