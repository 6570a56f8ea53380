from probav_tpu.models.wdsr import (
    WDSRConv3D,
    IWDSRConv3D,
    FuseNetConv2D,
    build_model,
    input_shape,
    reduction_schedule,
)
from probav_tpu.models.layers import WNConv, InstanceNorm, mish

__all__ = [
    "WDSRConv3D", "IWDSRConv3D", "FuseNetConv2D",
    "build_model", "input_shape", "reduction_schedule",
    "WNConv", "InstanceNorm", "mish",
]
