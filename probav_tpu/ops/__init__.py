from probav_tpu.ops.shift_loss import ShiftCompensatedLosses
from probav_tpu.ops.sobel import sobel_edges
from probav_tpu.ops.patches import (
    extract_patches,
    extract_patches_np,
    reconstruct_from_patches,
)
from probav_tpu.ops.registration import (
    phase_correlation_shift,
    register_frame,
    register_image_set,
)

__all__ = [
    "ShiftCompensatedLosses",
    "sobel_edges",
    "extract_patches",
    "extract_patches_np",
    "reconstruct_from_patches",
    "phase_correlation_shift",
    "register_frame",
    "register_image_set",
]
