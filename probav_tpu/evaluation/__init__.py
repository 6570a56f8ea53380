from probav_tpu.evaluation.compare import (
    per_scene_cpsnr,
    compare_runs,
    scatter_plot,
    load_norm_csv,
    normalized_score,
)

__all__ = [
    "per_scene_cpsnr", "compare_runs", "scatter_plot",
    "load_norm_csv", "normalized_score",
]
