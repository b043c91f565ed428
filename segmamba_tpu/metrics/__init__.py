"""Segmentation metrics (pure numpy/scipy, medpy-free)."""

from segmamba_tpu.metrics.metrics import (
    ALL_METRICS,
    dice,
    hausdorff_distance,
    hausdorff_distance_95,
    avg_surface_distance,
    avg_surface_distance_symmetric,
)

__all__ = [
    "ALL_METRICS",
    "dice",
    "hausdorff_distance",
    "hausdorff_distance_95",
    "avg_surface_distance",
    "avg_surface_distance_symmetric",
]
