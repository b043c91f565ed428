"""Inference subsystem: jitted sliding-window, mirror TTA, inverse
preprocessing, NIfTI export."""

from segmamba_tpu.infer.sliding_window import (
    SlidingWindowInferer,
    sliding_window_inference,
)
from segmamba_tpu.infer.predictor import Predictor

__all__ = ["SlidingWindowInferer", "sliding_window_inference", "Predictor"]
