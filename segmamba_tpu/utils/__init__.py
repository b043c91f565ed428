"""Utilities: logging, determinism, profiling, checkpoint conversion."""

from segmamba_tpu.utils.logging import MetricLogger, log_image, seg_overlay
from segmamba_tpu.utils.misc import set_determinism
from segmamba_tpu.utils.profiling import StepTimer, trace_context
from segmamba_tpu.utils.torch_convert import (
    convert_segmamba_state_dict,
    load_torch_checkpoint,
)

__all__ = ["MetricLogger", "log_image", "seg_overlay", "set_determinism",
           "StepTimer", "trace_context", "convert_segmamba_state_dict",
           "load_torch_checkpoint"]
