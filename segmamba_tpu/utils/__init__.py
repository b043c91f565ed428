"""Utilities: logging, determinism, profiling."""

from segmamba_tpu.utils.logging import MetricLogger
from segmamba_tpu.utils.misc import set_determinism
from segmamba_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["MetricLogger", "set_determinism", "StepTimer", "trace_context"]
