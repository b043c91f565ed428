"""TPU-native op layer: selective SSM scan, causal conv1d, fused mamba inner.

Replaces the reference's CUDA extensions
(``mamba/csrc/selective_scan/``, ``causal-conv1d/csrc/``) with Pallas TPU
kernels and XLA-fused jnp compositions.
"""

from segmamba_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_ref,
    selective_scan_chunked,
)
from segmamba_tpu.ops.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_directional,
    causal_conv1d_update,
)
from segmamba_tpu.ops.mamba_inner import mamba_inner
from segmamba_tpu.ops.scan_pallas import selective_scan_pallas
from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused
from segmamba_tpu.ops.scan_pallas_dir import (
    mamba_scan_fused_dir,
    mamba_scan_fused_slice,
)
from segmamba_tpu.ops.scan_sharded import (
    mamba_inner_sharded,
    selective_scan_sharded,
)
from segmamba_tpu.ops.selective_state_update import selective_state_update
from segmamba_tpu.ops.fused_norm import layer_norm_fn, rms_norm_fn

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_chunked",
    "selective_scan_pallas",
    "selective_scan_sharded",
    "selective_state_update",
    "causal_conv1d",
    "causal_conv1d_directional",
    "causal_conv1d_update",
    "mamba_inner",
    "mamba_inner_sharded",
    "mamba_scan_fused",
    "mamba_scan_fused_dir",
    "mamba_scan_fused_slice",
    "layer_norm_fn",
    "rms_norm_fn",
]
