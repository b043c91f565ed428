"""Model layer: flax modules for the SegMamba family.

Channels-last volumes ``(batch, D, H, W, C)`` (TPU-native conv layout);
sequences time-major ``(batch, L, dim)``.
"""

from segmamba_tpu.models.mamba import MambaV3
from segmamba_tpu.models.segmamba import (
    GSC,
    MambaEncoder,
    MambaLayer,
    MlpChannel,
    SegMamba,
)
from segmamba_tpu.models.unetr_blocks import (
    UnetOutBlock,
    UnetResBlock,
    UnetrBasicBlock,
    UnetrUpBlock,
)

__all__ = [
    "MambaV3",
    "GSC",
    "MambaEncoder",
    "MambaLayer",
    "MlpChannel",
    "SegMamba",
    "UnetOutBlock",
    "UnetResBlock",
    "UnetrBasicBlock",
    "UnetrUpBlock",
]
