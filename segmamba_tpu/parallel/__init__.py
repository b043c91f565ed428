"""Device mesh + sharding helpers.

Replaces the reference's NCCL/torchrun distributed layer
(/root/reference/light_training/trainer.py:90-107, launch.py:69-117) with
single-program pjit over a named mesh: the data axis rides ICI, gradient
mean is inserted by XLA from the sharding annotations — no launcher, no
process groups, no explicit collectives.
"""

from segmamba_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from segmamba_tpu.parallel.pp import pipeline_lm_logits, stack_block_params
from segmamba_tpu.parallel.tp import tp_shard, tp_specs

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "tp_shard", "tp_specs", "pipeline_lm_logits",
           "stack_block_params"]
