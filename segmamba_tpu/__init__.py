"""segmamba_tpu — a TPU-native 3D medical image segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the SegMamba
reference system (tri-oriented Mamba encoder + UNETR-style decoder +
nnU-Net-style preprocessing/training/inference), designed TPU-first:

- ``ops``      — selective SSM scan (Pallas kernel + XLA fallbacks),
                 causal depthwise conv1d, fused mamba inner op.
- ``models``   — flax modules: Mamba (tri-oriented v3), GSC, MambaEncoder,
                 UNETR blocks, the full SegMamba model.
- ``data``     — NIfTI IO, offline preprocessing (crop/normalize/resample),
                 patch sampling, augmentation, host data pipeline.
- ``train``    — pjit data-parallel trainer, losses, LR schedules,
                 orbax checkpointing, metric logging.
- ``infer``    — jitted sliding-window inference with gaussian blending,
                 mirror TTA, inverse resample/crop, NIfTI export.
- ``metrics``  — Dice / HD95 / surface distances (pure numpy/scipy).
- ``parallel`` — device mesh + sharding helpers (DP today, SP-ready).

Canonical array layouts (TPU-first, unlike the torch reference):
- sequences are time-major ``(batch, seqlen, dim)``
- volumes are channels-last ``(batch, D, H, W, C)``
"""

__version__ = "0.1.0"
