"""Whole-volume single-shot inference — no sliding window.

The reference bounds per-step sequence length with 128^3 sliding windows
(monai/inferers/utils.py:43); because the selective scan is linear-time, a
TPU can instead process the whole padded volume (~1M tokens for BraTS
240x240x155) in ONE forward pass (SURVEY.md §7.8 stretch goal). The encoder
downsamples 16x, so the volume is padded to multiples of 16 and the
tri-oriented Mamba's slice count is derived from the padded depth at each
stage (at 128^3 this reproduces the reference's fixed [64, 32, 16, 8],
model_segmamba/segmamba.py:154).

The checkpoint is shape-agnostic: ``num_slices_list`` only permutes the scan
order and carries no parameters, so sliding-window and whole-volume modes
share weights.

Measured at the real BraTS shape (155x240x240 -> padded 160x240x240,
1.15M stage-0 tokens) on a single v5e 16GB chip: 6.80 s/case single shot,
bf16, no remat needed (benchmarks/bench_whole_volume.py). The sliding
window is still faster per case on this chip (the padded full volume is
~2.4x the voxels of the windows actually needed and the giant scans are
VPU-bound); the single-shot mode's value is zero window-blending artifacts
and a global receptive field at native resolution.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp


def num_slices_for_shape(spatial_shape, n_stages=4):
    """Per-stage slice counts = depth-axis size after each downsample."""
    d = spatial_shape[0]
    out = []
    for i in range(n_stages):
        d_i = d // (2 ** (i + 1))
        out.append(max(1, d_i))
    return tuple(out)


def pad_to_multiple(volume, multiple=16):
    """Pad (1, Z, Y, X, C) spatially up to a multiple; returns (padded, orig)."""
    _, Z, Y, X, _ = volume.shape
    tgt = [int(math.ceil(s / multiple) * multiple) for s in (Z, Y, X)]
    pads = ((0, 0), (0, tgt[0] - Z), (0, tgt[1] - Y), (0, tgt[2] - X), (0, 0))
    return jnp.pad(volume, pads), (Z, Y, X)


def whole_volume_inference(model, params, volume, multiple=16):
    """Single forward over the whole (1, Z, Y, X, C) volume.

    Returns logits (1, Z, Y, X, K) at the original (unpadded) size.
    """
    padded, (Z, Y, X) = pad_to_multiple(volume, multiple)
    spatial = padded.shape[1:4]
    wv_model = dataclasses.replace(
        model, num_slices_list=num_slices_for_shape(spatial))
    logits = jax.jit(wv_model.apply)(params, padded)
    return logits[:, :Z, :Y, :X]


class WholeVolumePredictor:
    """Predictor-compatible wrapper: same maybe_mirror_and_predict surface
    as infer.Predictor, but one forward per (flipped) volume."""

    def __init__(self, model, params, mirror_axes=(0, 1, 2), multiple=16):
        self.model = model
        self.params = params
        self.mirror_axes = tuple(mirror_axes) if mirror_axes else ()
        self.multiple = multiple

    def __call__(self, x):
        return whole_volume_inference(self.model, self.params, x,
                                      self.multiple)

    def maybe_mirror_and_predict(self, x, predictor_fn=None, num_classes=None):
        import itertools
        spatial_axes = (1, 2, 3)
        pred = self(x)
        n = 1
        for r in range(1, len(self.mirror_axes) + 1):
            for combo in itertools.combinations(self.mirror_axes, r):
                axes = tuple(spatial_axes[a] for a in combo)
                pred = pred + jnp.flip(self(jnp.flip(x, axes)), axes)
                n += 1
        return pred / n
