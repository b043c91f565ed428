"""Metric logging: TensorBoard (when available) + JSONL, reference-compatible.

The reference logs scalars through a rank-0 TensorBoard SummaryWriter
(/root/reference/light_training/trainer.py:343-350,494-501). Here the same
``log(key, value, step)`` surface writes TensorBoard events via tensorboardX
when present and always appends machine-readable JSONL (``metrics.jsonl``).
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, logdir, enable_tensorboard=True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(logdir=logdir)
            except Exception:
                self._tb = None

    def log(self, key, value, step):
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(key, value, step)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "key": key, "value": value, "step": int(step)})
            + "\n")
        self._jsonl.flush()

    def log_image(self, split, images, step, epoch=0):
        """Write named uint8 arrays as PNGs under ``logdir/images/<split>/``
        (reference surface: light_training/utils/log_image.py)."""
        log_image(self.logdir, split, images, step, epoch)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()


def log_image(save_dir, split, images, global_step, current_epoch=0):
    """Save a dict of named (H, W[, 3]) uint8 arrays as PNGs, one file per
    key, named ``<key>_gs-NNNNNN_e-NNNNNN.png`` — same layout and naming as
    the reference's ``log_image`` (light_training/utils/log_image.py)."""
    from PIL import Image

    root = os.path.join(save_dir, "images", split)
    os.makedirs(root, exist_ok=True)
    for k, arr in images.items():
        name = f"{k}_gs-{int(global_step):06d}_e-{int(current_epoch):06d}.png"
        Image.fromarray(arr).save(os.path.join(root, name))


# distinct hues for seg classes 1..6 (class 0 = background stays underlay)
_OVERLAY_COLORS = ((220, 60, 60), (60, 200, 80), (70, 110, 240),
                   (235, 200, 60), (200, 80, 220), (80, 220, 220))


def seg_overlay(volume, seg, axis=0, index=None, alpha=0.45):
    """Mid-slice RGB overlay of a label map on a scalar volume — the image
    the reference logs during validation. ``volume``/``seg`` are (Z, Y, X)
    (or any 3-D orientation); returns (H, W, 3) uint8."""
    import numpy as np

    volume = np.asarray(volume)
    seg = np.asarray(seg)
    if index is None:
        index = volume.shape[axis] // 2
    img = np.take(volume, index, axis=axis).astype(np.float32)
    lab = np.take(seg, index, axis=axis).astype(np.int32)
    lo, hi = np.percentile(img, (1.0, 99.0))
    img = np.clip((img - lo) / max(hi - lo, 1e-8), 0.0, 1.0)
    rgb = np.stack([img] * 3, -1)
    for cls in np.unique(lab):
        if cls <= 0:
            continue
        color = np.array(_OVERLAY_COLORS[(int(cls) - 1) % len(_OVERLAY_COLORS)],
                         np.float32) / 255.0
        mask = lab == cls
        rgb[mask] = (1 - alpha) * rgb[mask] + alpha * color
    return (rgb * 255.0 + 0.5).astype("uint8")
