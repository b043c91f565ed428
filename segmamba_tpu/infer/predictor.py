"""Predictor: mirror-TTA sliding-window prediction + inverse preprocessing.

Rebuilds /root/reference/light_training/prediction.py:
- ``maybe_mirror_and_predict`` — sliding-window prediction averaged over the
  8 spatial flip combinations (:110-159)
- ``predict_raw_probability``  — linear resample of the logits back to the
  pre-resample shape (:35-63)
- ``predict_noncrop_probability`` — paste into the pre-crop volume at the
  stored bbox (:66-108)
- ``save_to_nii`` (+ optional largest-connected-component postprocessing,
  :17-27, :208-226)

Volumes are channels-last ``(1, Z, Y, X, C)`` on device; the inverse steps
run on host numpy (they are IO-bound, per-case, and shape-dynamic).
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from segmamba_tpu.data.nifti import write_nifti
from segmamba_tpu.infer.sliding_window import SlidingWindowInferer


class Predictor:
    def __init__(self, window_infer: SlidingWindowInferer, mirror_axes=(0, 1, 2),
                 predictor_args=None):
        self.window_infer = window_infer
        self.mirror_axes = tuple(mirror_axes) if mirror_axes else ()
        # model params should ride here (as jit arguments), not inside
        # predictor_fn closures — see sliding_window._sliding_window_jit
        self.predictor_args = predictor_args

    def maybe_mirror_and_predict(self, x, predictor_fn, num_classes=None):
        """x: (1, Z, Y, X, C). Returns averaged logits (1, Z, Y, X, K).

        Flip combinations follow prediction.py:125-155 (all subsets of the
        three spatial axes, averaged)."""
        spatial_axes = (1, 2, 3)  # of the (1, Z, Y, X, C) layout
        pred = self.window_infer(x, predictor_fn, num_classes=num_classes,
                                 predictor_args=self.predictor_args)
        n = 1
        for r in range(1, len(self.mirror_axes) + 1):
            for combo in itertools.combinations(self.mirror_axes, r):
                axes = tuple(spatial_axes[a] for a in combo)
                flipped = jnp.flip(x, axis=axes)
                out = self.window_infer(flipped, predictor_fn,
                                        num_classes=num_classes,
                                        predictor_args=self.predictor_args)
                pred = pred + jnp.flip(out, axis=axes)
                n += 1
        return pred / n

    @staticmethod
    def predict_raw_probability(logits, properties):
        """(1, Z, Y, X, K) or (Z, Y, X, K) -> (K, z0, y0, x0) numpy, linearly
        resampled to shape_after_cropping_before_resample (prediction.py:35-63;
        torch trilinear ~ order-1 spline)."""
        arr = np.asarray(logits, np.float32)
        if arr.ndim == 5:
            arr = arr[0]
        arr = np.moveaxis(arr, -1, 0)  # (K, Z, Y, X)
        target = tuple(int(s) for s in
                       properties["shape_after_cropping_before_resample"])
        if arr.shape[1:] == target:
            return arr
        zoom = [t / s for t, s in zip(target, arr.shape[1:])]
        out = np.stack([
            ndimage.zoom(arr[c], zoom, order=1, mode="nearest",
                         grid_mode=True)
            for c in range(arr.shape[0])], axis=0)
        return out.astype(np.float32)

    @staticmethod
    def predict_noncrop_probability(pred, properties, fill=0.0):
        """Paste (K or 1, z, y, x) into the pre-crop volume at the stored
        bbox (prediction.py:66-108)."""
        pred = np.asarray(pred)
        full_shape = tuple(int(s) for s in properties["shape_before_cropping"])
        bbox = properties["bbox_used_for_cropping"]
        out = np.full((pred.shape[0],) + full_shape, fill, pred.dtype)
        sl = tuple(slice(b[0], b[1]) for b in bbox)
        out[(slice(None),) + sl] = pred
        return out

    @staticmethod
    def largest_connected_component(seg_binary):
        """Keep only the largest CC (prediction.py large_connected_domain:17-27)."""
        labeled, n = ndimage.label(seg_binary)
        if n <= 1:
            return seg_binary
        sizes = ndimage.sum_labels(np.ones_like(labeled), labeled,
                                   index=np.arange(1, n + 1))
        keep = 1 + int(np.argmax(sizes))
        return (labeled == keep).astype(seg_binary.dtype)

    @staticmethod
    def save_to_nii(seg, properties, output_dir, name=None, spacing=None,
                    postprocess_largest_cc=False):
        """Write (z, y, x) labels to <output_dir>/<name>.nii.gz
        (prediction.py:208-226)."""
        seg = np.asarray(seg)
        if seg.ndim == 4 and seg.shape[0] == 1:
            seg = seg[0]
        if postprocess_largest_cc:
            seg = Predictor.largest_connected_component(seg)
        name = name or properties.get("name", "prediction")
        spacing = spacing or tuple(properties.get("spacing", (1.0, 1.0, 1.0)))
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, f"{name}.nii.gz")
        write_nifti(path, seg.astype(np.uint8), spacing=spacing)
        return path
