"""Native (C++/OpenMP) host kernels with transparent scipy fallback.

``affine_transform_3d`` and ``crop_pad`` accelerate the augmentation/patch
hot path of the data loader. If the toolchain is unavailable the pure
scipy/numpy implementations are used; correctness is identical for order 0/1
and equivalent-in-distribution for order 3 (Catmull-Rom vs spline — both are
C1 cubic interpolants; this path only feeds stochastic augmentation).
"""

from __future__ import annotations

import os

import numpy as np

_native = None
if os.environ.get("SEGMAMBA_DISABLE_NATIVE") != "1":
    try:
        from segmamba_tpu.native.build import build as _build

        _build()
        from segmamba_tpu.native import _augment_native as _native  # type: ignore
    except Exception:
        _native = None

NATIVE_AVAILABLE = _native is not None


def affine_transform_3d(volume, matrix, offset, order=1, cval=0.0):
    """out[o] = in[matrix @ o + offset]; scipy.affine_transform convention."""
    if _native is not None:
        return _native.affine_transform_3d(
            np.ascontiguousarray(volume, np.float32),
            np.ascontiguousarray(matrix, np.float64),
            np.ascontiguousarray(offset, np.float64), int(order), float(cval))
    from scipy import ndimage
    return ndimage.affine_transform(
        np.asarray(volume, np.float32), matrix, offset=offset, order=order,
        mode="constant", cval=cval).astype(np.float32)


def crop_pad(data, lb, patch, cval=0.0):
    """Extract ``patch`` starting at (possibly negative) ``lb`` from
    (C, Z, Y, X), padding out-of-range with ``cval``."""
    if _native is not None:
        return _native.crop_pad(
            np.ascontiguousarray(data, np.float32),
            tuple(int(v) for v in lb), tuple(int(v) for v in patch),
            float(cval))
    data = np.asarray(data, np.float32)
    shape = data.shape[1:]
    ub = [lb[i] + patch[i] for i in range(3)]
    vlb = [max(0, lb[i]) for i in range(3)]
    vub = [min(shape[i], ub[i]) for i in range(3)]
    sl = (slice(None),) + tuple(slice(a, b) for a, b in zip(vlb, vub))
    cut = data[sl]
    padding = [(vlb[i] - lb[i], ub[i] - vub[i]) for i in range(3)]
    return np.pad(cut, ((0, 0), *padding), constant_values=cval)
