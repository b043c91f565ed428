"""Native C++ host kernels vs scipy/numpy references."""

import numpy as np
import pytest
from scipy import ndimage

import segmamba_tpu.native as native
from segmamba_tpu.native import affine_transform_3d, crop_pad


def test_affine_matches_scipy_order01():
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((24, 26, 28)).astype(np.float32)
    mat = np.eye(3) * 1.13
    off = np.array([-1.5, 2.0, -0.7])
    for order in [0, 1]:
        a = affine_transform_3d(vol, mat, off, order=order)
        b = ndimage.affine_transform(vol, mat, offset=off, order=order,
                                     mode="constant", cval=0.0)
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_affine_order3_reasonable():
    """Catmull-Rom vs scipy spline: same family of C1 cubics, must agree to
    high correlation and exactly at integer-lattice identity."""
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((20, 20, 20)).astype(np.float32)
    ident = affine_transform_3d(vol, np.eye(3), np.zeros(3), order=3)
    np.testing.assert_allclose(ident, vol, atol=1e-5)
    a = affine_transform_3d(vol, np.eye(3) * 1.07, np.full(3, -0.7), order=3)
    b = ndimage.affine_transform(vol, np.eye(3) * 1.07, offset=np.full(3, -0.7),
                                 order=3, mode="constant", cval=0.0)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.97


def test_crop_pad_matches_numpy():
    rng = np.random.default_rng(2)
    d = rng.standard_normal((3, 20, 22, 24)).astype(np.float32)
    for lb in [(-3, 5, 20), (0, 0, 0), (15, 18, 20), (-8, -8, -8)]:
        a = crop_pad(d, lb, (16, 16, 16), 0.0)
        # numpy reference
        ub = [lb[i] + 16 for i in range(3)]
        vlb = [max(0, lb[i]) for i in range(3)]
        vub = [min(d.shape[1 + i], ub[i]) for i in range(3)]
        sl = (slice(None),) + tuple(slice(x, y) for x, y in zip(vlb, vub))
        cut = d[sl]
        padding = [(vlb[i] - lb[i], ub[i] - vub[i]) for i in range(3)]
        b = np.pad(cut, ((0, 0), *padding), constant_values=0.0)
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not native.NATIVE_AVAILABLE, reason="toolchain missing")
def test_native_built():
    assert native.NATIVE_AVAILABLE
