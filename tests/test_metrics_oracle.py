"""Surface-metric oracle pinning (VERDICT r2 item 7).

The reference computes HD/HD95/ASD/ASSD through medpy
(/root/reference/light_training/evaluation/metric.py:332-385). medpy is not
installable here, so these tests pin our EDT implementation to HAND-COMPUTED
values that follow medpy.metric.binary's exact definitions:

- ``__surface_distances``: border = mask ^ binary_erosion(mask, conn-1
  footprint); distances = EDT of ~reference_border (with ``sampling`` =
  voxelspacing) sampled at the test border.
- ``hd``    = max(d1.max(), d2.max())
- ``hd95``  = percentile(hstack(d1, d2), 95)       (pooled, not per-direction)
- ``asd``   = d1.mean()
- ``assd``  = (d1.mean() + d2.mean()) / 2          (mean of means, unweighted)
"""

import numpy as np
import pytest

from segmamba_tpu.metrics import (
    avg_surface_distance,
    avg_surface_distance_symmetric,
    hausdorff_distance,
    hausdorff_distance_95,
)


def _vox(shape, coords):
    m = np.zeros(shape, bool)
    for c in coords:
        m[c] = True
    return m


def test_single_voxel_pair_anisotropic():
    # one voxel each, 2 apart along z with spacing 3 => all distances = 6
    shape = (3, 3, 3)
    t = _vox(shape, [(0, 1, 1)])
    r = _vox(shape, [(2, 1, 1)])
    sp = (3.0, 1.0, 1.0)
    assert hausdorff_distance(t, r, voxel_spacing=sp) == pytest.approx(6.0)
    assert hausdorff_distance_95(t, r, voxel_spacing=sp) == pytest.approx(6.0)
    assert avg_surface_distance(t, r, voxel_spacing=sp) == pytest.approx(6.0)
    assert avg_surface_distance_symmetric(
        t, r, voxel_spacing=sp) == pytest.approx(6.0)
    # same masks with isotropic spacing: plain euclidean voxel distance
    assert hausdorff_distance(t, r) == pytest.approx(2.0)


def test_asymmetric_counts_pin_pooling_rules():
    # test = 2 voxels, ref = 1 voxel (isotropic):
    #   d(test->ref) = [0, 1], d(ref->test) = [0]
    shape = (3, 3, 4)
    t = _vox(shape, [(1, 1, 0), (1, 1, 1)])
    r = _vox(shape, [(1, 1, 0)])
    assert hausdorff_distance(t, r) == pytest.approx(1.0)
    # medpy hd95 pools BEFORE the percentile: percentile([0,1,0], 95) = 0.9
    # (per-direction max-of-percentiles would give 0.95)
    assert hausdorff_distance_95(t, r) == pytest.approx(0.9)
    # medpy assd averages the two directional MEANS: (0.5 + 0)/2 = 0.25
    # (pooled mean would give 1/3)
    assert avg_surface_distance_symmetric(t, r) == pytest.approx(0.25)
    assert avg_surface_distance(t, r) == pytest.approx(0.5)
    # asd is directional
    assert avg_surface_distance(r, t) == pytest.approx(0.0)


def test_cube_vs_shifted_cube_spacing_scales_linearly():
    shape = (12, 12, 12)
    a = np.zeros(shape, bool)
    b = np.zeros(shape, bool)
    a[2:6, 2:6, 2:6] = True
    b[2:6, 2:6, 4:8] = True
    d1 = hausdorff_distance_95(a, b, voxel_spacing=(1.0, 1.0, 1.0))
    d2 = hausdorff_distance_95(a, b, voxel_spacing=(1.0, 1.0, 2.5))
    assert d2 == pytest.approx(2.5 * d1)
    s1 = avg_surface_distance_symmetric(a, b)
    s2 = avg_surface_distance_symmetric(a, b, voxel_spacing=(2.0, 2.0, 2.0))
    assert s2 == pytest.approx(2.0 * s1)
    # symmetric metrics are symmetric in their arguments
    assert avg_surface_distance_symmetric(a, b) == pytest.approx(
        avg_surface_distance_symmetric(b, a))
    assert hausdorff_distance_95(a, b) == pytest.approx(
        hausdorff_distance_95(b, a))


def test_hollow_mask_interior_not_surface():
    # a 5^3 cube: border voxels = everything but the 3^3 interior. A 1-voxel
    # dilation of it has its surface 1 away from the cube surface everywhere
    # except corners (sqrt(3) voxel diag) — pins the erosion-based border
    # extraction (connectivity-1 footprint).
    shape = (9, 9, 9)
    a = np.zeros(shape, bool)
    a[2:7, 2:7, 2:7] = True
    d = hausdorff_distance(a, a)
    assert d == pytest.approx(0.0)
    inner = np.zeros(shape, bool)
    inner[3:6, 3:6, 3:6] = True
    # surfaces are 1 voxel apart face-to-face, sqrt(3) corner-to-corner
    assert hausdorff_distance(a, inner) == pytest.approx(np.sqrt(3.0))
    assert avg_surface_distance(inner, a) == pytest.approx(1.0, abs=0.35)


def test_degenerate_masks_nan():
    shape = (4, 4, 4)
    full = np.ones(shape, bool)
    empty = np.zeros(shape, bool)
    some = _vox(shape, [(1, 1, 1)])
    for bad in (full, empty):
        assert np.isnan(hausdorff_distance_95(bad, some))
        assert np.isnan(hausdorff_distance_95(some, bad))
        assert np.isnan(avg_surface_distance_symmetric(some, bad))
    assert hausdorff_distance_95(
        some, empty, nan_for_nonexisting=False) == 0.0
