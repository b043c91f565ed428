"""SDM/edge auxiliary-target dataset (reference dataset_sdm_edge.py)."""

import os
import pickle

import numpy as np
import pytest

from segmamba_tpu.data.sdm_edge import (
    SdmEdgeDataset,
    compute_sdf,
    convert_labels_regions,
    edge_map,
    precompute_sdm,
    sdm_target,
)


def _ball_labels(shape=(20, 20, 20), center=(10, 10, 10), r=(6, 4, 2)):
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    d = np.sqrt((zz - center[0]) ** 2 + (yy - center[1]) ** 2
                + (xx - center[2]) ** 2)
    lab = np.zeros(shape, np.int32)
    lab[d < r[0]] = 2
    lab[d < r[1]] = 1
    lab[d < r[2]] = 3
    return lab


def test_convert_labels_regions():
    lab = np.array([[[0, 1, 2, 3]]])
    tc, wt, et = convert_labels_regions(lab)
    np.testing.assert_array_equal(tc[0, 0], [0, 1, 0, 1])
    np.testing.assert_array_equal(wt[0, 0], [0, 1, 1, 1])
    np.testing.assert_array_equal(et[0, 0], [0, 0, 0, 1])


def test_edge_map_is_boundary_shell():
    m = np.zeros((10, 10, 10), np.float32)
    m[3:7, 3:7, 3:7] = 1
    e = edge_map(m)
    assert e[3, 3, 3] == 1          # corner is boundary
    assert e[5, 5, 5] == 0          # deep interior eroded away
    assert e[0, 0, 0] == 0          # background untouched
    # a 4^3 cube has 4^3 - 2^3 = 56 shell voxels
    assert e.sum() == 56


def test_compute_sdf_range_and_sign():
    lab = _ball_labels()
    mask = (lab > 0)[None, None]
    sdf = compute_sdf(mask)
    assert sdf.shape == mask.shape
    # normalized: -1 at deepest inside, +1 at farthest outside, 0 on boundary
    assert sdf.min() == pytest.approx(-1.0)
    assert sdf.max() == pytest.approx(1.0)
    assert sdf[0, 0, 10, 10, 10] < 0     # center is inside
    assert sdf[0, 0, 0, 0, 0] > 0        # corner is outside
    # empty channel stays all-zero
    empty = compute_sdf(np.zeros((1, 1, 8, 8, 8)))
    assert (empty == 0).all()


def test_sdm_target_shape_and_recipe():
    lab = _ball_labels()
    t = sdm_target(lab)
    assert t.shape == (3, *lab.shape)
    # recipe: 1 - sdf + edge -> interior ~ 1 - (negative) > 1, far outside ~ 0
    assert t[1, 10, 10, 10] > 1.0
    assert t[1, 0, 0, 0] == pytest.approx(0.0, abs=1e-5)


def test_sdm_edge_dataset_appends_channels(tmp_path):
    lab = _ball_labels()
    img = np.random.default_rng(0).standard_normal((2, *lab.shape)) \
        .astype(np.float32)
    base = str(tmp_path)
    np.savez(os.path.join(base, "case_000.npz"), data=img,
             seg=lab[None].astype(np.float32))
    np.save(os.path.join(base, "case_000.npy"), img)
    np.save(os.path.join(base, "case_000_seg.npy"),
            lab[None].astype(np.float32))
    with open(os.path.join(base, "case_000.pkl"), "wb") as f:
        pickle.dump({"name": "case_000"}, f)

    paths = [os.path.join(base, "case_000.npz")]
    sdm_dir = os.path.join(base, "train_sdm")
    written = precompute_sdm(paths, sdm_dir)
    assert written == [os.path.join(sdm_dir, "case_000_seg_sdm.npy")]

    ds = SdmEdgeDataset(paths, sdm_dir)
    item = ds[0]
    # seg (1 ch) + sdm (3 region channels)
    assert item["seg"].shape == (4, *lab.shape)
    np.testing.assert_allclose(item["seg"][1:], sdm_target(lab), atol=1e-6)
    assert item["data"].shape == img.shape
