"""nnU-Net experiment-planning heuristics (data/planning.py) vs the
reference's semantics (default_preprocessor.py:59-134, 304-451)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from segmamba_tpu.data.nifti import write_nifti
from segmamba_tpu.data.planning import (
    build_plan,
    collect_foreground_intensities,
    ct_norm_params_from_plan,
    determine_fullres_target_spacing,
    get_pool_and_conv_props,
    initial_patch_size,
    load_plan,
    pad_shape,
)
from segmamba_tpu.data.preprocessing import MultiModalityPreprocessor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pool_props_isotropic():
    # BraTS-like: 1mm^3 isotropic, seed patch 256^3 -> pool every axis until
    # the bottleneck edge would drop below min_feature_map_size=4
    num_pool, pools, convs, patch, must = get_pool_and_conv_props(
        (1.0, 1.0, 1.0), [256, 256, 256], 4, 999999)
    assert num_pool == [6, 6, 6]        # 256 -> 4
    assert must == [64, 64, 64]
    assert patch == [256, 256, 256]
    assert pools[0] == [1, 1, 1] and all(p == [2, 2, 2] for p in pools[1:])
    assert all(c == [3, 3, 3] for c in convs)
    assert len(convs) == len(pools)     # one conv stage per pool + bottleneck


def test_pool_props_anisotropic_axis_lags():
    # 5mm z spacing: z must not be pooled until in-plane spacing catches up,
    # and the z conv kernel starts at 1
    num_pool, pools, convs, patch, must = get_pool_and_conv_props(
        (5.0, 1.0, 1.0), [40, 192, 192], 4, 999999)
    assert num_pool[0] < num_pool[1] == num_pool[2]
    assert pools[1] == [1, 2, 2]         # first pool skips the coarse axis
    assert convs[0][0] == 1              # z kernel 1 while spacing is coarse
    assert convs[-1] == [3, 3, 3]        # bottleneck always 3^3
    assert patch[0] % must[0] == 0 and patch[1] % must[1] == 0


def test_pad_shape_rounds_up_only_when_needed():
    assert pad_shape([128, 130, 64], [64, 64, 64]) == [128, 192, 64]


def test_target_spacing_median_and_aniso_correction():
    # isotropic-ish: plain median
    sp = [(1.0, 1.0, 1.0), (1.2, 1.0, 1.0), (0.8, 1.0, 1.0)]
    sz = [(100, 100, 100)] * 3
    assert np.allclose(determine_fullres_target_spacing(sp, sz), [1, 1, 1])
    # strongly anisotropic low-res axis with few voxels: 10th-pct correction
    sp = [(6.0, 1.0, 1.0)] * 8 + [(2.0, 1.0, 1.0)] * 2
    sz = [(20, 200, 200)] * 10
    t = determine_fullres_target_spacing(sp, sz)
    assert t[0] < 6.0 and t[1] == 1.0    # corrected downward from the median


def test_initial_patch_size_voxel_budget():
    p = initial_patch_size([1.0, 1.0, 1.0])
    assert p == [256, 256, 256]
    p = initial_patch_size([4.0, 1.0, 1.0])  # coarse z -> fewer z voxels
    assert p[0] * 4 == pytest.approx(p[1], rel=0.02)
    assert np.prod(p) == pytest.approx(256 ** 3, rel=0.05)


def test_collect_foreground_intensities_seeded():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 10, 10, 10)).astype(np.float32)
    seg = np.zeros((1, 10, 10, 10), np.float32)
    seg[0, 2:5, 2:5, 2:5] = 1
    a = collect_foreground_intensities(seg, img)
    b = collect_foreground_intensities(seg, img)
    assert len(a) == 2 and len(a[0]) == 10000
    np.testing.assert_array_equal(a[0], b[0])      # seeded -> reproducible
    fg = img[0][seg[0] > 0]
    assert set(np.unique(a[0])) <= set(np.unique(fg))


def test_build_plan_stats_and_ct_params():
    rng = np.random.default_rng(1)
    spacings = [(1.0, 1.0, 1.0)] * 4
    shapes = [(100, 120, 110)] * 4
    fg = [[rng.normal(50, 10, 1000), rng.normal(-3, 1, 1000)]
          for _ in range(4)]
    plan = build_plan(spacings, shapes, fg)
    s0 = plan["intensity_statistics_per_channel"]["0"]
    assert s0["percentile_00_5"] < s0["median"] < s0["percentile_99_5"]
    assert abs(s0["mean"] - 50) < 2
    ct = ct_norm_params_from_plan(plan)
    assert ct["a_min"] == s0["percentile_00_5"]
    assert plan["patch_size"] == [256, 256, 256]
    assert plan["num_pool_per_axis"] == [6, 6, 6]


def _make_aniso_raw(tmp_path, n_cases=3, shape=(12, 40, 44)):
    base = tmp_path / "raw"
    rng = np.random.default_rng(0)
    for i in range(n_cases):
        case = base / "images" / f"case_{i:03d}"
        os.makedirs(case)
        z, y, x = shape
        vol = np.zeros(shape, np.float32)
        vol[1:z - 1, 3:y - 3, 3:x - 3] = \
            rng.standard_normal((z - 2, y - 6, x - 6)) + 10
        write_nifti(case / "t1.nii.gz", vol, spacing=(1.0, 1.0, 5.0))
        seg = np.zeros(shape, np.float32)
        seg[4:8, 9:20, 10:22] = 1
        write_nifti(case / "seg.nii.gz", seg, spacing=(1.0, 1.0, 5.0))
    return str(base)


def test_plan_to_train_flow(tmp_path):
    """2_preprocessing_mri.py --plan-only on a synthetic anisotropic dataset,
    then 3_train.py --plan consumes the patch size (VERDICT r2 item 5)."""
    base = _make_aniso_raw(tmp_path)
    out = tmp_path / "out"
    out.mkdir()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "2_preprocessing_mri.py"),
         "--base-dir", base, "--image-dir", "images", "--output-dir",
         str(out), "--plan-only", "--data-filenames", "t1.nii.gz",
         "--labels", "1"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr
    plan_path = out / "data_analysis_result.json"
    plan = load_plan(plan_path)
    # anisotropic spacing must show up in the plan and skew the patch
    assert plan["fullres_spacing"][0] > 2.0
    assert plan["patch_size"][0] < plan["patch_size"][1]
    assert "percentile_99_5" in plan["intensity_statistics_per_channel"]["0"]

    # plan -> train: 3_train adopts the plan's patch size (and scales
    # num_slices with it)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "3_train.py"),
         "--plan", str(plan_path), "--data-dir", str(out), "--cpu",
         "--print-config", "--logdir", str(tmp_path / "logs")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "plan patch_size" in r.stdout
    cfg = json.loads(r.stdout.strip().splitlines()[-1])
    assert cfg["patch"][0] < cfg["patch"][1]          # anisotropy respected
    assert all(p % 32 == 0 for p in cfg["patch"])
    assert cfg["num_slices"][0] == cfg["patch"][0] // 2
