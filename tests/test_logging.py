"""MetricLogger scalar/image logging + seg overlay rendering."""

import json
import os

import numpy as np

from segmamba_tpu.utils import MetricLogger, log_image, seg_overlay


def test_scalar_jsonl(tmp_path):
    lg = MetricLogger(str(tmp_path), enable_tensorboard=False)
    lg.log("loss", 0.5, 1)
    lg.log("loss", 0.25, 2)
    lg.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert [l["value"] for l in lines] == [0.5, 0.25]
    assert [l["step"] for l in lines] == [1, 2]


def test_log_image_naming(tmp_path):
    img = np.zeros((8, 8), np.uint8)
    log_image(str(tmp_path), "val", {"case0": img}, global_step=7,
              current_epoch=2)
    expect = tmp_path / "images" / "val" / "case0_gs-000007_e-000002.png"
    assert expect.exists()
    lg = MetricLogger(str(tmp_path), enable_tensorboard=False)
    lg.log_image("train", {"overlay": np.zeros((4, 4, 3), np.uint8)}, 1)
    lg.close()
    assert (tmp_path / "images" / "train"
            / "overlay_gs-000001_e-000000.png").exists()


def test_seg_overlay_colors_classes():
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((6, 10, 10)).astype(np.float32)
    seg = np.zeros((6, 10, 10), np.int32)
    seg[3, 2:5, 2:5] = 1
    seg[3, 6:9, 6:9] = 3
    out = seg_overlay(vol, seg, axis=0, index=3)
    assert out.shape == (10, 10, 3) and out.dtype == np.uint8
    # class regions are tinted (channels differ), background stays gray
    assert not np.all(out[3, 3, 0] == out[3, 3, 1])
    bg = out[0, 0]
    assert bg[0] == bg[1] == bg[2]
