"""CLI surface integration: run the numbered scripts as real subprocesses
(tiny model, CPU) over synthetic data: 1_rename -> 2_preprocess -> 3_train
-> 4_predict -> 5_compute_metrics."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(script, *args, timeout=540):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    r = subprocess.run([sys.executable, os.path.join(REPO, script), *args],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=timeout)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    from segmamba_tpu.data import write_nifti

    raw = tmp_path / "raw" / "cases"
    rng = np.random.default_rng(0)
    for i in range(3):
        case = raw / f"BraTS-TST-{i:04d}"
        os.makedirs(case)
        seg = np.zeros((24, 26, 28), np.float32)
        seg[8:16, 9:17, 10:18] = rng.integers(1, 4, (8, 8, 8))
        for m in ["t2w", "t2f", "t1n", "t1c"]:
            vol = np.zeros((24, 26, 28), np.float32)
            vol[2:22, 2:24, 2:26] = rng.standard_normal((20, 22, 24)) + 15
            vol[seg > 0] += 5.0
            # prefixed names for 1_rename to normalize
            write_nifti(case / f"BraTS-TST-{i:04d}-{m}.nii.gz", vol)
        write_nifti(case / f"BraTS-TST-{i:04d}-seg.nii.gz", seg)

    run("1_rename_mri_data.py", str(raw))
    assert os.path.isfile(raw / "BraTS-TST-0000" / "t2w.nii.gz")

    fullres = str(tmp_path / "fullres")
    out = run("2_preprocessing_mri.py", "--base-dir", str(tmp_path / "raw"),
              "--image-dir", "cases", "--output-dir", fullres,
              "--num-processes", "1")
    assert "median_spacing" in out
    assert len([f for f in os.listdir(fullres) if f.endswith(".npz")]) == 3

    logdir = str(tmp_path / "logs")
    tiny = ["--feats", "4", "8", "16", "32", "--depths", "1", "1", "1", "1",
            "--hidden-size", "64", "--num-slices", "8", "4", "2", "1"]
    run("3_train.py", "--cpu", "--data-dir", fullres, "--logdir", logdir,
        "--max-epochs", "1", "--batch-size", "2", "--val-every", "1",
        "--steps-per-epoch", "2", "--val-number", "1",
        "--patch", "16", "16", "16", "--augmentation", "noaug",
        "--num-workers", "0", "--dtype", "float32",
        "--split", "0.4", "0.4", "0.2", *tiny)
    model_dir = os.path.join(logdir, "model")
    assert any(n.startswith("final_model") for n in os.listdir(model_dir))

    pred_dir = str(tmp_path / "preds")
    out = run("4_predict.py", "--cpu", "--data-dir", fullres,
              "--checkpoint", model_dir, "--save-dir",
              os.path.join(pred_dir, "segmamba"), "--roi", "16", "16", "16",
              "--sw-batch-size", "1", "--mirror", "--dtype", "float32",
              "--split", "0.4", "0.2", "0.4", *tiny)
    preds = os.listdir(os.path.join(pred_dir, "segmamba"))
    assert len(preds) == 1 and preds[0].endswith(".nii.gz")

    out = run("5_compute_metrics.py", "--pred_name", "segmamba",
              "--pred-dir", pred_dir, "--gt-dir", fullres,
              "--out", str(tmp_path / "metrics"))
    assert "mean dice" in out
    arr = np.load(tmp_path / "metrics" / "segmamba.npy")
    assert arr.shape == (1, 3, 2)
