"""End-to-end pipeline: preprocess -> train (tiny) -> checkpoint ->
resume -> predict -> metrics, all on synthetic data (CPU)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

from segmamba_tpu.data import (
    MedicalDataset,
    MultiModalityPreprocessor,
    write_nifti,
)
from segmamba_tpu.infer import Predictor, SlidingWindowInferer
from segmamba_tpu.models import SegMamba
from segmamba_tpu.train import Trainer, checkpoint as ckpt


TINY = dict(in_chans=2, out_chans=3, depths=(1, 1, 1, 1),
            feat_size=(4, 8, 16, 32), hidden_size=64,
            num_slices_list=(8, 4, 2, 1), scan_impl="ref")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    base = tmp / "raw"
    rng = np.random.default_rng(0)
    for i in range(3):
        case = base / "images" / f"case_{i:03d}"
        os.makedirs(case)
        for m in ["t1.nii.gz", "t2.nii.gz"]:
            vol = np.zeros((24, 26, 28), np.float32)
            vol[2:22, 2:24, 2:26] = rng.standard_normal((20, 22, 24)) + 10
            write_nifti(case / m, vol, spacing=(1.0, 1.0, 1.0))
        seg = np.zeros((24, 26, 28), np.float32)
        seg[8:14, 9:15, 10:16] = 1
        seg[11:14, 12:15, 13:16] = 2
        write_nifti(case / "seg.nii.gz", seg, spacing=(1.0, 1.0, 1.0))
    pp = MultiModalityPreprocessor(
        base_dir=str(base), image_dir="images",
        data_filenames=["t1.nii.gz", "t2.nii.gz"], seg_filename="seg.nii.gz")
    out = str(tmp / "fullres")
    pp.run(output_spacing=[1.0, 1.0, 1.0], output_dir=out,
           all_labels=[1, 2], num_processes=1)
    return out


def test_train_checkpoint_resume_predict(data_dir, tmp_path):
    paths = [os.path.join(data_dir, f) for f in sorted(os.listdir(data_dir))
             if f.endswith(".npz")]
    train_ds = MedicalDataset(paths[:2])
    val_ds = MedicalDataset(paths[1:2])

    logdir = str(tmp_path / "logs")
    model = SegMamba(**TINY)
    trainer = Trainer(model, logdir, max_epochs=2, batch_size=2, val_every=1,
                      num_step_per_epoch=2, val_number=1,
                      patch_size=(16, 16, 16), augmentation=False,
                      learning_rate=1e-2, num_classes=3, num_workers=0,
                      seed=0)
    state = trainer.train(train_ds, val_ds)
    assert int(state.step) == 4
    model_dir = os.path.join(logdir, "model")
    names = os.listdir(model_dir)
    assert any(n.startswith("final_model_") for n in names)

    # metrics were logged
    log = open(os.path.join(logdir, "metrics.jsonl")).read()
    assert "mean_dice" in log

    # resume: picks up epoch from the final checkpoint
    trainer2 = Trainer(model, logdir, max_epochs=3, batch_size=2, val_every=5,
                       num_step_per_epoch=2, val_number=1,
                       patch_size=(16, 16, 16), augmentation=False,
                       num_classes=3, num_workers=0, seed=0, resume=True)
    state2 = trainer2.train(train_ds, None)
    assert int(state2.step) > 4  # continued, not restarted from zero

    # params-only restore for inference (4_predict path)
    best = ckpt.find_checkpoint(model_dir, "final_model")
    params = ckpt.restore_params(best)
    fwd = jax.jit(model.apply)

    item = MedicalDataset(paths[2:])[0]
    data = np.asarray(item["data"], np.float32)
    props = item["properties"]
    x = jnp.asarray(np.moveaxis(data, 0, -1))[None]

    inferer = SlidingWindowInferer((16, 16, 16), sw_batch_size=1, bucket=8)
    predictor = Predictor(inferer, mirror_axes=(0,))  # 2x TTA to keep it fast
    logits = predictor.maybe_mirror_and_predict(
        x, lambda w: fwd(params, w), num_classes=3)
    raw = predictor.predict_raw_probability(np.asarray(logits), props)
    seg = np.argmax(raw, axis=0)
    full = predictor.predict_noncrop_probability(seg[None], props)
    assert full.shape == (1,) + tuple(props["shape_before_cropping"])
    path = predictor.save_to_nii(full, props, str(tmp_path / "preds"))
    assert os.path.isfile(path)


def test_checkpoint_roundtrip(tmp_path):
    from segmamba_tpu.train import create_train_state
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    m = M()
    x = jnp.ones((2, 5))
    s1 = create_train_state(m, jax.random.key(0), x, learning_rate=0.1)
    s1, _ = __import__("segmamba_tpu.train.train_state",
                       fromlist=["train_step"]).train_step(
        s1, {"image": x, "label": jnp.zeros((2,), jnp.int32)},
        num_classes=3, loss="ce")
    p = ckpt.save_checkpoint(s1, str(tmp_path / "ck"), epoch=7, metric=0.5)
    s2 = create_train_state(m, jax.random.key(1), x, learning_rate=0.1)
    s2, epoch = ckpt.restore_checkpoint(s2, p)
    assert epoch == 7 and int(s2.step) == int(s1.step)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
