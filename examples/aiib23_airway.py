"""AIIB23 airway-tree CT recipe.

Counterpart of the reference's /root/reference/examples/2_preprocessing_AIIB23.py
(+ its train/predict variants): single CT modality, binary airway labels,
CT windowing normalization instead of per-volume z-score.
"""

import argparse
import functools

from segmamba_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from segmamba_tpu.data.preprocessing import (
    MultiModalityPreprocessor,
    ct_normalize_with_seg,
)


def get_config():
    return Config(
        model=ModelConfig(in_chans=1, out_chans=2),
        data=DataConfig(
            base_dir="./data/raw_data/AIIB23/",
            image_dir="images",
            data_filenames=("image.nii.gz",),
            seg_filename="label.nii.gz",
            all_labels=(1,),
            normalization="ct",
        ),
        train=TrainConfig(logdir="./logs/segmamba_aiib23", loss="dice_ce"),
    )


def preprocess(cfg: Config, num_processes=8):
    # lung CT window (a_min/a_max follow the airway task's intensity range)
    pp = MultiModalityPreprocessor(
        base_dir=cfg.data.base_dir, image_dir=cfg.data.image_dir,
        data_filenames=list(cfg.data.data_filenames),
        seg_filename=cfg.data.seg_filename,
        normalize_fn=functools.partial(ct_normalize_with_seg,
                                       a_min=-1000.0, a_max=600.0))
    pp.run(output_spacing=list(cfg.data.target_spacing),
           output_dir=cfg.data.preprocessed_dir,
           all_labels=list(cfg.data.all_labels),
           num_processes=num_processes)


def train(cfg: Config):
    from segmamba_tpu.data import get_train_val_test_loader_from_train
    from segmamba_tpu.train import Trainer

    model = cfg.build_model()
    trainer = Trainer(
        model, cfg.train.logdir, max_epochs=cfg.train.max_epochs,
        batch_size=cfg.train.batch_size, val_every=cfg.train.val_every,
        num_step_per_epoch=cfg.train.num_step_per_epoch,
        val_number=cfg.train.val_number,
        patch_size=tuple(cfg.train.patch_size),
        learning_rate=cfg.train.learning_rate, loss=cfg.train.loss,
        num_classes=cfg.model.out_chans, num_workers=cfg.train.num_workers,
        seed=cfg.train.seed)
    train_ds, val_ds, _ = get_train_val_test_loader_from_train(
        cfg.data.preprocessed_dir)
    trainer.train(train_ds, val_ds)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["preprocess", "train"])
    args = ap.parse_args()
    cfg = get_config()
    if args.stage == "preprocess":
        preprocess(cfg)
    else:
        train(cfg)
