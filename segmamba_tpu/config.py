"""Typed configuration for the whole pipeline.

The reference has no config system — hyperparameters are module-level
constants edited in the numbered scripts (/root/reference/3_train.py:14-27,
hardcoded checkpoint paths 4_predict.py:51; SURVEY.md §5). Here every
subsystem is driven by one dataclass tree that serializes to/from JSON, so
experiments are reproducible artifacts instead of edited source files.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Sequence


@dataclass
class ModelConfig:
    in_chans: int = 4
    out_chans: int = 4
    depths: Sequence[int] = (2, 2, 2, 2)
    feat_size: Sequence[int] = (48, 96, 192, 384)
    hidden_size: int = 768
    num_slices_list: Sequence[int] = (64, 32, 16, 8)
    dtype: str = "bfloat16"          # compute dtype; params stay f32
    scan_impl: str = "auto"
    remat: bool = False


@dataclass
class DataConfig:
    base_dir: str = "./data/raw_data/BraTS2023/"
    image_dir: str = "ASNR-MICCAI-BraTS2023-GLI-Challenge-TrainingData"
    preprocessed_dir: str = "./data/fullres/train"
    data_filenames: Sequence[str] = ("t2w.nii.gz", "t2f.nii.gz",
                                     "t1n.nii.gz", "t1c.nii.gz")
    seg_filename: str = "seg.nii.gz"
    target_spacing: Sequence[float] = (1.0, 1.0, 1.0)
    all_labels: Sequence[int] = (1, 2, 3)
    normalization: str = "zscore"     # zscore | ct | rescale01
    num_processes: int = 8


@dataclass
class TrainConfig:
    logdir: str = "./logs/segmamba"
    max_epochs: int = 1000
    batch_size: int = 2
    val_every: int = 2
    num_step_per_epoch: int = 250
    val_number: int = 100
    patch_size: Sequence[int] = (128, 128, 128)
    augmentation: str = "default"    # default|nomirror|onlymirror|onlyspatial|noaug
    learning_rate: float = 1e-2
    weight_decay: float = 3e-5
    momentum: float = 0.99
    grad_clip: float = 12.0
    scheduler: str = "poly"
    loss: str = "ce"                 # ce | dice_ce
    num_workers: int = 8
    seed: int = 42
    data_parallel: bool = False
    resume: bool = False


@dataclass
class InferConfig:
    roi_size: Sequence[int] = (128, 128, 128)
    sw_batch_size: int = 2
    overlap: float = 0.5
    blend_mode: str = "gaussian"
    mirror_axes: Sequence[int] = (0, 1, 2)
    shape_bucket: int = 32
    save_dir: str = "./prediction_results/segmamba"
    postprocess_largest_cc: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)

    def to_json(self, path=None):
        s = json.dumps(dataclasses.asdict(self), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, path_or_str):
        s = path_or_str
        if not path_or_str.lstrip().startswith("{"):
            with open(path_or_str) as f:
                s = f.read()
        raw = json.loads(s)

        def build(dc, d):
            known = {f.name for f in dataclasses.fields(dc)}
            return dc(**{k: v for k, v in d.items() if k in known})

        return cls(model=build(ModelConfig, raw.get("model", {})),
                   data=build(DataConfig, raw.get("data", {})),
                   train=build(TrainConfig, raw.get("train", {})),
                   infer=build(InferConfig, raw.get("infer", {})))

    def build_model(self):
        import jax.numpy as jnp
        from segmamba_tpu.models import SegMamba
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            self.model.dtype]
        return SegMamba(
            in_chans=self.model.in_chans, out_chans=self.model.out_chans,
            depths=tuple(self.model.depths),
            feat_size=tuple(self.model.feat_size),
            hidden_size=self.model.hidden_size,
            num_slices_list=tuple(self.model.num_slices_list),
            scan_impl=self.model.scan_impl, remat=self.model.remat,
            dtype=dtype)
