"""Data subsystem: NIfTI IO, offline preprocessing, datasets, patch
sampling, augmentation, and the host-side loader pipeline.

Rebuilds the reference's preprocessing + dataloading stack
(/root/reference/light_training/preprocessing/, light_training/dataloading/)
without SimpleITK/skimage/batchgenerators: NIfTI parsing is native numpy,
resampling and spatial augmentation run on scipy.ndimage.
"""

from segmamba_tpu.data.nifti import read_nifti, write_nifti
from segmamba_tpu.data.preprocessing import (
    MultiModalityPreprocessor,
    compute_new_shape,
    crop_to_nonzero,
    resample_to_shape,
)
from segmamba_tpu.data.dataset import (
    MedicalDataset,
    get_kfold_data,
    get_train_val_test_loader_from_train,
    unpack_dataset,
)
from segmamba_tpu.data.patch_sampler import PatchSampler
from segmamba_tpu.data.loader import DataLoader
from segmamba_tpu.data.sdm_edge import SdmEdgeDataset, precompute_sdm

__all__ = [
    "read_nifti",
    "write_nifti",
    "MultiModalityPreprocessor",
    "compute_new_shape",
    "crop_to_nonzero",
    "resample_to_shape",
    "MedicalDataset",
    "get_train_val_test_loader_from_train",
    "get_kfold_data",
    "unpack_dataset",
    "PatchSampler",
    "DataLoader",
    "SdmEdgeDataset",
    "precompute_sdm",
]
