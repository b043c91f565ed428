"""Preprocessed-case dataset + split factories.

Rebuilds /root/reference/light_training/dataloading/dataset.py (MedicalDataset
:27-98, split factories :128-271) and utils.py (unpack_dataset:15) without
torch: cases are ``.npz {data, seg}`` + ``.pkl`` properties, unpacked once to
``.npy`` / ``_seg.npy`` for zero-copy memory-mapped reads in the sampler
workers.
"""

from __future__ import annotations

import glob
import os
import pickle
import random
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def unpack_dataset(folder, unpack_segmentation=True, overwrite_existing=False,
                   num_processes=8):
    """.npz -> .npy (+ _seg.npy) for memmap access (dataloading/utils.py:15)."""
    npzs = sorted(glob.glob(os.path.join(folder, "*.npz")))

    def _unpack(path):
        stem = path[:-4]
        if overwrite_existing or not os.path.isfile(stem + ".npy"):
            with np.load(path) as z:
                np.save(stem + ".npy", z["data"])
                if unpack_segmentation and "seg" in z and z["seg"].ndim > 0:
                    np.save(stem + "_seg.npy", z["seg"])

    with ThreadPoolExecutor(max_workers=num_processes) as ex:
        list(ex.map(_unpack, npzs))


class MedicalDataset:
    """Case list with cached properties and memory-mapped volumes
    (dataset.py:27-98)."""

    def __init__(self, datalist, test=False):
        self.datalist = list(datalist)
        self.test = test
        self.properties = []
        for p in self.datalist:
            with open(p[:-4] + ".pkl", "rb") as f:
                self.properties.append(pickle.load(f))
        folders = sorted({os.path.dirname(p) for p in self.datalist})
        for f in folders:
            unpack_dataset(f, unpack_segmentation=True,
                           overwrite_existing=False)

    def __len__(self):
        return len(self.datalist)

    def __getitem__(self, i):
        path = self.datalist[i]
        image = np.load(path.replace(".npz", ".npy"), mmap_mode="r")
        item = {"data": image, "properties": self.properties[i]}
        if not self.test:
            item["seg"] = np.load(path.replace(".npz", "_seg.npy"),
                                  mmap_mode="r")
        return item


def get_train_val_test_loader_from_train(data_dir, train_rate=0.7,
                                         val_rate=0.1, test_rate=0.2,
                                         seed=42):
    """70/10/20 shuffled split, seed 42 (dataset.py:244-271).

    Membership note: the reference seed-42-shuffles the *raw glob order*
    (filesystem/readdir-dependent, dataset.py:247-255); this version sorts
    before the same shuffle, so splits are reproducible across machines but
    case-level membership can differ from a particular reference run.
    """
    all_paths = sorted(glob.glob(f"{data_dir}/*.npz"))
    train_n = int(len(all_paths) * train_rate)
    val_n = int(len(all_paths) * val_rate)
    test_n = int(len(all_paths) * test_rate)
    random.seed(seed)
    random.shuffle(all_paths)
    train, val = all_paths[:train_n], all_paths[train_n:train_n + val_n]
    test = all_paths[-test_n:] if test_n else []
    return (MedicalDataset(train), MedicalDataset(val), MedicalDataset(test))


def get_kfold_data(paths, k=5, shuffle=False, seed=None):
    """K-fold split of case paths with sklearn ``KFold`` semantics, matching
    the reference (dataset.py:127-140: ``KFold(n_splits=k, shuffle=False)``
    over the glob list): contiguous folds, the first ``n % k`` folds one
    element larger; ``shuffle=True`` permutes indices first (RandomState
    ``seed``). Fold dicts carry the reference's ``train_data``/``val_data``
    keys plus ``train``/``val`` aliases.

    Membership note: the reference feeds raw ``glob.glob`` order (filesystem-
    dependent); this framework's loaders glob *sorted* paths, so fold
    membership is reproducible across machines but can differ from a given
    reference run's readdir order.
    """
    paths = list(paths)
    n = len(paths)
    idx = np.arange(n)
    if shuffle:
        idx = np.random.RandomState(seed).permutation(n)
    fold_sizes = np.full(k, n // k, dtype=int)
    fold_sizes[: n % k] += 1
    folds, start = [], 0
    for size in fold_sizes:
        # sklearn emits mask-ordered (ascending) indices per fold
        val_idx = np.sort(idx[start:start + size])
        train_idx = np.sort(np.concatenate([idx[:start], idx[start + size:]]))
        train = [paths[i] for i in train_idx]
        val = [paths[i] for i in val_idx]
        folds.append({"train_data": train, "val_data": val,
                      "train": train, "val": val})
        start += size
    return folds


def get_test_loader_from_test(data_dir):
    paths = sorted(glob.glob(f"{data_dir}/*.npz"))
    return MedicalDataset(paths, test=True)


def get_train_val_test_loader_from_split_json(data_dir, split_json_file):
    """Named splits from a json file {'train': [...], 'validation': [...],
    'test': [...]} of case filenames (dataset.py:213-241)."""
    import json

    with open(split_json_file) as f:
        datalist = json.load(f)
    make = lambda names: MedicalDataset(
        [os.path.join(data_dir, n) for n in names])
    return (make(datalist["train"]), make(datalist["validation"]),
            make(datalist["test"]))


class GlobalPatchDataset(MedicalDataset):
    """Dual-stream dataset: each item carries a fixed-size downsampled
    whole-volume context next to the full-res case (the SegMamba-V2 hook,
    dataloading_global/dataset.py:27-103). The global stream is computed
    once per case and cached as ``_global.npy`` next to the data."""

    def __init__(self, datalist, global_size=(64, 64, 64), test=False):
        super().__init__(datalist, test=test)
        self.global_size = tuple(global_size)
        self._ensure_globals()

    def _ensure_globals(self):
        from scipy import ndimage
        for path in self.datalist:
            gpath = path.replace(".npz", "_global.npy")
            if os.path.isfile(gpath):
                continue
            data = np.load(path.replace(".npz", ".npy"), mmap_mode="r")
            zoom = [1.0] + [t / s for t, s in zip(self.global_size,
                                                  data.shape[1:])]
            g = ndimage.zoom(np.asarray(data, np.float32), zoom, order=1)
            np.save(gpath, g.astype(np.float32))

    def __getitem__(self, i):
        item = super().__getitem__(i)
        gpath = self.datalist[i].replace(".npz", "_global.npy")
        item["data_global"] = np.load(gpath, mmap_mode="r")
        return item
