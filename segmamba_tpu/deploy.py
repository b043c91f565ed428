"""Container deployment wrapper: raw volumes in, segmentations out.

Rebuilds the reference's grand-challenge algorithm shell
(/root/reference/light_training/process_framework/process.py:8-30): watch an
input directory of raw NIfTI cases, run the full pipeline in-process
(preprocess -> sliding-window/TTA predict -> inverse resample/crop -> write
NIfTI), without any intermediate .npz stage.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


class SegmentationAlgorithm:
    def __init__(self, model, checkpoint_path, *, input_dir, output_dir,
                 data_filenames, out_spacing=(1.0, 1.0, 1.0),
                 roi_size=(128, 128, 128), sw_batch_size=2, overlap=0.5,
                 mirror_axes=(0, 1, 2), normalize_fn=None,
                 postprocess_largest_cc=False):
        from segmamba_tpu.infer import Predictor, SlidingWindowInferer
        from segmamba_tpu.train import checkpoint as ckpt

        self.model = model
        self.input_dir = input_dir
        self.output_dir = output_dir
        self.data_filenames = list(data_filenames)
        self.out_spacing = list(out_spacing)
        self.normalize_fn = normalize_fn
        self.postprocess_largest_cc = postprocess_largest_cc

        self.params = ckpt.restore_params(checkpoint_path)
        fwd = jax.jit(model.apply)
        self._predict_windows = lambda p, w: fwd(p, w)
        inferer = SlidingWindowInferer(tuple(roi_size),
                                       sw_batch_size=sw_batch_size,
                                       overlap=overlap)
        self.predictor = Predictor(inferer, mirror_axes=mirror_axes,
                                   predictor_args=(self.params,))

    def list_cases(self):
        return sorted(
            d for d in os.listdir(self.input_dir)
            if os.path.isdir(os.path.join(self.input_dir, d)))

    def process_case(self, case_name):
        from segmamba_tpu.data.nifti import read_nifti
        from segmamba_tpu.data.preprocessing import run_case_npy
        from segmamba_tpu.infer import Predictor

        case_dir = os.path.join(self.input_dir, case_name)
        vols, spacing = [], (1.0, 1.0, 1.0)
        for fname in self.data_filenames:
            img = read_nifti(os.path.join(case_dir, fname), with_meta=True)
            spacing = img.spacing
            vols.append(img.array.astype(np.float32)[None])
        data = np.concatenate(vols, axis=0)
        properties = {"spacing": spacing, "raw_size": data.shape[1:],
                      "name": case_name}
        kwargs = {"sample_fg": False}
        if self.normalize_fn is not None:
            kwargs["normalize_fn"] = self.normalize_fn
        data, _ = run_case_npy(data, None, properties, self.out_spacing,
                               **kwargs)

        x = jnp.asarray(np.moveaxis(data, 0, -1))[None]
        logits = self.predictor.maybe_mirror_and_predict(
            x, self._predict_windows)
        raw = Predictor.predict_raw_probability(np.asarray(logits),
                                                properties)
        seg = np.argmax(raw, axis=0)
        full = Predictor.predict_noncrop_probability(seg[None], properties)
        return Predictor.save_to_nii(
            full, properties, self.output_dir, name=case_name,
            spacing=spacing,
            postprocess_largest_cc=self.postprocess_largest_cc)

    def process(self):
        paths = []
        for case in self.list_cases():
            print(f"processing {case} ...")
            paths.append(self.process_case(case))
        return paths
