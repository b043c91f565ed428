"""Offline metrics: Dice + HD95 per TC/WT/ET over saved predictions.

Parity with /root/reference/5_compute_metrics.py (convert labels :40-46,
per-case dice/hd95 :24-38, .npy dump + mean/std :69-81), using the native
metric implementations instead of medpy.
"""

import argparse
import os

import numpy as np


def each_case_metric(gt, pred, voxel_spacing=None):
    from segmamba_tpu.metrics import dice, hausdorff_distance_95
    from segmamba_tpu.metrics.metrics import convert_labels_brats

    gt_c = convert_labels_brats(gt)
    pr_c = convert_labels_brats(pred)
    out = np.zeros((3, 2))
    for i in range(3):
        g, p = gt_c[i], pr_c[i]
        if g.sum() == 0 and p.sum() == 0:
            out[i] = [1.0, 0.0]
        elif g.sum() == 0 or p.sum() == 0:
            out[i] = [0.0, 373.13]  # medpy-style worst-case fallback
        else:
            out[i, 0] = dice(p, g)
            out[i, 1] = hausdorff_distance_95(p, g,
                                              voxel_spacing=voxel_spacing)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_name", default="segmamba")
    ap.add_argument("--pred-dir", default="./prediction_results")
    ap.add_argument("--gt-dir", default="./data/fullres/train",
                    help="dir of preprocessed cases (.npz with seg) or raw "
                         "NIfTI ground truths")
    ap.add_argument("--raw-gt", action="store_true",
                    help="gt-dir holds <case>/seg.nii.gz raw files")
    ap.add_argument("--out", default="./metrics")
    args = ap.parse_args()

    from segmamba_tpu.data import read_nifti

    pred_dir = os.path.join(args.pred_dir, args.pred_name)
    preds = sorted(f for f in os.listdir(pred_dir) if f.endswith(".nii.gz"))
    print(f"{len(preds)} predictions in {pred_dir}")

    results = []
    for fname in preds:
        name = fname.replace(".nii.gz", "")
        pred = read_nifti(os.path.join(pred_dir, fname))
        if args.raw_gt:
            gt = read_nifti(os.path.join(args.gt_dir, name, "seg.nii.gz"))
        else:
            npz = os.path.join(args.gt_dir, f"{name}.npz")
            if not os.path.isfile(npz):
                print(f"skip {name}: no ground truth")
                continue
            import pickle
            with np.load(npz) as z:
                seg = z["seg"][0]
            with open(os.path.join(args.gt_dir, f"{name}.pkl"), "rb") as f:
                props = pickle.load(f)
            # predictions are saved at original (pre-crop) geometry; map the
            # preprocessed gt back: nearest-resample + uncrop
            from segmamba_tpu.infer import Predictor
            from scipy import ndimage as ndi
            tgt = props["shape_after_cropping_before_resample"]
            zoom = [t / s for t, s in zip(tgt, seg.shape)]
            seg_rs = ndi.zoom(seg, zoom, order=0)
            gt = Predictor.predict_noncrop_probability(seg_rs[None], props)[0]
        m = each_case_metric(gt, pred)
        results.append(m)
        print(f"{name}: dice={m[:, 0].round(4)} hd95={m[:, 1].round(2)}")

    if results:
        arr = np.stack(results)  # (n, 3, 2)
        os.makedirs(args.out, exist_ok=True)
        np.save(os.path.join(args.out, f"{args.pred_name}.npy"), arr)
        print("mean dice (tc, wt, et):", np.nanmean(arr[:, :, 0], 0).round(4))
        print("std  dice:", np.nanstd(arr[:, :, 0], 0).round(4))
        print("mean hd95:", np.nanmean(arr[:, :, 1], 0).round(2))
        print("overall mean dice:", float(np.nanmean(arr[:, :, 0])))


if __name__ == "__main__":
    main()
