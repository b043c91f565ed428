"""Full-volume inference on the BraTS2023 test split: sliding window 128^3 +
8-way mirror TTA -> inverse resample/crop -> NIfTI predictions + quick dice.

Parity with /root/reference/4_predict.py (define_model_segmamba :44-67,
validation_step :69-101) on the TPU sliding-window inferer.
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="./data/fullres/train")
    ap.add_argument("--checkpoint", default="./logs/segmamba/model",
                    help="checkpoint dir (or its parent model dir)")
    ap.add_argument("--save-dir", default="./prediction_results/segmamba")
    ap.add_argument("--roi", type=int, nargs=3, default=[128, 128, 128])
    ap.add_argument("--sw-batch-size", type=int, default=2)
    ap.add_argument("--overlap", type=float, default=0.5)
    ap.add_argument("--mirror", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--whole-volume", action="store_true",
                    help="single-shot whole-volume forward instead of "
                         "sliding windows (linear-time scan makes this "
                         "feasible; see infer/whole_volume.py)")
    # model-size overrides matching 3_train.py
    ap.add_argument("--feats", type=int, nargs=4, default=[48, 96, 192, 384])
    ap.add_argument("--depths", type=int, nargs=4, default=[2, 2, 2, 2])
    ap.add_argument("--hidden-size", type=int, default=768)
    ap.add_argument("--num-slices", type=int, nargs=4,
                    default=[64, 32, 16, 8])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--split", type=float, nargs=3, default=[0.7, 0.1, 0.2],
                    help="train/val/test fractions (must match 3_train)")
    args = ap.parse_args()
    if args.cpu:
        import os as _os
        _os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from segmamba_tpu.data import get_train_val_test_loader_from_train
    from segmamba_tpu.infer import Predictor, SlidingWindowInferer
    from segmamba_tpu.metrics import dice
    from segmamba_tpu.metrics.metrics import convert_labels_brats
    from segmamba_tpu.models import SegMamba
    from segmamba_tpu.train import checkpoint as ckpt

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = SegMamba(in_chans=4, out_chans=4, depths=tuple(args.depths),
                     feat_size=tuple(args.feats),
                     hidden_size=args.hidden_size,
                     num_slices_list=tuple(args.num_slices), dtype=dtype)

    path = args.checkpoint
    if path.endswith((".pt", ".pth")):
        # reference torch checkpoint (e.g. the published
        # final_model_0.9038.pt, reference 4_predict.py:51) — convert on
        # the fly so reference users can bring their trained weights
        from segmamba_tpu.utils.torch_convert import load_torch_checkpoint
        print(f"converting torch checkpoint: {path}")
        params = load_torch_checkpoint(path, depths=tuple(args.depths))
    else:
        if not os.path.basename(path).split("_")[-1].replace(".", "").isdigit():
            found = ckpt.find_checkpoint(path, "best_model")
            if found is None:
                raise SystemExit(f"no checkpoint found under {path}")
            path = found
        print(f"loading checkpoint: {path}")
        params = ckpt.restore_params(path)

    fwd = jax.jit(model.apply)

    def predictor_fn(p, wins):
        # params arrive as a jit argument (sliding_window predictor_args) so
        # the fused window program doesn't inline 64MB of weight constants
        return fwd(p, wins)

    if args.whole_volume:
        from segmamba_tpu.infer.whole_volume import WholeVolumePredictor
        predictor = WholeVolumePredictor(model, params,
                                         mirror_axes=tuple(args.mirror))
        # reuse the Predictor's inverse-pipeline statics
        predictor.predict_raw_probability = Predictor.predict_raw_probability
        predictor.predict_noncrop_probability = \
            Predictor.predict_noncrop_probability
        predictor.save_to_nii = Predictor.save_to_nii
    else:
        inferer = SlidingWindowInferer(tuple(args.roi),
                                       sw_batch_size=args.sw_batch_size,
                                       overlap=args.overlap, mode="gaussian")
        predictor = Predictor(inferer, mirror_axes=tuple(args.mirror),
                              predictor_args=(params,))

    _, _, test_ds = get_train_val_test_loader_from_train(
        args.data_dir, train_rate=args.split[0], val_rate=args.split[1],
        test_rate=args.split[2])
    print(f"test cases: {len(test_ds)}")

    def predict_case(i):
        """Full per-case pipeline; runs on whichever local device
        ``eval_map`` pinned this shard to."""
        item = test_ds[i]
        data = np.asarray(item["data"], np.float32)   # (C, Z, Y, X)
        props = item["properties"]
        x = jnp.asarray(np.moveaxis(data, 0, -1))[None]  # (1, Z, Y, X, C)

        logits = predictor.maybe_mirror_and_predict(x, predictor_fn,
                                                    num_classes=4)
        raw = predictor.predict_raw_probability(np.asarray(logits), props)
        seg = np.argmax(raw, axis=0)

        ds = None
        if "seg" in item:
            gt = np.asarray(item["seg"][0])
            # quick dice at model resolution using argmax on composites
            pred_c = convert_labels_brats(seg)
            # ground truth is at post-resample res; resample gt-side instead
            from scipy import ndimage as ndi
            zoom = [t / s for t, s in zip(seg.shape, gt.shape)]
            gt_r = ndi.zoom(gt, zoom, order=0)
            gt_c = convert_labels_brats(gt_r)
            ds = [dice(pred_c[k], gt_c[k]) for k in range(3)]
            print(f"{props['name']}: tc={ds[0]:.4f} wt={ds[1]:.4f} "
                  f"et={ds[2]:.4f}")

        full = predictor.predict_noncrop_probability(seg[None], props)
        predictor.save_to_nii(full, props, args.save_dir)
        return ds

    # shard cases over local devices (SequentialDistributedSampler
    # semantics, reference trainer.py:213-266 + sampler.py:5-48); with one
    # device this is a plain sequential loop
    from segmamba_tpu.parallel.eval import eval_map
    results = eval_map(predict_case, list(range(len(test_ds))))
    all_dices = [r for r in results if r is not None]

    if all_dices:
        arr = np.asarray(all_dices, np.float64)
        mean = np.nanmean(arr, axis=0)
        print(f"mean dice: tc={mean[0]:.4f} wt={mean[1]:.4f} "
              f"et={mean[2]:.4f} overall={np.nanmean(mean):.4f}")


if __name__ == "__main__":
    main()
