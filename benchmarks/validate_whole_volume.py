"""Dice-parity validation: sliding-window vs whole-volume single shot.

The single-shot mode (infer/whole_volume.py) replaces the reference's
128^3 sliding-window protocol (4_predict.py:55-62) with ONE forward over
the whole case — ~3-4x fewer voxel-forwards. Its documented caveat is that
a patch-trained checkpoint sees a different test-time distribution (longer
scans, global instance-norm statistics), so Dice parity must be validated
per checkpoint. This script IS that validation, end to end on-chip:

1. synthesize structured-tumor BraTS-like cases (same generator as
   benchmarks/train_dynamics.py),
2. train the real recipe (batch 2 x 128^3 bf16 patches) for --steps,
3. predict every held-out case BOTH ways from the same checkpoint,
4. report per-mode Dice vs ground truth and the direct agreement Dice
   between the two predicted segmentations.

Usage: python benchmarks/validate_whole_volume.py [--steps 150]
       [--dir /tmp/wv_val] [--skip-train]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_dynamics import make_cases  # noqa: E402  (same benchmarks dir)


def _dice(a, b):
    inter = np.sum((a & b))
    denom = a.sum() + b.sum()
    return float(2.0 * inter / denom) if denom else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--dir", default="/tmp/wv_val")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the checkpoint already in --dir")
    ap.add_argument("--steps-per-epoch", type=int, default=50)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from segmamba_tpu.data import get_train_val_test_loader_from_train
    from segmamba_tpu.infer.sliding_window import sliding_window_inference
    from segmamba_tpu.infer.whole_volume import whole_volume_inference
    from segmamba_tpu.models import SegMamba
    from segmamba_tpu.train import Trainer, checkpoint as ckpt

    data_dir = os.path.join(args.dir, "fullres")
    if not os.path.isdir(data_dir):
        print("generating synthetic cases...", flush=True)
        data_dir = make_cases(args.dir, n_cases=8)

    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16,
                     remat="convs")
    train_ds, val_ds, test_ds = get_train_val_test_loader_from_train(
        data_dir, train_rate=0.5, val_rate=0.25, test_rate=0.25)

    logdir = os.path.join(args.dir, "logs")
    if not args.skip_train:
        epochs = -(-args.steps // args.steps_per_epoch)
        trainer = Trainer(
            model, logdir, max_epochs=epochs, batch_size=2,
            val_every=max(2, epochs), num_step_per_epoch=args.steps_per_epoch,
            val_number=2, patch_size=(128, 128, 128), augmentation="device",
            learning_rate=1e-2, scheduler_type="poly", loss="ce",
            num_classes=4, num_workers=2, seed=42)
        t0 = time.perf_counter()
        trainer.train(train_ds, val_ds)
        print(f"trained {trainer.global_step} steps in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    path = ckpt.find_checkpoint(os.path.join(logdir, "model"), "best_model") \
        or ckpt.find_checkpoint(os.path.join(logdir, "model"), "final_model")
    print(f"checkpoint: {path}", flush=True)
    params = ckpt.restore_params(path)

    fwd = jax.jit(model.apply)

    def predictor_fn(p, wins):
        return fwd(p, wins)

    # eval model config matches the inference model (no remat at eval)
    eval_model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)

    cases = [("val", val_ds[i]) for i in range(len(val_ds))] + \
            [("test", test_ds[i]) for i in range(len(test_ds))]
    rows = []
    for split, item in cases:
        data = np.asarray(item["data"], np.float32)          # (C, Z, Y, X)
        seg = np.asarray(item["seg"], np.float32)[0]          # (Z, Y, X)
        x = jnp.asarray(np.moveaxis(data, 0, -1))[None]       # (1,Z,Y,X,C)

        t0 = time.perf_counter()
        lw = sliding_window_inference(
            x, (128, 128, 128), predictor_fn, overlap=0.5, sw_batch_size=1,
            num_classes=4, predictor_args=(params,))
        seg_w = np.asarray(jnp.argmax(lw[0], axis=-1))
        t_w = time.perf_counter() - t0

        t0 = time.perf_counter()
        lv = whole_volume_inference(eval_model, params, x,
                                    crop_to_nonzero=True)
        seg_v = np.asarray(jnp.argmax(lv[0], axis=-1))
        t_v = time.perf_counter() - t0

        row = {"split": split, "window_s": round(t_w, 2),
               "wholevol_s": round(t_v, 2)}
        for c in (1, 2, 3):
            gt = seg == c
            row[f"dice_win_c{c}"] = round(_dice(seg_w == c, gt), 4)
            row[f"dice_wv_c{c}"] = round(_dice(seg_v == c, gt), 4)
            row[f"agree_c{c}"] = round(_dice(seg_w == c, seg_v == c), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    def mean(key):
        vals = [r[f"{key}_c{c}"] for r in rows for c in (1, 2, 3)
                if np.isfinite(r[f"{key}_c{c}"])]
        return round(float(np.mean(vals)), 4) if vals else None

    summary = {
        "metric": "wholevol_dice_parity",
        "cases": len(rows),
        "mean_dice_window": mean("dice_win"),
        "mean_dice_wholevol": mean("dice_wv"),
        "mean_agreement": mean("agree"),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
