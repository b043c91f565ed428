"""Training-dynamics drive: the real BraTS recipe shape on-chip.

Runs the reference training configuration (batch 2 x 128^3 patches, bf16
compute / f32 params, SGD nesterov poly LR, grad-clip 12 — 3_train.py:22-54)
for --steps optimizer steps on synthetic structured volumes, logging
loss/dice trajectory, step time, and HBM usage; then kills and resumes
from the checkpoint to exercise mid-run resume (which the reference cannot
do — its checkpoints are weights-only, light_training/trainer.py:503-515).

Usage: python benchmarks/train_dynamics.py [--steps 500] [--dir /tmp/train_dyn]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cases(base, n_cases=5, shape=(150, 180, 150), seed=0):
    from segmamba_tpu.data import MultiModalityPreprocessor, write_nifti

    raw = os.path.join(base, "raw")
    rng = np.random.default_rng(seed)
    names = ["t1.nii.gz", "t1ce.nii.gz", "t2.nii.gz", "flair.nii.gz"]
    for i in range(n_cases):
        case = os.path.join(raw, "images", f"case_{i:03d}")
        os.makedirs(case, exist_ok=True)
        Z, Y, X = shape
        zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                                 indexing="ij")
        cz, cy, cx = rng.integers(40, Z - 40), rng.integers(50, Y - 50), \
            rng.integers(40, X - 40)
        r1, r2, r3 = rng.integers(12, 25, 3)
        d2 = ((zz - cz) / r1) ** 2 + ((yy - cy) / r2) ** 2 \
            + ((xx - cx) / r3) ** 2
        seg = np.zeros(shape, np.float32)
        seg[d2 < 1.0] = 2
        seg[d2 < 0.45] = 1
        seg[d2 < 0.15] = 3
        for m, name in enumerate(names):
            vol = rng.standard_normal(shape).astype(np.float32) * 5 + 80
            # tumor classes shift intensity per modality -> learnable signal
            vol += (seg == 1) * (20 + 10 * m) + (seg == 2) * (-15 - 5 * m) \
                + (seg == 3) * (35 - 8 * m)
            write_nifti(os.path.join(case, name), vol,
                        spacing=(1.0, 1.0, 1.0))
        write_nifti(os.path.join(case, "seg.nii.gz"), seg,
                    spacing=(1.0, 1.0, 1.0))
    pp = MultiModalityPreprocessor(
        base_dir=raw, image_dir="images", data_filenames=names,
        seg_filename="seg.nii.gz")
    out = os.path.join(base, "fullres")
    pp.run(output_spacing=[1.0, 1.0, 1.0], output_dir=out,
           all_labels=[1, 2, 3], num_processes=1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--dir", default="/tmp/train_dyn")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the existing checkpoint")
    ap.add_argument("--steps-per-epoch", type=int, default=50)
    ap.add_argument("--augmentation", default="noaug",
                    help="Trainer augmentation mode (noaug/default/device)")
    ap.add_argument("--num-workers", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from segmamba_tpu.data import get_train_val_test_loader_from_train
    from segmamba_tpu.models import SegMamba
    from segmamba_tpu.train import Trainer

    data_dir = os.path.join(args.dir, "fullres")
    if not os.path.isdir(data_dir):
        print("generating synthetic cases...", flush=True)
        data_dir = make_cases(args.dir)

    epochs = -(-args.steps // args.steps_per_epoch)
    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16, remat="convs")
    trainer = Trainer(
        model, os.path.join(args.dir, "logs"), max_epochs=epochs,
        batch_size=2, val_every=max(2, epochs // 2),
        num_step_per_epoch=args.steps_per_epoch, val_number=4,
        patch_size=(128, 128, 128), augmentation=args.augmentation,
        learning_rate=1e-2, scheduler_type="poly", loss="ce",
        num_classes=4, num_workers=args.num_workers, seed=42,
        resume=args.resume)

    train_ds, val_ds, _ = get_train_val_test_loader_from_train(
        data_dir, train_rate=0.6, val_rate=0.2, test_rate=0.2)
    t0 = time.perf_counter()
    trainer.train(train_ds, val_ds)
    wall = time.perf_counter() - t0

    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    print(json.dumps({
        "steps": trainer.global_step,
        "wall_s": round(wall, 1),
        "sec_per_step": round(wall / max(1, args.steps), 3),
        "hbm_peak_bytes": stats.get("peak_bytes_in_use"),
        "hbm_limit_bytes": stats.get("bytes_limit"),
    }), flush=True)


if __name__ == "__main__":
    main()
