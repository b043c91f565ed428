"""Data-path benchmark: wall-clock vs device time per training step.

The reference hides its host augmentation cost behind 18 batchgenerators
producer processes (/root/reference/light_training/trainer.py:154-162); this
container has ONE host core, so the host chain must either be cheap or move
to the accelerator. This drive measures, at the real recipe shape
(batch 2 x 128^3, bf16), for each augmentation mode:

  device_s : bare train_step time with a device-resident batch (steady state)
  wall_s   : per-step wall time of loader -> prefetch -> train_step
  ratio    : wall / device  (VERDICT round-2 item 4 target: <= 1.3
             for the device-augmentation mode)

Usage: python benchmarks/bench_datapath.py [--steps 20] [--dir /tmp/train_dyn]
       [--modes device,noaug,default]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dir", default="/tmp/train_dyn")
    ap.add_argument("--modes", default="device,noaug,default")
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--patch", type=int, default=128,
                    help="cubic patch edge (reduce for CPU smoke runs)")
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from segmamba_tpu.data import get_train_val_test_loader_from_train
    from segmamba_tpu.data.loader import DataLoader
    from segmamba_tpu.data.patch_sampler import PatchSampler
    from segmamba_tpu.models import SegMamba
    from segmamba_tpu.train.train_state import create_train_state, train_step
    from segmamba_tpu.train.trainer import _pick_transform, _prefetch

    from train_dynamics import make_cases  # noqa: E402 (sibling module)

    data_dir = os.path.join(args.dir, "fullres")
    if not os.path.isdir(data_dir):
        print("generating synthetic cases...", flush=True)
        data_dir = make_cases(args.dir)
    train_ds, _, _ = get_train_val_test_loader_from_train(
        data_dir, train_rate=0.6, val_rate=0.2, test_rate=0.2)

    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16, remat="convs")
    P = args.patch
    sample = jnp.zeros((1, P, P, P, 4), jnp.float32)
    key = jax.random.key(7)

    def run_mode(mode):
        sampler = PatchSampler(train_ds, (P, P, P), batch_size=args.batch,
                               rng=np.random.default_rng(0))
        loader = DataLoader(sampler, transform=_pick_transform(mode),
                            num_workers=args.num_workers,
                            steps_per_epoch=args.steps + 3, seed=0)
        aug = mode == "device"
        # fresh state per mode: train_step donates its state argument, so a
        # shared state would be a deleted buffer on the second mode
        state = create_train_state(model, jax.random.key(0), sample)
        # -- bare device step: one batch, re-fed (steady-state compile warm)
        it = _prefetch(iter(loader))
        batch = next(it)
        img, lab = jnp.asarray(batch["image"]), jnp.asarray(batch["label"])
        for _ in range(2):  # compile + settle
            state, m = train_step(
                state, {"image": img, "label": lab},
                augment_key=key if aug else None)
        float(m["loss"])
        dts = []
        for i in range(5):
            t0 = time.perf_counter()
            state, m = train_step(
                state, {"image": img, "label": lab},
                augment_key=(jax.random.fold_in(key, i) if aug else None))
            float(m["loss"])  # scalar fetch: reliable sync through the relay
            dts.append(time.perf_counter() - t0)
        device_s = min(dts)
        # -- end-to-end wall: loader -> prefetch -> step
        wts = []
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            state, m = train_step(
                state, {"image": batch["image"], "label": batch["label"]},
                augment_key=(jax.random.fold_in(key, 100 + n) if aug
                             else None))
            float(m["loss"])
            t1 = time.perf_counter()
            wts.append(t1 - t0)
            t0 = t1
            n += 1
            if n >= args.steps:
                break
        loader.stop()
        wts = wts[1:]  # first step includes pipeline fill
        wall_s = float(np.median(wts))
        return {"mode": mode, "device_s": round(device_s, 3),
                "wall_s": round(wall_s, 3),
                "ratio": round(wall_s / device_s, 3),
                "steps": len(wts)}

    for mode in args.modes.split(","):
        print(json.dumps(run_mode(mode)), flush=True)


if __name__ == "__main__":
    main()
