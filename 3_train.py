"""BraTS2023 training: SegMamba, 1000 epochs x 250 steps x batch 2, SGD poly.

Parity with /root/reference/3_train.py (BraTSTrainer): CE loss over 4
classes, patch 128^3, val every 2 epochs with TC/WT/ET dice, keep-best
checkpoints. TPU-first: bf16 compute, DP over all local devices via the mesh.
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="./data/fullres/train")
    ap.add_argument("--logdir", default="./logs/segmamba")
    ap.add_argument("--max-epochs", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--val-every", type=int, default=2)
    ap.add_argument("--steps-per-epoch", type=int, default=250)
    ap.add_argument("--val-number", type=int, default=100)
    ap.add_argument("--patch", type=int, nargs=3, default=[128, 128, 128])
    ap.add_argument("--plan", default=None, metavar="PLAN_JSON",
                    help="dataset plan from 2_preprocessing_mri.py "
                         "(data_analysis_result.json); when set, its "
                         "heuristic patch_size overrides --patch (closing "
                         "the plan->train loop the reference leaves open, "
                         "default_preprocessor.py:400-409)")
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--loss", default="ce", choices=["ce", "dice_ce"])
    ap.add_argument("--augmentation", default="default",
                    choices=["default", "device", "nomirror", "onlymirror",
                             "onlyspatial", "noaug"],
                    help="'device' runs the full default chain on the "
                         "accelerator inside the train step (TPU-first; "
                         "frees the single-core host data path)")
    ap.add_argument("--num-workers", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the batch over all local devices")
    ap.add_argument("--seq-parallel", type=int, default=1, metavar="N",
                    help="shard every Mamba layer's token sequence over N "
                         "devices (2-D data x seq mesh; composes with "
                         "--data-parallel — a capability the reference "
                         "lacks, SURVEY.md 2.6)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    # model-size overrides (debug/small-scale runs; defaults = BraTS recipe)
    ap.add_argument("--feats", type=int, nargs=4, default=[48, 96, 192, 384])
    ap.add_argument("--depths", type=int, nargs=4, default=[2, 2, 2, 2])
    ap.add_argument("--hidden-size", type=int, default=768)
    ap.add_argument("--num-slices", type=int, nargs=4,
                    default=[64, 32, 16, 8])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--print-config", action="store_true",
                    help="print the resolved run config (after --plan "
                         "overrides) and exit without training")
    ap.add_argument("--split", type=float, nargs=3, default=[0.7, 0.1, 0.2],
                    help="train/val/test fractions (seed-42 shuffle)")
    args = ap.parse_args()
    if args.cpu:
        import os as _os
        _os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from segmamba_tpu.data import get_train_val_test_loader_from_train
    from segmamba_tpu.models import SegMamba
    from segmamba_tpu.parallel import make_mesh
    from segmamba_tpu.train import Trainer

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    if args.plan:
        from segmamba_tpu.data.planning import load_plan
        plan = load_plan(args.plan)
        # the scan-kernel path wants multiples of the deepest stride (16);
        # round the plan's heuristic patch down to the model-legal grid
        patch = [max(32, (int(p) // 32) * 32) for p in plan["patch_size"]]
        print(f"plan patch_size {plan['patch_size']} -> model patch {patch}")
        args.patch = patch
        # nslices tracks the stage-0..3 depth-axis extents (reference ties
        # num_slices_list to the 128^3 recipe; scale it with the patch)
        args.num_slices = [max(1, patch[0] // (2 ** (i + 1)))
                           for i in range(4)]

    if args.print_config:
        import json
        print(json.dumps({"patch": list(args.patch),
                          "num_slices": list(args.num_slices),
                          "lr": args.lr, "loss": args.loss,
                          "dtype": args.dtype}))
        return

    # BraTS dice metric on TC/WT/ET composites (reference convert_labels,
    # 3_train.py:68-72)
    class BraTSTrainer(Trainer):
        def validation_step(self, state, batch):
            image, label = self.get_input(batch)
            logits = self._apply(state, jnp.asarray(image))
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            label = np.asarray(label)
            groups = [
                (pred == 1) | (pred == 3),               # TC
                (pred == 1) | (pred == 3) | (pred == 2),  # WT
                pred == 3,                               # ET
            ]
            gts = [
                (label == 1) | (label == 3),
                (label == 1) | (label == 3) | (label == 2),
                label == 3,
            ]
            dices = []
            for p, g in zip(groups, gts):
                if p.sum() > 0 and g.sum() > 0:
                    dices.append(float(2.0 * (p & g).sum() /
                                       (p.sum() + g.sum())))
                elif p.sum() == 0 and g.sum() == 0:
                    dices.append(1.0)
                else:
                    dices.append(0.0)
            return dices

        def validation_end(self, state, val_outputs):
            arr = np.asarray(val_outputs)
            tc, wt, et = arr.mean(axis=0)
            mean_dice = float((tc + wt + et) / 3)
            print(f"dices: tc={tc:.4f} wt={wt:.4f} et={et:.4f} "
                  f"mean={mean_dice:.4f}")
            for k, v in [("tc", tc), ("wt", wt), ("et", et),
                         ("mean_dice", mean_dice)]:
                self.logger.log(k, v, self.epoch)
            from segmamba_tpu.train import checkpoint as ckpt
            if mean_dice > self.best_mean_dice:
                self.best_mean_dice = mean_dice
                ckpt.save_new_and_delete_last(
                    state, self.model_save_path, "best_model", mean_dice,
                    self.epoch)
            ckpt.save_new_and_delete_last(
                state, self.model_save_path, "final_model", mean_dice,
                self.epoch)
            return mean_dice

    sp = args.seq_parallel
    if sp > 1:
        n_dev = len(jax.devices())
        dp = n_dev // sp if args.data_parallel else 1
        if dp * sp > n_dev or n_dev % sp != 0:
            raise SystemExit(f"--seq-parallel {sp} does not divide "
                             f"{n_dev} devices")
        mesh = make_mesh(dp * sp, ("data", "seq"), shape=(dp, sp))
        sp_kw = dict(mesh=mesh, seq_axis="seq",
                     batch_axis="data" if args.data_parallel else None)
    else:
        mesh = make_mesh() if args.data_parallel else None
        sp_kw = {}
    model = SegMamba(in_chans=4, out_chans=4, depths=tuple(args.depths),
                     feat_size=tuple(args.feats),
                     hidden_size=args.hidden_size,
                     num_slices_list=tuple(args.num_slices), dtype=dtype,
                     remat="convs", **sp_kw)
    trainer = BraTSTrainer(
        model, args.logdir, max_epochs=args.max_epochs,
        batch_size=args.batch_size, val_every=args.val_every,
        num_step_per_epoch=args.steps_per_epoch, val_number=args.val_number,
        patch_size=tuple(args.patch),
        augmentation=(True if args.augmentation == "default"
                      else args.augmentation),
        learning_rate=args.lr, scheduler_type="poly", loss=args.loss,
        num_classes=4, num_workers=args.num_workers, mesh=mesh,
        seed=args.seed, resume=args.resume)

    train_ds, val_ds, test_ds = get_train_val_test_loader_from_train(
        args.data_dir, train_rate=args.split[0], val_rate=args.split[1],
        test_rate=args.split[2])
    trainer.train(train_ds, val_ds)


if __name__ == "__main__":
    main()
