"""Trainer: epoch-driven training orchestrator.

Rebuilds the reference's ``light_training.trainer.Trainer``
(/root/reference/light_training/trainer.py:25-516) TPU-first:

- the DDP/torchrun/NCCL machinery (:76-107, launch.py) is replaced by a
  named-mesh pjit step — DP gradient averaging is inserted by XLA; no
  launcher, no process groups, no SyncBatchNorm conversion needed
  (the model is InstanceNorm-only).
- AMP autocast + GradScaler (:450-470) are replaced by bf16 compute with f32
  params — no loss scaling required on TPU.
- fixed epoch structure matches: ``num_step_per_epoch=250``,
  ``val_number=100`` patches (:58-59), val every ``val_every`` epochs with
  patch-wise dice (:268-322), poly/cosine/constant LR selection (:369-404),
  grad-clip 12 (:464).
- subclass hooks keep the same names: ``get_input``, ``training_step`` (via
  loss selection), ``validation_step``, ``validation_end``.
- checkpoints are full state (params+opt+step) with keep-best metric-named
  aliases — a strict upgrade over the reference's weight-only saves
  (SURVEY.md §5 checkpoint/resume gap).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from segmamba_tpu.data.augment import (
    get_train_transforms,
    get_train_transforms_noaug,
    get_train_transforms_nomirror,
    get_train_transforms_onlymirror,
    get_train_transforms_onlyspatial,
    get_validation_transforms,
)
from segmamba_tpu.data.loader import DataLoader
from segmamba_tpu.data.patch_sampler import PatchSampler
from segmamba_tpu.train import checkpoint as ckpt
from segmamba_tpu.train.lr_schedules import (
    constant_with_warmup_schedule,
    cosine_with_warmup_schedule,
    poly_schedule,
)
from segmamba_tpu.train.train_state import (
    create_train_state,
    default_optimizer,
    train_step,
)
from segmamba_tpu.utils.logging import MetricLogger
from segmamba_tpu.utils.misc import set_determinism
from segmamba_tpu.utils.profiling import StepTimer


def _pick_transform(augmentation):
    if augmentation == "device":
        # raw patches stream to the chip; the chain runs inside the jitted
        # train step (data/augment_device.py) — host keeps only the memmap
        # crop. RemoveLabel(-1) happens on device.
        return None
    if augmentation in (True, "default"):
        return get_train_transforms()
    if augmentation == "nomirror":
        return get_train_transforms_nomirror()
    if augmentation == "onlymirror":
        return get_train_transforms_onlymirror()
    if augmentation == "onlyspatial":
        return get_train_transforms_onlyspatial()
    return get_train_transforms_noaug()


def _prefetch(iterator, n=2):
    """Move host batches to device arrays from a background thread so the
    host->device transfer overlaps the previous step's device time (the
    reference relies on pin_memory + CUDA async copies for the same overlap,
    trainer.py:159-162)."""
    import queue as queue_mod
    import threading

    q = queue_mod.Queue(maxsize=n)
    err = []

    def produce():
        try:
            for b in iterator:
                q.put({k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                       for k, v in b.items()})
        except Exception as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is None:
            break
        yield b
    if err:
        raise err[0]


class Trainer:
    def __init__(self, model, logdir, *, max_epochs=1000, batch_size=2,
                 val_every=2, num_step_per_epoch=250, val_number=100,
                 patch_size=(128, 128, 128), augmentation=True,
                 learning_rate=1e-2, scheduler_type="poly", loss="ce",
                 num_classes=4, num_workers=8, mesh=None, seed=42,
                 resume=False):
        self.model = model
        self.logdir = logdir
        self.model_save_path = os.path.join(logdir, "model")
        self.max_epochs = max_epochs
        self.batch_size = batch_size
        self.val_every = val_every
        self.num_step_per_epoch = num_step_per_epoch
        self.val_number = val_number
        self.patch_size = tuple(patch_size)
        self.augmentation = augmentation
        self.learning_rate = learning_rate
        self.scheduler_type = scheduler_type
        self.loss = loss
        self.num_classes = num_classes
        self.num_workers = num_workers
        self.mesh = mesh
        self.seed = seed
        self.resume = resume
        self.global_step = 0
        self.epoch = 0
        self.best_mean_dice = 0.0
        self.logger = MetricLogger(logdir)
        self.timer = StepTimer()
        self._jitted_apply = None

    def _apply(self, state, image):
        """Jitted forward, cached once (a fresh jax.jit wrapper per call
        would retrace every validation step)."""
        if self._jitted_apply is None:
            import jax as _jax
            self._jitted_apply = _jax.jit(state.apply_fn)
        return self._jitted_apply(state.params, image)

    # -- hooks (reference trainer.py:485-492) -----------------------------

    def get_input(self, batch):
        return batch["image"], batch["label"]

    def validation_step(self, state, batch):
        """Patch forward + per-class dice on argmax (3_train.py:93-119)."""
        image, label = self.get_input(batch)
        logits = self._apply(state, jnp.asarray(image))
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        label = np.asarray(label)
        dices = []
        for c in range(1, self.num_classes):
            p, g = pred == c, label == c
            if g.sum() > 0 and p.sum() > 0:
                d = 2.0 * (p & g).sum() / (p.sum() + g.sum())
            elif g.sum() == 0 and p.sum() == 0:
                d = 1.0
            else:
                d = 0.0
            dices.append(float(d))
        return dices

    def validation_end(self, state, val_outputs):
        per_class = np.asarray(val_outputs)  # (n_batches, n_classes-1)
        means = per_class.mean(axis=0)
        mean_dice = float(means.mean())
        for i, m in enumerate(means):
            self.logger.log(f"dice_class_{i + 1}", m, self.epoch)
        self.logger.log("mean_dice", mean_dice, self.epoch)
        if mean_dice > self.best_mean_dice:
            self.best_mean_dice = mean_dice
            ckpt.save_new_and_delete_last(
                state, self.model_save_path, "best_model", mean_dice,
                self.epoch)
        ckpt.save_new_and_delete_last(
            state, self.model_save_path, "final_model", mean_dice, self.epoch)
        if (self.epoch + 1) % 100 == 0:
            ckpt.save_checkpoint(
                state,
                os.path.join(self.model_save_path,
                             f"tmp_model_ep{self.epoch}_{mean_dice:.4f}"),
                epoch=self.epoch, metric=mean_dice)
        return mean_dice

    # -- internals ---------------------------------------------------------

    def _schedule(self):
        max_steps = self.max_epochs * self.num_step_per_epoch
        if self.scheduler_type == "poly":
            return poly_schedule(self.learning_rate, max_steps)
        if self.scheduler_type == "cosine_with_warmup":
            return cosine_with_warmup_schedule(
                self.learning_rate, max_steps, max_steps // 100)
        if self.scheduler_type == "constant_with_warmup":
            return constant_with_warmup_schedule(
                self.learning_rate, max_steps // 100)
        if self.scheduler_type is None or self.scheduler_type == "constant":
            return self.learning_rate
        raise ValueError(f"unknown scheduler {self.scheduler_type!r}")

    def _build_loaders(self, train_ds, val_ds):
        train_sampler = PatchSampler(
            train_ds, self.patch_size, batch_size=self.batch_size,
            rng=np.random.default_rng(self.seed))
        train_loader = DataLoader(
            train_sampler, transform=_pick_transform(self.augmentation),
            num_workers=self.num_workers, steps_per_epoch=self.num_step_per_epoch,
            seed=self.seed)
        val_loader = None
        if val_ds is not None and len(val_ds) > 0:
            val_sampler = PatchSampler(
                val_ds, self.patch_size, batch_size=1,
                oversample_foreground_percent=1.0,
                rng=np.random.default_rng(self.seed + 1))
            val_loader = DataLoader(
                val_sampler, transform=get_validation_transforms(),
                num_workers=min(self.num_workers, 6),
                steps_per_epoch=self.val_number, seed=self.seed + 1)
        return train_loader, val_loader

    def train(self, train_dataset, val_dataset=None):
        set_determinism(self.seed)
        sample = jnp.zeros((1, *self.patch_size,
                            train_dataset[0]["data"].shape[0]), jnp.float32)
        optimizer = default_optimizer(self._schedule())
        state = create_train_state(self.model, jax.random.key(self.seed),
                                   sample, optimizer=optimizer,
                                   mesh=self.mesh)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(state.params))
        print(f"model parameters: {n_params / 1e6:.2f} M")

        start_epoch = 0
        if self.resume:
            path = ckpt.find_checkpoint(self.model_save_path, "final_model")
            if path:
                state, start_epoch = ckpt.restore_checkpoint(state, path)
                self.global_step = int(state.step)
                print(f"resumed from {path} at epoch {start_epoch}")

        train_loader, val_loader = self._build_loaders(train_dataset,
                                                       val_dataset)
        try:
            for epoch in range(start_epoch, self.max_epochs):
                self.epoch = epoch
                state = self.train_epoch(state, train_loader)
                if val_loader is not None and (epoch + 1) % self.val_every == 0:
                    outs = self.validate(state, val_loader)
                    self.validation_end(state, outs)
        finally:
            train_loader.stop()
            if val_loader is not None:
                val_loader.stop()
            self.logger.close()
        return state

    def validate(self, state, val_loader):
        """Run ``validation_step`` over the val stream, fanned out across
        local devices via ``parallel.eval.eval_map`` when more than one is
        present — the reference shards eval cases with
        SequentialDistributedSampler and all_gathers the results
        (trainer.py:301-310, sampler.py:5-48). Batches are grouped to
        bound host memory; order is preserved."""
        devices = jax.local_devices()
        if len(devices) == 1:
            return [self.validation_step(state, b) for b in val_loader]
        from segmamba_tpu.parallel.eval import eval_map

        outs, group = [], []
        for batch in val_loader:
            group.append(batch)
            if len(group) == len(devices):
                outs.extend(eval_map(
                    lambda b: self.validation_step(state, b), group,
                    devices=devices))
                group = []
        if group:
            outs.extend(eval_map(
                lambda b: self.validation_step(state, b), group,
                devices=devices[:len(group)]))
        return outs

    def train_epoch(self, state, train_loader):
        t_epoch = time.time()
        device_aug = self.augmentation == "device"
        aug_base = jax.random.key(self.seed + 7) if device_aug else None
        for batch in _prefetch(iter(train_loader)):
            self.timer.mark("step")
            state, metrics = train_step(
                state, {"image": batch["image"], "label": batch["label"]},
                mesh=self.mesh, num_classes=self.num_classes, loss=self.loss,
                augment_key=(jax.random.fold_in(aug_base, self.global_step)
                             if device_aug else None))
            self.global_step += 1
            if self.global_step % 10 == 0:
                self.logger.log("training_loss", metrics["loss"],
                                self.global_step)
                self.logger.log("grad_norm", metrics["grad_norm"],
                                self.global_step)
            self.timer.elapsed("step_time", "step")
        print(f"epoch {self.epoch} done in {time.time() - t_epoch:.1f}s "
              f"(loss {float(metrics['loss']):.4f})")
        return state
