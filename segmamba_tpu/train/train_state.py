"""Train state and the pjit data-parallel train step.

Replaces the reference's DDP/AMP/GradScaler loop internals
(/root/reference/light_training/trainer.py:450-477): on TPU the params stay
float32, the model computes in bfloat16 (so no loss scaling is needed), the
gradient mean over the data axis is inserted by XLA from sharding
annotations, and grad-clip 12 + SGD(nesterov, momentum 0.99) mirror
3_train.py:51-54 / trainer.py:464.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state

from segmamba_tpu.parallel.mesh import replicated, shard_batch
from segmamba_tpu.train.losses import cross_entropy_loss, dice_and_ce_loss


class TrainState(flax_train_state.TrainState):
    """Flax TrainState; lr schedule is carried inside the optax chain."""


def default_optimizer(learning_rate, grad_clip: float = 12.0,
                      momentum: float = 0.99, nesterov: bool = True,
                      weight_decay: float = 3e-5):
    """SGD recipe of 3_train.py:51-54 (+ trainer.py:464 grad clip).

    ``learning_rate`` may be a float or an optax schedule.
    """
    parts = [optax.clip_by_global_norm(grad_clip)]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate, momentum=momentum,
                           nesterov=nesterov))
    return optax.chain(*parts)


def create_train_state(model, rng, sample_x, learning_rate=1e-2,
                       optimizer=None, mesh=None,
                       model_axis=None, params=None) -> TrainState:
    """``model_axis``: when it names an axis of ``mesh``, Mamba-inner
    params (and their optimizer momentum) are sharded over it —
    tensor parallelism via parallel/tp.py; everything else replicates.

    ``params``: pre-initialized parameter tree to reuse (skips the init
    compile — the tree does not depend on the mesh wiring, so one init can
    serve several differently-sharded states)."""
    if params is None:
        params = jax.jit(model.init)(rng, sample_x)
    tx = optimizer if optimizer is not None else default_optimizer(learning_rate)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    if mesh is not None:
        if model_axis is not None:
            from segmamba_tpu.parallel.tp import tp_shard
            state = tp_shard(state, mesh, model_axis)
        else:
            state = jax.device_put(state, replicated(mesh))
    return state


def make_loss_fn(loss: str = "ce", num_classes: int = 4) -> Callable:
    if loss == "ce":
        return lambda logits, labels: cross_entropy_loss(logits, labels)
    if loss == "dice_ce":
        return lambda logits, labels: dice_and_ce_loss(logits, labels)
    raise ValueError(f"unknown loss {loss!r}")


@functools.partial(jax.jit, static_argnames=("num_classes", "loss",
                                             "augment"),
                   donate_argnames=("state",))
def _train_step(state: TrainState, batch: dict, num_classes: int,
                loss: str, augment: bool = False,
                augment_key=None) -> tuple[TrainState, dict]:
    if augment:
        # on-device augmentation fused into the step (data/augment_device.py)
        # — the 1-core host cannot run the numpy chain at chip speed
        from segmamba_tpu.data.augment_device import device_augment
        image, label = device_augment(batch["image"], batch["label"],
                                      augment_key)
        batch = {"image": image, "label": label}
    loss_fn = make_loss_fn(loss, num_classes)

    def compute_loss(params):
        logits = state.apply_fn(params, batch["image"])
        return loss_fn(logits, batch["label"])

    loss_val, grads = jax.value_and_grad(compute_loss)(state.params)
    gnorm = optax.global_norm(grads)
    state = state.apply_gradients(grads=grads)
    return state, {"loss": loss_val, "grad_norm": gnorm}


def train_step(state, batch, *, mesh=None, num_classes=4, loss="ce",
               augment_key=None):
    """One optimization step. With a mesh, the batch is sharded over the
    'data' axis and params replicated — XLA inserts the gradient all-reduce.
    ``augment_key``: when given, the device augmentation chain runs inside
    the jitted step on the raw patches."""
    if mesh is not None:
        batch = shard_batch(batch, mesh)
    return _train_step(state, batch, num_classes, loss,
                       augment=augment_key is not None,
                       augment_key=augment_key)


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def eval_step(apply_fn, params, image):
    """Forward only, argmax labels (validation path, 3_train.py:93-119)."""
    logits = apply_fn(params, image)
    return jnp.argmax(logits, axis=-1)
