"""Segmentation losses.

Rebuilds the reference loss inventory (/root/reference/light_training/loss/):
- ``cross_entropy_loss`` — the loss the BraTS recipe actually trains with
  (plain ``nn.CrossEntropyLoss``, 3_train.py:48,62), with ignore-index
  semantics of ``RobustCrossEntropyLoss`` (loss/robust_ce_loss.py:6-16).
- ``soft_dice_loss`` — nnU-Net SoftDiceLoss / MemoryEfficientSoftDiceLoss
  (loss/dice.py:9-117): per-class soft dice over batch or per-sample, with
  smooth term and background skip.
- ``dice_and_ce_loss`` — DC_and_CE_loss compound (loss/compound_losses.py:8-57).
- ``topk_loss`` — TopKLoss (loss/robust_ce_loss.py:19-29).
- ``deep_supervision_loss`` — DeepSupervisionWrapper with the nnU-Net
  halving weight scheme (loss/deepsupervision.py:5-38).

All take channels-last logits ``(batch, *spatial, C)`` and integer labels
``(batch, *spatial)``. Label value -1 is ignored (the reference marks
out-of-bounds voxels -1 and removes them, augment/train_augment.py:59).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _one_hot(labels, num_classes):
    return jax.nn.one_hot(jnp.maximum(labels, 0), num_classes,
                          dtype=jnp.float32)


def cross_entropy_loss(logits, labels, ignore_index: int = -1,
                       weights=None):
    """Mean softmax cross entropy over valid voxels."""
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index).astype(jnp.float32)
    lab = _one_hot(labels, num_classes)
    ce = optax.softmax_cross_entropy(logits.astype(jnp.float32), lab)
    if weights is not None:
        ce = ce * jnp.take(jnp.asarray(weights, jnp.float32),
                           jnp.maximum(labels, 0))
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def topk_loss(logits, labels, k_percent: float = 10.0, ignore_index: int = -1):
    """Mean CE over the hardest k% voxels (loss/robust_ce_loss.py:19-29)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    lab = _one_hot(labels, num_classes)
    ce = optax.softmax_cross_entropy(logits.astype(jnp.float32), lab)
    ce = jnp.where(valid, ce, -jnp.inf).reshape(-1)
    k = max(1, int(ce.size * k_percent / 100))
    top, _ = jax.lax.top_k(ce, k)
    top = jnp.where(jnp.isfinite(top), top, 0.0)
    return jnp.sum(top) / jnp.maximum(jnp.sum(jnp.isfinite(top)), 1)


def soft_dice_loss(logits, labels, smooth: float = 1e-5,
                   include_background: bool = True,
                   batch_dice: bool = False, ignore_index: int = -1,
                   apply_softmax: bool = True):
    """nnU-Net soft dice: 1 - mean_c (2·tp + s) / (2·tp + fp + fn + s).

    ``batch_dice`` pools statistics over the batch like nnU-Net's ddp dice
    (loss/dice.py: batch_dice flag).
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) \
        if apply_softmax else logits.astype(jnp.float32)
    valid = (labels != ignore_index)[..., None].astype(jnp.float32)
    lab = _one_hot(labels, num_classes) * valid
    probs = probs * valid

    axes = tuple(range(0 if batch_dice else 1, logits.ndim - 1))
    tp = jnp.sum(probs * lab, axis=axes)
    fp = jnp.sum(probs * (1 - lab), axis=axes)
    fn = jnp.sum((1 - probs) * lab, axis=axes)
    if not include_background:
        tp, fp, fn = tp[..., 1:], fp[..., 1:], fn[..., 1:]
    dc = (2 * tp + smooth) / jnp.maximum(2 * tp + fp + fn + smooth, 1e-8)
    return 1.0 - jnp.mean(dc)


def dice_and_ce_loss(logits, labels, weight_ce: float = 1.0,
                     weight_dice: float = 1.0, ignore_index: int = -1,
                     include_background: bool = True,
                     batch_dice: bool = False):
    """DC_and_CE compound (loss/compound_losses.py:8-57)."""
    ce = cross_entropy_loss(logits, labels, ignore_index)
    dc = soft_dice_loss(logits, labels, ignore_index=ignore_index,
                        include_background=include_background,
                        batch_dice=batch_dice)
    return weight_ce * ce + weight_dice * dc


def dice_and_bce_loss(logits, region_labels, weight_ce: float = 1.0,
                      weight_dice: float = 1.0):
    """DC_and_BCE for region-based (possibly overlapping) targets
    (loss/compound_losses.py:60-105): sigmoid per channel + soft dice on
    sigmoid probabilities. ``region_labels``: (batch, *spatial, C) binary."""
    lf = logits.astype(jnp.float32)
    lab = region_labels.astype(jnp.float32)
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(lf, lab))
    probs = jax.nn.sigmoid(lf)
    axes = tuple(range(1, logits.ndim - 1))
    tp = jnp.sum(probs * lab, axis=axes)
    fp = jnp.sum(probs * (1 - lab), axis=axes)
    fn = jnp.sum((1 - probs) * lab, axis=axes)
    dc = (2 * tp + 1e-5) / jnp.maximum(2 * tp + fp + fn + 1e-5, 1e-8)
    return weight_ce * bce + weight_dice * (1.0 - jnp.mean(dc))


def deep_supervision_loss(loss_fn, logits_list, labels_list):
    """Weighted multi-scale loss: weights 1, 1/2, 1/4, ... normalized
    (loss/deepsupervision.py:5-38)."""
    n = len(logits_list)
    w = jnp.asarray([0.5 ** i for i in range(n)])
    w = w / jnp.sum(w)
    total = 0.0
    for i, (lo, la) in enumerate(zip(logits_list, labels_list)):
        total = total + w[i] * loss_fn(lo, la)
    return total
