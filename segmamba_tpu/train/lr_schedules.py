"""LR schedules as optax-compatible callables.

Rebuilds /root/reference/light_training/utils/lr_scheduler.py:
- ``poly_schedule``      — nnU-Net PolyLRScheduler, (1 - t/T)^0.9 (:22-38)
- ``poly_with_warmup``   — WarmupPolyLR variant (:40+)
- ``cosine_with_warmup_schedule`` / ``constant_with_warmup_schedule`` (:60-144)
- ``linear_warmup_cosine_annealing`` — LinearWarmupCosineAnnealingLR (:146-222)
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_schedule(base_lr: float, max_steps: int, exponent: float = 0.9):
    def schedule(step):
        frac = jnp.clip(step / max_steps, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** exponent
    return schedule


def poly_with_warmup(base_lr: float, max_steps: int, warmup_steps: int,
                     exponent: float = 0.9):
    def schedule(step):
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        frac = jnp.clip((step - warmup_steps) /
                        jnp.maximum(max_steps - warmup_steps, 1), 0.0, 1.0)
        poly = base_lr * (1.0 - frac) ** exponent
        return jnp.where(step < warmup_steps, warm, poly)
    return schedule


def cosine_with_warmup_schedule(base_lr: float, max_steps: int,
                                warmup_steps: int, num_cycles: float = 0.5):
    def schedule(step):
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) /
                            jnp.maximum(max_steps - warmup_steps, 1), 0.0, 1.0)
        cos = base_lr * jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return jnp.where(step < warmup_steps, warm, cos)
    return schedule


def constant_with_warmup_schedule(base_lr: float, warmup_steps: int):
    def schedule(step):
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, base_lr)
    return schedule


def linear_warmup_cosine_annealing(base_lr: float, max_epochs: int,
                                   warmup_epochs: int,
                                   warmup_start_lr: float = 0.0,
                                   eta_min: float = 0.0):
    def schedule(epoch):
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * epoch / \
            jnp.maximum(warmup_epochs, 1)
        progress = jnp.clip((epoch - warmup_epochs) /
                            jnp.maximum(max_epochs - warmup_epochs, 1),
                            0.0, 1.0)
        cos = eta_min + (base_lr - eta_min) * 0.5 * \
            (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(epoch < warmup_epochs, warm, cos)
    return schedule
