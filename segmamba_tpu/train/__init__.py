"""Training subsystem: losses, LR schedules, train state/step, trainer."""

from segmamba_tpu.train.losses import (
    cross_entropy_loss,
    dice_and_bce_loss,
    dice_and_ce_loss,
    soft_dice_loss,
)
from segmamba_tpu.train.lr_schedules import (
    constant_with_warmup_schedule,
    cosine_with_warmup_schedule,
    linear_warmup_cosine_annealing,
    poly_schedule,
)
from segmamba_tpu.train.train_state import TrainState, create_train_state, train_step
from segmamba_tpu.train.trainer import Trainer

__all__ = [
    "cross_entropy_loss",
    "soft_dice_loss",
    "dice_and_ce_loss",
    "dice_and_bce_loss",
    "poly_schedule",
    "cosine_with_warmup_schedule",
    "constant_with_warmup_schedule",
    "linear_warmup_cosine_annealing",
    "TrainState",
    "create_train_state",
    "train_step",
    "Trainer",
]
