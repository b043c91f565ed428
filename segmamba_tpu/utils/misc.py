"""Determinism helpers.

Replaces the reference's ``monai.utils.set_determinism(seed)``
(/root/reference/monai/utils/misc.py:316, used at 3_train.py:11 and
trainer.py:331 as ``42 + rank``): in JAX, device-side randomness is explicit
PRNG keys, so this only needs to pin host-side numpy/python RNGs and hand
back a root key.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def set_determinism(seed: int = 42):
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)
