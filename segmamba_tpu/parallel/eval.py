"""Distributed evaluation helpers.

Rebuilds the reference's eval-side distributed utilities
(/root/reference/light_training/sampler.py: SequentialDistributedSampler
:5-41 pads the case list to a device multiple and assigns contiguous shards;
distributed_concat :44-48 all_gathers and truncates). In JAX the same
pattern is index arithmetic + ``jax.device_put``/gather — no process groups.
"""

from __future__ import annotations

import numpy as np
import jax


def sequential_shards(n_items, n_shards):
    """Contiguous per-shard index lists, padded (by wrap-around repetition)
    to equal length; (shards, keep_mask) where mask marks real items."""
    per = -(-n_items // n_shards)
    idx = list(range(n_items))
    padded = idx + idx[: per * n_shards - n_items]
    shards, mask = [], []
    for s in range(n_shards):
        chunk = padded[s * per:(s + 1) * per]
        shards.append(chunk)
        mask.append([s * per + i < n_items for i in range(per)])
    return shards, mask


def distributed_concat(per_shard_results, n_total):
    """Concatenate shard-ordered results and drop padding
    (sampler.py:44-48 semantics)."""
    flat = np.concatenate([np.asarray(r) for r in per_shard_results], axis=0)
    return flat[:n_total]


def eval_map(fn, items, n_shards=None):
    """Run ``fn`` over items sharded like SequentialDistributedSampler and
    reassemble in order. Host-side driver for per-case eval loops."""
    n_shards = n_shards or jax.device_count()
    shards, _ = sequential_shards(len(items), n_shards)
    results = [None] * len(items)
    for chunk in shards:
        for i in chunk:
            if results[i] is None:
                results[i] = fn(items[i])
    return results
