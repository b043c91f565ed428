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


def eval_map(fn, items, n_shards=None, devices=None):
    """Run ``fn`` over items sharded like SequentialDistributedSampler,
    each shard pinned to one local device and driven from its own thread,
    and reassemble in order.

    Per-case eval work is shape-dynamic (whole volumes), so it cannot be
    batched into one program; instead each shard's host thread dispatches
    its cases under ``jax.default_device(dev)`` — async dispatch overlaps
    the device work across all local chips (the reference's
    SequentialDistributedSampler+DDP achieves the same with one process
    per GPU, light_training/sampler.py:5-41). Wrap-around padding indices
    (torch needs them for lockstep collectives) are simply skipped here.
    """
    import threading

    devices = list(devices if devices is not None else jax.local_devices())
    n_shards = n_shards or len(devices)
    shards, _ = sequential_shards(len(items), n_shards)
    results = [None] * len(items)
    claimed = [False] * len(items)
    lock = threading.Lock()
    errors = []

    def run_shard(s, chunk):
        dev = devices[s % len(devices)]
        try:
            for i in chunk:
                with lock:
                    if claimed[i]:
                        continue
                    claimed[i] = True
                with jax.default_device(dev):
                    results[i] = fn(items[i])
        except BaseException as e:  # re-raised in the caller after join
            with lock:
                errors.append((s, e))

    if len(shards) == 1:
        run_shard(0, shards[0])
        if errors:
            raise errors[0][1]
        return results
    threads = [threading.Thread(target=run_shard, args=(s, chunk))
               for s, chunk in enumerate(shards)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        s, err = errors[0]
        raise RuntimeError(
            f"eval_map: shard {s} failed ({len(errors)} shard(s) total); "
            "results are incomplete") from err
    return results
