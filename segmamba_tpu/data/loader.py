"""Host-side parallel batch pipeline feeding the TPU.

Replaces the reference's batchgenerators ``NonDetMultiThreadedAugmenter``
with 18 producer processes and 6 cached batches
(/root/reference/light_training/trainer.py:154-162,
light_training/augment/multi_processor.py:4-10): worker processes each own a
``PatchSampler`` + transform chain and push finished batches into a bounded
queue; the consumer side exposes a fixed-length iterator per epoch
(``LimitedLenWrapper`` semantics). Channels-first host batches are converted
to the framework's channels-last device layout at the edge.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import threading

import numpy as np


def _worker_loop(sampler, transform, out_queue, seed, stop_event):
    rng = np.random.default_rng(seed)
    sampler.rng = rng
    while not stop_event.is_set():
        batch = sampler.generate_train_batch()
        if transform is not None:
            batch = transform(batch, rng)
        batch.pop("properties", None)  # not picklable-cheap; loaders drop it
        while not stop_event.is_set():
            try:
                out_queue.put(batch, timeout=0.5)
                break
            except queue_mod.Full:
                continue


class DataLoader:
    """num_workers producer processes -> bounded queue -> fixed-len iterator.

    With ``num_workers=0`` everything runs inline (deterministic tests).
    """

    def __init__(self, sampler, transform=None, num_workers=8,
                 num_cached=6, seed=42, steps_per_epoch=250,
                 channels_last=True, use_processes=True):
        self.sampler = sampler
        self.transform = transform
        self.num_workers = num_workers
        self.num_cached = num_cached
        self.seed = seed
        self.steps_per_epoch = steps_per_epoch
        self.channels_last = channels_last
        self.use_processes = use_processes
        self._workers = []
        self._queue = None
        self._stop = None
        self._rng = np.random.default_rng(seed)

    # -- lifecycle --------------------------------------------------------

    def start(self):
        if self.num_workers <= 0 or self._workers:
            return
        if self.use_processes:
            ctx = mp.get_context("fork")
            self._queue = ctx.Queue(maxsize=self.num_cached)
            self._stop = ctx.Event()
            make = ctx.Process
        else:
            self._queue = queue_mod.Queue(maxsize=self.num_cached)
            self._stop = threading.Event()
            make = threading.Thread
        for i in range(self.num_workers):
            w = make(target=_worker_loop,
                     args=(self.sampler, self.transform, self._queue,
                           self.seed + i, self._stop),
                     daemon=True)
            w.start()
            self._workers.append(w)

    def stop(self):
        if self._stop is not None:
            self._stop.set()
        for w in self._workers:
            w.join(timeout=2.0)
            if hasattr(w, "terminate") and w.is_alive():
                w.terminate()
        self._workers = []
        self._queue = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    # -- iteration --------------------------------------------------------

    def _next_batch(self):
        if self.num_workers <= 0:
            batch = self.sampler.generate_train_batch()
            if self.transform is not None:
                batch = self.transform(batch, self._rng)
            batch.pop("properties", None)
        else:
            dead = [w for w in self._workers if not w.is_alive()]
            if dead and self._queue.empty():
                raise RuntimeError(
                    f"{len(dead)} data worker(s) died; see worker stderr "
                    "(reference watchdog: default_preprocessor.py:515-523)")
            batch = self._queue.get()
        return self._to_device_layout(batch)

    def _to_device_layout(self, batch):
        """(B, C, Z, Y, X) host -> (B, Z, Y, X, C) device layout; seg to
        integer labels (B, Z, Y, X)."""
        if not self.channels_last:
            return batch
        out = {"image": np.moveaxis(batch["data"], 1, -1)}
        if "seg" in batch:
            out["label"] = batch["seg"][:, 0].astype(np.int32)
        if "keys" in batch:
            out["keys"] = batch["keys"]
        return out

    def __iter__(self):
        self.start()
        for _ in range(self.steps_per_epoch):
            yield self._next_batch()

    def __len__(self):
        return self.steps_per_epoch
