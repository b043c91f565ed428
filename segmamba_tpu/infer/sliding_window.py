"""Sliding-window inference as one jitted device program.

Rebuilds the semantics of the vendored MONAI inferer the reference evaluates
with (/root/reference/monai/inferers/utils.py:43-321 — scan-interval grid
:174-175, gaussian importance map :194-211, weighted accumulate + count-map
divide :251-299, pad-if-smaller :163-171; class wrapper
monai/inferers/inferer.py:382-536) — but TPU-first: the whole volume lives in
HBM, a ``lax.scan`` walks window batches, windows are gathered with
``dynamic_slice`` and written back with read-modify-write
``dynamic_update_slice``. One compile per padded volume shape; volumes are
padded up to a shape bucket (multiple of ``bucket``) so a whole dataset
reuses a handful of compiles instead of one per case.

Two dispatch/compile trade-offs for the fused single-program path, selected
by ``in_graph_pad``: with host-side padding (the default for varying case
shapes) the program is keyed on the BUCKETED shape, so a dataset of
per-case bbox-cropped volumes (the 4_predict.py flow) shares a handful of
compiles at the cost of two extra device dispatches per case (pad, crop);
with in-graph padding (fixed-shape serving, e.g. a benchmark repeating one
case) the whole case is exactly ONE dispatch but the program is keyed on
the exact unpadded shape — every new case shape recompiles.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _scan_starts(image_size, roi_size, overlap):
    """Window start offsets per dim (monai _get_scan_interval +
    dense_patch_slices semantics)."""
    starts = []
    for im, roi in zip(image_size, roi_size):
        if roi >= im:
            starts.append([0])
            continue
        interval = max(1, int(roi * (1 - overlap)))
        n = int(math.ceil((im - roi) / interval)) + 1
        starts.append(sorted({min(i * interval, im - roi) for i in range(n)}))
    grid = np.stack(np.meshgrid(*starts, indexing="ij"), -1).reshape(-1, 3)
    return grid.astype(np.int32)


def gaussian_importance_map(roi_size, sigma_scale=0.125, dtype=np.float32):
    """Separable gaussian, peak 1, zero-free.

    Matches the reference's blending weights exactly up to a global scalar
    (monai/data/utils.py:1088-1139 compute_importance_map): the raw map is
    clamped at ``max(min_value, 1e-3)`` — which also keeps the float32
    corner weights from underflowing (~1e-21 raw at a 128^3 roi) — and the
    peak normalization applied afterwards cancels in the out/count divide."""
    maps = []
    for s in roi_size:
        center = (s - 1) / 2.0
        sigma = max(s * sigma_scale, 1e-3)
        x = np.arange(s, dtype=np.float64)
        maps.append(np.exp(-0.5 * ((x - center) / sigma) ** 2))
    m = maps[0][:, None, None] * maps[1][None, :, None] * maps[2][None, None, :]
    m = np.maximum(m, max(float(m.min()), 1e-3))
    return (m / m.max()).astype(dtype)


@functools.partial(jax.jit, static_argnames=("roi_size",))
def _gather_group(volume, starts, roi_size):
    rz, ry, rx = roi_size

    def gather(s):
        return lax.dynamic_slice(volume, (s[0], s[1], s[2], 0),
                                 (rz, ry, rx, volume.shape[-1]))

    return jax.vmap(gather)(starts)


@functools.partial(jax.jit, static_argnames=("vol_shape", "sw_batch_size"))
def _scatter_all(logits_all, starts, wmask, importance, vol_shape,
                 sw_batch_size):
    """One program scattering EVERY window group: lax.scan over groups
    into zero-initialized accumulators, final count-divide included.
    logits_all: (n_groups, sw, rz, ry, rx, K)."""
    Z, Y, X = vol_shape
    rz, ry, rx = logits_all.shape[2:5]
    num_classes = logits_all.shape[-1]
    out = jnp.zeros((Z, Y, X, num_classes), jnp.float32)
    cnt = jnp.zeros((Z, Y, X, 1), jnp.float32)
    imp = importance.astype(jnp.float32)[..., None]

    def body(carry, group):
        out, cnt = carry
        logits, s, m = group
        w = imp[None] * m[:, None, None, None, None]
        contrib = logits * w
        for i in range(sw_batch_size):
            idx = (s[i, 0], s[i, 1], s[i, 2], 0)
            cur = lax.dynamic_slice(out, idx, (rz, ry, rx, num_classes))
            out = lax.dynamic_update_slice(out, cur + contrib[i], idx)
            curc = lax.dynamic_slice(cnt, idx, (rz, ry, rx, 1))
            cnt = lax.dynamic_update_slice(cnt, curc + w[i], idx)
        return (out, cnt), None

    (out, cnt), _ = lax.scan(body, (out, cnt), (logits_all, starts, wmask))
    return out / jnp.maximum(cnt, 1e-8)


def _sliding_window_hostloop(volume, starts, wmask, importance, pred_args,
                             predictor, roi_size, sw_batch_size,
                             num_classes, tta_flips=None):
    """Python loop over window groups issuing two small device programs
    per group (gather / model forward), then ONE scatter program over all
    collected logits. The split is forced where jit programs travel a
    size-limited remote-compile hop: the model program alone sits near
    the relay's payload limit, so even welding the (tiny) gather onto it
    gets an HTTP 413. Collapsing the per-group scatters into one scan
    program cuts the per-case dispatch count by a third; one executable
    per shape is reused across all groups and cases."""
    del num_classes  # taken from the logits
    Z, Y, X, _ = volume.shape
    imp = jnp.asarray(importance)
    logits = []
    for g in range(starts.shape[0]):
        s = jnp.asarray(starts[g])
        wins = _gather_group(volume, s, roi_size)
        if tta_flips:
            import itertools
            combos = [()]
            for r in range(1, len(tta_flips) + 1):
                combos.extend(itertools.combinations(tta_flips, r))
            acc = 0.0
            for c in combos:
                ax = tuple(a + 1 for a in c)
                w = jnp.flip(wins, ax) if ax else wins
                o = predictor(*pred_args, w).astype(jnp.float32)
                acc = acc + (jnp.flip(o, ax) if ax else o)
            logits.append(acc / len(combos))
        else:
            logits.append(predictor(*pred_args, wins).astype(jnp.float32))
    return _scatter_all(jnp.stack(logits), jnp.asarray(starts),
                        jnp.asarray(wmask), imp, (Z, Y, X), sw_batch_size)


def _importance_device(roi_size, mode, dtype=jnp.float32):
    """Build the blending map IN-GRAPH (separable outer product) so the fused
    program does not carry an 8MB roi-sized array as an input — the remote-
    compile hop this container tunnels through caps the request size, and
    the request scales with the program's argument/result buffers."""
    if mode != "gaussian":
        return jnp.ones((*roi_size, 1), dtype)
    axes = []
    for s in roi_size:
        center = (s - 1) / 2.0
        sigma = max(s * 0.125, 1e-3)
        x = jnp.arange(s, dtype=jnp.float32)
        axes.append(jnp.exp(-0.5 * ((x - center) / sigma) ** 2))
    m = (axes[0][:, None, None] * axes[1][None, :, None]
         * axes[2][None, None, :])
    # monai clamp semantics (same as the host build above); raw f32 corner
    # values at 128^3 are ~5e-11 — representable, the clamp lifts them
    m = jnp.maximum(m, jnp.maximum(jnp.min(m), 1e-3))
    m = m / jnp.max(m)
    return m.astype(dtype)[..., None]


def _tta_predict(predictor, pred_args, wins, tta_flips):
    """Mean over mirror flips of ``unflip(predictor(flip(wins)))`` — the
    reference's 8-combination mirror TTA (prediction.py:110-159) applied
    PER WINDOW instead of per volume pass. ``lax.fori_loop`` + ``switch``
    keep ONE copy of the model graph in the program (the fused case
    program must fit the remote-compile relay's size cap).

    Exact vs the volume-level protocol when the window grid is mirror-
    closed in every flipped dim (each start s has its mirror im-roi-s in
    the grid — true for the BraTS bucket shapes); otherwise it is the same
    8-flip average computed on a mirrored window grid."""
    axes_combos = [()]
    import itertools
    for r in range(1, len(tta_flips) + 1):
        axes_combos.extend(itertools.combinations(tta_flips, r))
    # spatial dims of (sw, rz, ry, rx, C) windows are 1..3
    combos = [tuple(a + 1 for a in c) for c in axes_combos]

    def flipped(i, w):
        return lax.switch(i, [
            (lambda w, c=c: jnp.flip(w, c) if c else w) for c in combos], w)

    def body(i, acc):
        out = predictor(*pred_args, flipped(i, wins)).astype(jnp.float32)
        return acc + flipped(i, out)

    acc = lax.fori_loop(0, len(combos), body,
                        jnp.zeros(jax.eval_shape(
                            lambda w: predictor(*pred_args, w),
                            wins).shape, jnp.float32))
    return acc / len(combos)


@functools.partial(jax.jit, static_argnames=("predictor", "roi_size",
                                             "sw_batch_size", "num_classes",
                                             "mode", "pad_shape",
                                             "compute_dtype", "tta_flips"))
def _sliding_window_jit(volume, starts, wmask, pred_args, predictor,
                        roi_size, sw_batch_size, num_classes,
                        mode="gaussian", pad_shape=None, compute_dtype=None,
                        tta_flips=None):
    """volume: (Z, Y, X, C) UNPADDED; starts: (n_groups, sw, 3); wmask same
    leading. Padding to ``pad_shape`` and the final crop back both happen
    IN-GRAPH: through the remote-compile relay every extra dispatch costs
    ~25 ms/case, so the whole case is one program.

    ``pred_args`` (e.g. model params) MUST ride as jit arguments here, not
    as ``predictor`` closure captures: traced closure arrays lower into the
    program as dense MLIR constants — ~64MB of weights inlined into the
    module — which blows past the size cap of remote-compile hops (HTTP
    413) and bloats compile cache keys. As arguments they are just entry
    parameters."""
    if volume.ndim == 5:  # (1, Z, Y, X, C): squeeze in-graph (free)
        if volume.shape[0] != 1:
            raise ValueError(
                "sliding_window_inference expects batch size 1, got "
                f"volume shape {volume.shape}; run cases one at a time")
        volume = volume.reshape(volume.shape[1:])
    volume = volume.astype(jnp.float32)
    Zi, Yi, Xi, _ = volume.shape
    if pad_shape is not None:
        pz, py, px = pad_shape
        volume = jnp.pad(volume, ((0, pz - Zi), (0, py - Yi),
                                  (0, px - Xi), (0, 0)))
    if compute_dtype is not None:
        volume = volume.astype(compute_dtype)
    Z, Y, X, _ = volume.shape
    rz, ry, rx = roi_size
    out = jnp.zeros((Z, Y, X, num_classes), jnp.float32)
    cnt = jnp.zeros((Z, Y, X, 1), jnp.float32)
    imp = _importance_device(roi_size, mode)         # (rz, ry, rx, 1)

    def gather(s):
        return lax.dynamic_slice(
            volume, (s[0], s[1], s[2], 0),
            (rz, ry, rx, volume.shape[-1]))

    def body(carry, group):
        out, cnt = carry
        s, m = group                       # (sw, 3), (sw,)
        wins = jax.vmap(gather)(s)         # (sw, rz, ry, rx, C)
        if tta_flips:
            logits = _tta_predict(predictor, pred_args, wins, tta_flips)
        else:
            logits = predictor(*pred_args, wins).astype(jnp.float32)
        w = imp[None] * m[:, None, None, None, None]
        contrib = logits * w
        for i in range(sw_batch_size):
            idx = (s[i, 0], s[i, 1], s[i, 2], 0)
            cur = lax.dynamic_slice(out, idx, (rz, ry, rx, num_classes))
            out = lax.dynamic_update_slice(out, cur + contrib[i], idx)
            curc = lax.dynamic_slice(cnt, idx, (rz, ry, rx, 1))
            cnt = lax.dynamic_update_slice(cnt, curc + w[i], idx)
        return (out, cnt), None

    (out, cnt), _ = lax.scan(body, (out, cnt), (starts, wmask))
    blended = out / jnp.maximum(cnt, 1e-8)
    # crop the padding off in-graph (saves a host-side slice dispatch)
    return lax.slice(blended, (0, 0, 0, 0), (Zi, Yi, Xi, num_classes))


def sliding_window_inference(volume, roi_size, predictor, overlap=0.5,
                             sw_batch_size=2, num_classes=None, bucket=32,
                             mode="gaussian", host_loop=None,
                             compute_dtype=None, predictor_args=None,
                             in_graph_pad=None, tta_flips=None):
    """Gaussian-blended sliding-window prediction.

    Args:
      volume:    (1, Z, Y, X, C) or (Z, Y, X, C) array.
      roi_size:  window size triple (the BraTS recipe uses 128^3,
                 4_predict.py:55).
      predictor: callable (B, *roi, C) -> (B, *roi, K) logits (jit-traceable).
      bucket:    volumes are zero-padded up to multiples of this so that jit
                 compiles are shared across similarly-sized cases.
      in_graph_pad: True = pad/crop inside the fused program (ONE dispatch
                 per case, but the compile is keyed on the exact case shape
                 — use for fixed-shape serving). False = pad on host so the
                 compile is keyed on the bucketed shape (shared across a
                 varied dataset, two extra dispatches per case). None
                 (default) = auto: in-graph only when the case shape already
                 equals its bucket (then both keys coincide).
      tta_flips: optional tuple of spatial axes (subset of (0, 1, 2)) for
                 WINDOW-LEVEL mirror TTA: each window's prediction becomes
                 the mean over all flip combinations of
                 ``unflip(predictor(flip(window)))``, inside the same fused
                 program (the reference's eval protocol,
                 light_training/prediction.py:110-159, without re-running
                 the whole sliding window per flip). See ``_tta_predict``
                 for the exactness condition vs the volume-level form.
      compute_dtype: optional dtype the device volume is cast to (e.g.
                 ``jnp.bfloat16`` when the predictor computes in bf16 anyway
                 — halves the fused program's input bytes, which matters on
                 size-capped remote-compile hops). Blending stays f32.
      predictor_args: optional tuple prepended to each predictor call
                 (``predictor(*predictor_args, windows)``). Pass model
                 params HERE rather than closing over them — closure arrays
                 are inlined into the fused program as dense constants (see
                 ``_sliding_window_jit``).
    Returns:
      (1, Z, Y, X, K) blended logits, original (unpadded) size.
    """
    squeeze = False
    if volume.ndim == 4:
        volume = volume[None]
        squeeze = True
    _, Z, Y, X, C = volume.shape
    roi_size = tuple(int(r) for r in roi_size)

    # pad to at least roi and to the shape bucket
    def padded(dim, roi):
        tgt = max(dim, roi)
        return int(math.ceil(tgt / bucket) * bucket) if bucket else tgt

    pz, py, px = (padded(Z, roi_size[0]), padded(Y, roi_size[1]),
                  padded(X, roi_size[2]))

    starts = _scan_starts((pz, py, px), roi_size, overlap)
    sw = max(1, sw_batch_size)
    n_pad = (-len(starts)) % sw
    wmask = np.ones(len(starts), np.float32)
    if n_pad:
        starts = np.concatenate([starts, np.repeat(starts[-1:], n_pad, 0)])
        wmask = np.concatenate([wmask, np.zeros(n_pad, np.float32)])
    starts = starts.reshape(-1, sw, 3)
    wmask = wmask.reshape(-1, sw)

    pred_args = tuple(predictor_args) if predictor_args is not None else ()
    imp = (gaussian_importance_map(roi_size) if mode == "gaussian"
           else np.ones(roi_size, np.float32))
    if num_classes is None:
        probe = jax.eval_shape(
            lambda *a: predictor(*a, jnp.zeros((1, *roi_size, C),
                                               jnp.float32)), *pred_args)
        num_classes = probe.shape[-1]
    tta = tuple(tta_flips) if tta_flips else None

    def hostloop():
        vol = jnp.pad(volume[0].astype(jnp.float32),
                      ((0, pz - Z), (0, py - Y), (0, px - X), (0, 0)))
        if compute_dtype is not None:
            vol = vol.astype(compute_dtype)
        out = _sliding_window_hostloop(
            vol, jnp.asarray(starts), jnp.asarray(wmask), jnp.asarray(imp),
            pred_args, predictor, roi_size, sw, int(num_classes), tta)
        return out[:Z, :Y, :X]

    if in_graph_pad is None:
        in_graph_pad = (Z, Y, X) == (pz, py, px)

    if host_loop:
        out = hostloop()
    else:
        try:
            if in_graph_pad:
                # squeeze + cast + pad + crop all inside the program — zero
                # extra dispatches per case; compile keyed on (Z, Y, X)
                out = _sliding_window_jit(
                    volume, jnp.asarray(starts),
                    jnp.asarray(wmask), pred_args, predictor, roi_size, sw,
                    int(num_classes), mode, (pz, py, px),
                    compute_dtype, tta)
            else:
                # host-side pad: the fused program sees only the bucketed
                # shape, so a dataset of varying case shapes shares compiles
                vol = jnp.pad(volume[0], ((0, pz - Z), (0, py - Y),
                                          (0, px - X), (0, 0)))
                out = _sliding_window_jit(
                    vol, jnp.asarray(starts), jnp.asarray(wmask), pred_args,
                    predictor, roi_size, sw, int(num_classes), mode, None,
                    compute_dtype, tta)[:Z, :Y, :X]
        except jax.errors.JaxRuntimeError as e:
            if host_loop is False or "413" not in str(e):
                raise
            # remote-compile hop rejected the fused program (request-size
            # cap); fall back to per-group programs. Passing params via
            # predictor_args (not closures) usually avoids this.
            import logging
            logging.getLogger(__name__).warning(
                "sliding_window_inference: fused single-program path "
                "rejected by the remote-compile relay (HTTP 413); falling "
                "back to the per-group host loop. Pass params via "
                "predictor_args (not closures) to shrink the program.")
            out = hostloop()
    return out if squeeze else out[None]


class SlidingWindowInferer:
    """Config wrapper mirroring the reference's inferer construction
    (3_train.py:35-37, 4_predict.py:55-58)."""

    def __init__(self, roi_size, sw_batch_size=2, overlap=0.5,
                 mode="gaussian", bucket=32, compute_dtype=None):
        if mode not in ("gaussian", "constant"):
            raise ValueError(f"unknown blend mode {mode!r}")
        self.roi_size = tuple(roi_size)
        self.sw_batch_size = sw_batch_size
        self.overlap = overlap
        self.mode = mode
        self.bucket = bucket
        self.compute_dtype = compute_dtype

    def __call__(self, volume, predictor, num_classes=None,
                 predictor_args=None):
        return sliding_window_inference(
            volume, self.roi_size, predictor, overlap=self.overlap,
            sw_batch_size=self.sw_batch_size, num_classes=num_classes,
            bucket=self.bucket, mode=self.mode,
            compute_dtype=self.compute_dtype, predictor_args=predictor_args)
