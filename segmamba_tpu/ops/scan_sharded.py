"""Sequence-parallel selective scan over a device mesh.

The reference handles its 262,144-token stage-0 sequences entirely within one
GPU (intra-kernel chunking, selective_scan.cpp:307) and has **no** sequence/
context parallelism (SURVEY.md §2.6). This module adds it the TPU way: the
sequence axis is sharded over a named mesh axis, each device scans its local
chunk, and the cross-device prefix state is combined with one small
``all_gather`` — mathematically exact because the per-chunk decay factor has
the closed form ``prod_t exp(delta_t A) = exp(A * sum_t delta_t)``:

  1. local scan with zero initial state  -> y_loc, last_loc
  2. all_gather the (decay, last) pairs  (ndev x batch x dim x dstate — tiny)
  3. entry_i = sum_{j<i} (prod_{j<k<i} decay_k) last_j   (static ndev loop)
  4. y += C_t · (exp(A · cumsum(delta)_t) * entry)       (local fix-up)

The depthwise causal conv crosses shard boundaries with a (width-1)-token
halo fetched from the left neighbour via ``ppermute`` — one ICI hop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from segmamba_tpu.ops.causal_conv1d import causal_conv1d
from segmamba_tpu.ops.selective_scan import (
    _postprocess,
    _preprocess_delta,
    selective_scan_chunked,
)


def _shard_map(fn, mesh, in_specs, out_specs, axis_names=None):
    """shard_map manual over ``axis_names`` ONLY (the axes the specs use).

    Claiming the whole mesh as manual while the surrounding jit program is
    GSPMD-sharded over the unused axes corrupts the backward pass: the
    transpose assumes P()-replication over the unused axis, but the
    downstream cotangent arrives sharded over it, and the partial cotangent
    of one shard is silently taken for the full one (measured: full-model
    grads 1.7x-8x off on a ("data","seq") mesh with specs using only
    "seq"). Restricting the manual set leaves the other axes to GSPMD,
    which inserts the correct collectives around the manual region.
    """
    # check_vma=False: varying-mesh-axes tracking rejects pallas_call
    # bodies (their out_shape carries no vma annotation), and the Pallas
    # scan core inside shard_map is exactly the composition real multichip
    # hardware runs. out_specs here are exact, so the unchecked mode is
    # numerically identical (parallel/pp.py makes the same call).
    kwargs = {"check_vma": False}
    if axis_names is not None:
        kwargs["axis_names"] = set(axis_names)
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, **kwargs)
    except (AttributeError, TypeError):  # older jax: whole mesh is manual
        try:
            from jax import shard_map  # jax >= 0.8
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def causal_conv1d_sharded_local(x, weight, bias, axis_name, activation=None,
                                reverse=False):
    """Per-shard causal conv with a halo from the scan-order predecessor
    shard. x: local (batch, L_loc, dim), already in local scan order. With
    ``reverse=True`` the global scan runs right-to-left over locally-flipped
    shards, so shard i's predecessor is shard i+1 and the first shard in
    scan order is the LAST device."""
    width = weight.shape[0]
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    # fetch the last (width-1) tokens of the scan-order predecessor
    tail = x[:, -(width - 1):, :]
    if reverse:
        perm = [(i, (i - 1) % n) for i in range(n)]
        first = n - 1
    else:
        perm = [(i, (i + 1) % n) for i in range(n)]
        first = 0
    halo = lax.ppermute(tail, axis_name, perm=perm)
    halo = jnp.where(idx == first, jnp.zeros_like(halo), halo)
    xx = jnp.concatenate([halo, x], axis=1)
    y = causal_conv1d(xx, weight, bias, activation=activation)
    return y[:, width - 1:, :]


def _entry_state(decay, last_loc, axis_name, reverse=False):
    """Entry state for this shard from all shards' (decay, last) pairs:
    ``entry_i = sum_{j<i} (prod_{j<k<i} decay_k) last_j`` over SCAN order —
    the exclusive prefix of the first-order recurrence ``e_i =
    decay_{i-1} e_{i-1} + last_{i-1}``, computed with an O(log n)
    associative scan over the gathered pairs (pod-scalable; replaces the
    round-1 O(n^2) masked fold). With ``reverse=True`` scan position is
    ``n-1-device_index`` (global right-to-left order).
    """
    idx = lax.axis_index(axis_name)
    pair = jnp.stack([decay, last_loc], axis=0)          # (2, b, d, n)
    gathered = lax.all_gather(pair, axis_name)           # (ndev, 2, b, d, n)
    if reverse:
        gathered = jnp.flip(gathered, axis=0)
        idx = lax.axis_size(axis_name) - 1 - idx
    # exclusive shift: element i sees pairs 0..i-1
    a = jnp.concatenate([jnp.ones_like(decay)[None], gathered[:-1, 0]], 0)
    b = jnp.concatenate([jnp.zeros_like(last_loc)[None], gathered[:-1, 1]], 0)

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    _, bb = lax.associative_scan(combine, (a, b), axis=0)
    return jnp.take(bb, idx, axis=0)


def _scan_local_core(u, delta, A, B, C, impl, chunk_size):
    """Local (zero-init) scan returning (y, last_state (B, D, N))."""
    if impl == "pallas":
        from segmamba_tpu.ops.scan_pallas import selective_scan_pallas
        return selective_scan_pallas(u, delta, A, B, C,
                                     return_last_state=True,
                                     chunk_size=chunk_size)
    return selective_scan_chunked(u, delta, A, B, C, return_last_state=True,
                                  chunk_size=chunk_size)


def selective_scan_sharded(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                           delta_softplus=False, *, mesh, seq_axis="seq",
                           batch_axis=None, impl="auto", chunk_size=128):
    """Selective scan with the sequence dim sharded over ``seq_axis``.

    Same contract as ``selective_scan`` (time-major, time-varying B/C);
    ``u/delta/B/C/z`` are sharded on dim 1, parameters replicated. Exact —
    matches the single-device scan up to float32 rounding. Pass
    ``batch_axis`` to compose with data parallelism on a 2-D mesh.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "chunked"

    seq_spec = P(batch_axis, seq_axis, None)
    has_d, has_z, has_bias = D is not None, z is not None, delta_bias is not None

    def local_fn(u, delta, B, C, A, D_skip, bias, z):
        uf = u.astype(jnp.float32)
        d = _preprocess_delta(delta, bias if has_bias else None,
                              delta_softplus)
        Af = A.astype(jnp.float32)
        Bf = B.astype(jnp.float32)
        Cf = C.astype(jnp.float32)

        y_loc, last_loc = _scan_local_core(uf, d, Af, Bf, Cf, impl,
                                           chunk_size)

        # chunk decay: prod_t exp(d_t A) = exp(A * sum_t d_t)
        sum_d = jnp.sum(d, axis=1)                       # (batch, dim)
        decay = jnp.exp(sum_d[..., None] * Af)           # (batch, dim, N)
        entry = _entry_state(decay, last_loc, seq_axis)

        # local fix-up: y_t += C_t · (exp(A·cumsum(d)_t) * entry)
        cd = jnp.cumsum(d, axis=1)                        # (b, L, dim)
        decay_t = jnp.exp(cd[..., None] * Af)             # (b, L, dim, N)
        y_fix = jnp.einsum("bln,bldn->bld", Cf, decay_t * entry[:, None])
        y = y_loc + y_fix
        return _postprocess(y, u, D_skip if has_d else None,
                            z if has_z else None, u.dtype)

    manual = {seq_axis} | ({batch_axis} if batch_axis else set())
    fn = _shard_map(
        local_fn, mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, seq_spec, P(), P(), P(),
                  seq_spec),
        out_specs=seq_spec, axis_names=manual)
    dim = u.shape[-1]
    return fn(u, delta, B, C, A,
              D if has_d else jnp.zeros(dim, jnp.float32),
              delta_bias if has_bias else jnp.zeros(dim, jnp.float32),
              z if has_z else jnp.zeros_like(u))


def mamba_inner_sharded(xz, conv_weight, conv_bias, x_proj, dt_proj, dt_bias,
                        A, D_skip, *, d_state, mesh, seq_axis="seq",
                        batch_axis=None, impl="auto", chunk_size=128,
                        reverse=False):
    """Sequence-parallel ``mamba_inner``: conv halo exchange + sharded scan.
    xz: (batch, L, 2*d_inner) sharded on dim 1. ``reverse=True`` runs the
    whole inner op right-to-left (the bimamba flip direction) without
    materializing a flipped copy across shards: inputs/outputs stay in
    original order; only the tiny halo/carry exchanges change direction.
    Pass ``batch_axis`` to compose with data parallelism on a 2-D mesh."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "chunked"
    seq_spec = P(batch_axis, seq_axis, None)

    def local_fn(xz, conv_w, conv_b, x_proj_w, dt_proj_w, dt_b, A_, D_):
        d_inner = xz.shape[-1] // 2
        x, zgate = xz[..., :d_inner], xz[..., d_inner:]
        if reverse:
            x = jnp.flip(x, axis=1)
            zgate = jnp.flip(zgate, axis=1)
        x = causal_conv1d_sharded_local(x, conv_w, conv_b, seq_axis,
                                        activation="silu", reverse=reverse)
        x_dbl = jnp.einsum("bld,de->ble", x, x_proj_w.astype(x.dtype))
        dt_rank = x_proj_w.shape[1] - 2 * d_state
        dt = jnp.einsum("blr,rd->bld", x_dbl[..., :dt_rank],
                        dt_proj_w.astype(x.dtype))
        Bm = x_dbl[..., dt_rank:dt_rank + d_state]
        Cm = x_dbl[..., dt_rank + d_state:]

        # inline the sharded scan (we're already inside shard_map)
        uf = x.astype(jnp.float32)
        d = _preprocess_delta(dt, dt_b, True)
        Af = A_.astype(jnp.float32)
        y_loc, last_loc = _scan_local_core(uf, d, Af,
                                           Bm.astype(jnp.float32),
                                           Cm.astype(jnp.float32), impl,
                                           chunk_size)
        sum_d = jnp.sum(d, axis=1)
        decay = jnp.exp(sum_d[..., None] * Af)
        entry = _entry_state(decay, last_loc, seq_axis, reverse=reverse)
        cd = jnp.cumsum(d, axis=1)
        y_fix = jnp.einsum("bln,bldn->bld", Cm.astype(jnp.float32),
                           jnp.exp(cd[..., None] * Af) * entry[:, None])
        y = y_loc + y_fix
        out = _postprocess(y, x, D_, zgate, xz.dtype)
        return jnp.flip(out, axis=1) if reverse else out

    manual = {seq_axis} | ({batch_axis} if batch_axis else set())
    fn = _shard_map(local_fn, mesh,
                    in_specs=(seq_spec, P(), P(), P(), P(), P(), P(), P()),
                    out_specs=seq_spec, axis_names=manual)
    from jax.sharding import NamedSharding
    rep = NamedSharding(mesh, P())
    cb = (conv_bias if conv_bias is not None
          else jnp.zeros(conv_weight.shape[1], jnp.float32))
    # pin shardings so jit-level propagation can't disagree with the
    # shard_map in_specs (params replicated, activations seq-sharded)
    xz = lax.with_sharding_constraint(xz, NamedSharding(mesh, seq_spec))
    conv_weight, cb, x_proj, dt_proj, dt_bias, A, D_skip = (
        lax.with_sharding_constraint(p, rep)
        for p in (conv_weight, cb, x_proj, dt_proj, dt_bias, A, D_skip))
    return fn(xz, conv_weight, cb, x_proj, dt_proj, dt_bias, A, D_skip)
