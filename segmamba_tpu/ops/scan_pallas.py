"""Pallas TPU kernel for the selective SSM scan (forward + custom VJP).

TPU-native replacement for the reference CUDA kernels
``selective_scan_fwd_kernel`` / ``selective_scan_bwd_kernel``
(/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh,
selective_scan_bwd_kernel.cuh). The reference chunks the sequence at 2048
timesteps inside one thread block and carries an ``(a, b)`` prefix between
chunks (selective_scan.cpp:307, selective_scan_common.h:130-144); this kernel
uses the same decomposition mapped onto the TPU:

- grid ``(batch, dim_blocks, seq_chunks)`` with the chunk dimension innermost;
  the TPU grid executes sequentially, so the running state lives in a VMEM
  scratch buffer that persists across chunk steps.
- within a chunk, the first-order recurrence is computed by a Hillis–Steele
  scan over the time axis (log2(T) shifted fused multiply-adds on
  ``(dstate, T, dim_block)`` VMEM tiles) with the combine op
  ``(a, b) ∘ (a', b') = (a'·a, a'·b + b')`` — the cub BlockScan combine of
  selective_scan_common.h:110-115, vectorized over lanes.
- the forward emits per-chunk exit states; the backward re-materializes
  in-chunk states from them (the CUDA backward does the same recompute via a
  reverse scan, selective_scan_bwd_kernel.cuh:19,59,271) and runs the adjoint
  recurrence ``g[t] = dx[t] + a[t+1] * g[t+1]`` as a reverse Hillis–Steele
  scan, carrying the adjoint state across chunks in scratch.

Layouts: time-major ``u, delta, y: (batch, L, dim)`` (dim on vector lanes),
``B, C`` pre-transposed to ``(batch, dstate, L)``, ``A`` transposed to
``(dstate, dim)``. The recurrence is computed in float32 regardless of input
dtype, like the reference kernel's float weight path
(selective_scan.cpp:235-236).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from segmamba_tpu.ops.selective_scan import _postprocess, _preprocess_delta

DEF_CHUNK = 128
DEF_DBLOCK = 256


def _pick_dblock(dim, d_block):
    """Channel-block choice. The backward kernel holds ~12 live
    (dstate, T, Dblk) float32 arrays; at T=128/N=16 that caps Dblk at 128
    (VMEM is 16MB — Dblk=192 makes Mosaic's compile fail on VMEM). Below
    128 the trailing dim is unblocked (any size, no pad copies — SegMamba's
    stage-0 d_inner=96 hits this); above, 128-blocks (384/768 divide evenly;
    192 pads to 256)."""
    if dim <= 128:
        return dim
    return min(d_block, 128)


def _shift_down(arr, k, fill):
    """arr[:, t] -> arr[:, t-k]; first k timesteps become `fill`."""
    T = arr.shape[1]
    pad = jnp.full(arr.shape[:1] + (k,) + arr.shape[2:], fill, arr.dtype)
    return jnp.concatenate([pad, arr[:, 0:T - k]], axis=1)


def _shift_up(arr, k, fill):
    """arr[:, t] -> arr[:, t+k]; last k timesteps become `fill`."""
    pad = jnp.full(arr.shape[:1] + (k,) + arr.shape[2:], fill, arr.dtype)
    return jnp.concatenate([arr[:, k:], pad], axis=1)


def _shift_down_ax(arr, k, fill, axis):
    T = arr.shape[axis]
    pad_shape = list(arr.shape)
    pad_shape[axis] = k
    pad = jnp.full(tuple(pad_shape), fill, arr.dtype)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(0, T - k)
    return jnp.concatenate([pad, arr[tuple(sl)]], axis=axis)


def _shift_up_ax(arr, k, fill, axis):
    pad_shape = list(arr.shape)
    pad_shape[axis] = k
    pad = jnp.full(tuple(pad_shape), fill, arr.dtype)
    sl = [slice(None)] * arr.ndim
    sl[axis] = slice(k, None)
    return jnp.concatenate([arr[tuple(sl)], pad], axis=axis)


def _hs_fwd(a, b, T, axis):
    """Hillis-Steele inclusive pair scan along `axis`."""
    k = 1
    while k < T:
        a_s = _shift_down_ax(a, k, 1.0, axis)
        b_s = _shift_down_ax(b, k, 0.0, axis)
        b = a * b_s + b
        a = a * a_s
        k *= 2
    return a, b


def _hs_rev(m, v, T, axis):
    """Hillis-Steele suffix pair scan along `axis` (returns both)."""
    k = 1
    while k < T:
        m_s = _shift_up_ax(m, k, 1.0, axis)
        v_s = _shift_up_ax(v, k, 0.0, axis)
        v = v + m * v_s
        m = m * m_s
        k *= 2
    return m, v


def _hs_fwd_b(a, b, T, axis):
    """b-only Hillis-Steele prefix combine: callers that SEED the incoming
    carry into ``b`` (b[0] += a[0]*carry) get the full state sequence from
    the b lane alone, so the final cumprod pass and the aa*carry fixup are
    skipped — ~2 of the 14 full-array passes at T=128."""
    k = 1
    while k < T:
        b = a * _shift_down_ax(b, k, 0.0, axis) + b
        if 2 * k < T:
            a = a * _shift_down_ax(a, k, 1.0, axis)
        k *= 2
    return b


def _hs_rev_v(m, v, T, axis):
    """v-only suffix combine (adjoint scan with the tail carry pre-seeded
    into v[T-1]); skips the final suffix-product pass."""
    k = 1
    while k < T:
        v = v + m * _shift_up_ax(v, k, 0.0, axis)
        if 2 * k < T:
            m = m * _shift_up_ax(m, k, 1.0, axis)
        k *= 2
    return v


def _pair_scan_fwd(a, b, T):
    """Inclusive prefix scan of x[t] = a[t]·x[t-1] + b[t] (zero init) on
    (N, T, Dblk) arrays. Returns (cumprod_a, x).

    Flat Hillis-Steele over the time axis. A two-level variant
    (8-step sub-chunks + carry scan, ~40% fewer VPU ops on paper) was tried
    and measured ~40% SLOWER on v5e — the (N, T/8, 8, Dblk) layout fragments
    Mosaic's tiling — so the flat form stays."""
    return _hs_fwd(a, b, T, axis=1)


def _pair_scan_rev(m, v, T):
    """Suffix scan g[t] = v[t] + m[t]·g[t+1] (zero past-the-end state)."""
    return _hs_rev(m, v, T, axis=1)[1]


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(u_ref, d_ref, At_ref, Bt_ref, Ct_ref, y_ref, st_ref, carry_ref):
    T = u_ref.shape[1]
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    u = u_ref[0].astype(jnp.float32)         # (T, Dblk)
    delta = d_ref[0].astype(jnp.float32)     # (T, Dblk)
    At = At_ref[...].astype(jnp.float32)     # (N, Dblk)
    Bt = Bt_ref[0].astype(jnp.float32)       # (N, T)
    Ct = Ct_ref[0].astype(jnp.float32)       # (N, T)

    a = jnp.exp(delta[None] * At[:, None, :])        # (N, T, Dblk)
    b = (delta * u)[None] * Bt[:, :, None]           # (N, T, Dblk)
    carry = carry_ref[...][:, None, :]               # carry: (N, Dblk)
    b = jnp.concatenate([b[:, 0:1] + a[:, 0:1] * carry, b[:, 1:]], axis=1)
    x = _hs_fwd_b(a, b, T, axis=1)
    y = jnp.sum(Ct[:, :, None] * x, axis=0)          # (T, Dblk)

    y_ref[0] = y.astype(y_ref.dtype)
    N, Dblk = carry_ref.shape
    carry_ref[...] = x[:, T - 1:T].reshape(N, Dblk)
    st_ref[0, 0] = carry_ref[...]


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(u_ref, d_ref, At_ref, Bt_ref, Ct_ref, dy_ref, dlast_ref,
                ent_ref, du_ref, dd_ref, dA_ref, dB_ref, dC_ref, gcarry_ref):
    T = u_ref.shape[1]
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        # adjoint state entering from beyond the last timestep = d(last_state)
        gcarry_ref[...] = dlast_ref[0].astype(jnp.float32)
        dA_ref[...] = jnp.zeros(dA_ref.shape, dA_ref.dtype)

    u = u_ref[0].astype(jnp.float32)
    delta = d_ref[0].astype(jnp.float32)
    At = At_ref[...].astype(jnp.float32)
    Bt = Bt_ref[0].astype(jnp.float32)
    Ct = Ct_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)               # (T, Dblk)

    # recompute in-chunk states from the stored chunk-entry state
    a = jnp.exp(delta[None] * At[:, None, :])
    du_ = delta * u
    b = du_[None] * Bt[:, :, None]
    entry = ent_ref[0, 0].astype(jnp.float32)[:, None, :]   # (N, 1, Dblk)
    entry = jnp.where(c == nc - 1, jnp.zeros_like(entry), entry)
    bs = jnp.concatenate([b[:, 0:1] + a[:, 0:1] * entry, b[:, 1:]], axis=1)
    x = _hs_fwd_b(a, bs, T, axis=1)
    x_prev = jnp.concatenate([entry, x[:, 0:T - 1]], axis=1)

    # adjoint recurrence g[t] = dx[t] + a[t+1]·g[t+1], tail carry at t = T-1
    dx = Ct[:, :, None] * dy[None]                   # (N, T, Dblk)
    m = _shift_up(a, 1, 1.0)                         # m[t] = a[t+1]
    tail = jnp.concatenate(
        [jnp.zeros(dx.shape[:1] + (T - 1,) + dx.shape[2:], jnp.float32),
         gcarry_ref[...][:, None, :]], axis=1)
    g = _hs_rev_v(m, dx + tail, T, axis=1)
    Nn, Dblk = gcarry_ref.shape
    gcarry_ref[...] = (a[:, 0:1] * g[:, 0:1]).reshape(Nn, Dblk)

    # gradients
    dp = g * x_prev * a                              # adjoint of delta·A pre-exp
    S = jnp.sum(g * Bt[:, :, None], axis=0)          # (T, Dblk) = d(delta·u)
    du_ref[0] = (S * delta).astype(du_ref.dtype)
    dd_ref[0] = (jnp.sum(dp * At[:, None, :], axis=0) + S * u).astype(dd_ref.dtype)
    dA_ref[0, 0] += jnp.sum(dp * delta[None], axis=1)
    dB_ref[0, 0] = jnp.sum(g * du_[None], axis=2).astype(dB_ref.dtype)
    dC_ref[0, 0] = jnp.sum(x * dy[None], axis=2).astype(dC_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers (operate on padded, pre-transposed arrays)
# ---------------------------------------------------------------------------


def _interpret():
    return jax.default_backend() != "tpu"


def _fwd_call(u, delta, At, Bt, Ct, T, Dblk):
    batch, L, D = u.shape
    N = At.shape[0]
    nc, nd = L // T, D // Dblk
    grid = (batch, nd, nc)
    y, states = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((N, Dblk), lambda b, d, c: (0, d)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, c, d)),
            pl.BlockSpec((1, 1, N, Dblk), lambda b, d, c: (b, c, 0, d)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, nc, N, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        interpret=_interpret(),
    )(u, delta, At, Bt, Ct)
    return y, states


def _bwd_call(u, delta, At, Bt, Ct, dy, dlast, states, T, Dblk):
    batch, L, D = u.shape
    N = At.shape[0]
    nc, nd = L // T, D // Dblk
    grid = (batch, nd, nc)

    def rev(c):
        return nc - 1 - c

    du, dd, dA_part, dB_part, dC_part = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((N, Dblk), lambda b, d, c: (0, d)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, rev(c))),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, rev(c))),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, N, Dblk), lambda b, d, c: (b, 0, d)),
            # chunk-entry state = exit state of the previous chunk
            pl.BlockSpec((1, 1, N, Dblk),
                         lambda b, d, c: (b, jnp.maximum(rev(c) - 1, 0), 0, d)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, T, Dblk), lambda b, d, c: (b, rev(c), d)),
            pl.BlockSpec((1, 1, N, Dblk), lambda b, d, c: (b, d, 0, 0)),
            pl.BlockSpec((1, 1, N, T), lambda b, d, c: (d, b, 0, rev(c))),
            pl.BlockSpec((1, 1, N, T), lambda b, d, c: (d, b, 0, rev(c))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, L, D), jnp.float32),
            jax.ShapeDtypeStruct((batch, nd, N, Dblk), jnp.float32),
            jax.ShapeDtypeStruct((nd, batch, N, L), jnp.float32),
            jax.ShapeDtypeStruct((nd, batch, N, L), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, Dblk), jnp.float32)],
        interpret=_interpret(),
    )(u, delta, At, Bt, Ct, dy, dlast, states)
    dAt = jnp.moveaxis(jnp.sum(dA_part, axis=0), 0, 1).reshape(N, D)
    dBt = jnp.sum(dB_part, axis=0)
    dCt = jnp.sum(dC_part, axis=0)
    return du, dd, dAt, dBt, dCt


# ---------------------------------------------------------------------------
# custom-vjp core on padded/transposed arrays
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_core(T, Dblk):
    @jax.custom_vjp
    def core(u, delta, At, Bt, Ct):
        y, states = _fwd_call(u, delta, At, Bt, Ct, T, Dblk)
        return y, states[:, -1]  # (y, last_state (B, N, D))

    def core_fwd(u, delta, At, Bt, Ct):
        y, states = _fwd_call(u, delta, At, Bt, Ct, T, Dblk)
        return (y, states[:, -1]), (u, delta, At, Bt, Ct, states)

    def core_bwd(res, cts):
        u, delta, At, Bt, Ct, states = res
        dy, dlast = cts
        du, dd, dAt, dBt, dCt = _bwd_call(
            u, delta, At, Bt, Ct,
            dy.astype(jnp.float32), dlast.astype(jnp.float32), states, T, Dblk)
        return du, dd, dAt, dBt, dCt

    core.defvjp(core_fwd, core_bwd)
    return core


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def selective_scan_pallas(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                          delta_softplus=False, return_last_state=False,
                          chunk_size=DEF_CHUNK, d_block=DEF_DBLOCK):
    """Selective scan via the Pallas TPU kernel. Same contract as
    ``selective_scan_ref`` (time-major, variable B/C only)."""
    if B.ndim != 3 or C.ndim != 3:
        raise ValueError("pallas selective scan requires time-varying B and C")
    batch, seqlen, dim = u.shape
    dstate = A.shape[1]
    if dstate > 256:
        raise ValueError("dstate must be <= 256 (reference selective_scan.cpp:262)")
    out_dtype = u.dtype

    uf = u.astype(jnp.float32)
    d = _preprocess_delta(delta, delta_bias, delta_softplus)

    T = min(chunk_size, _round_up(seqlen, 8))
    if T < 128 and _round_up(seqlen, 8) > T:
        # Mosaic requires blocked trailing dims to be multiples of 128 and
        # B/C carry time on lanes; sub-128 chunks are only legal when the
        # whole (padded) sequence is a single chunk.
        T = min(128, _round_up(seqlen, 8))
    Dblk = _pick_dblock(dim, d_block)
    pad_l = (-seqlen) % T
    pad_d = (-dim) % Dblk
    # delta=0 padding => a=1, b=0 (identity); zero-channel padding is inert.
    if pad_l or pad_d:
        uf = jnp.pad(uf, ((0, 0), (0, pad_l), (0, pad_d)))
        d = jnp.pad(d, ((0, 0), (0, pad_l), (0, pad_d)))
    Af = A.astype(jnp.float32)
    if pad_d:
        Af = jnp.pad(Af, ((0, pad_d), (0, 0)))
    Bf = B.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    if pad_l:
        Bf = jnp.pad(Bf, ((0, 0), (0, pad_l), (0, 0)))
        Cf = jnp.pad(Cf, ((0, 0), (0, pad_l), (0, 0)))

    At = Af.T                         # (N, D)
    Bt = jnp.swapaxes(Bf, 1, 2)       # (B, N, L)
    Ct = jnp.swapaxes(Cf, 1, 2)

    core = _make_core(T, Dblk)
    y, last = core(uf, d, At, Bt, Ct)
    y = y[:, :seqlen, :dim]
    out = _postprocess(y, u, D, z, out_dtype)
    if return_last_state:
        return out, jnp.swapaxes(last, 1, 2)[:, :dim]  # (B, D, N)
    return out


def _round_up(x, m):
    return ((x + m - 1) // m) * m
