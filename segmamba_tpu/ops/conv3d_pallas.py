"""Pallas TPU kernel for 3x3x3 stride-1 SAME conv, channels-last ("P-form").

Why: XLA's conv emitter on TPU runs the model's 48-channel full-resolution
convs at ~15 Tflop/s (the MXU pads both channel operands to 128 lanes and
spends most of its time on relayouts) — measured 17 ms for a single
48->48 k3 conv at 128^3, 4x the cost of the equivalent matmul FLOPs. These
convs dominate the SegMamba decoder (reference hot path
/root/reference/model_segmamba/segmamba.py:227-343, the UnetResBlock convs of
monai/networks/blocks/dynunet_block.py:25-111).

The P-form reshapes the conv into matmuls the MXU actually likes:

- fold the 9 in-plane kernel offsets (kh, kw) into the matmul N dimension:
  ``P[m, (kh,kw,co)] = x_row[m, ci] @ Wk[ci, (kh,kw,co)]`` with N = 9*Cout
  (432 for Cout=48 — full 128-lane tiles at ~84% instead of 37.5%);
- fold the 3 depth offsets (kd) into 3 accumulated matmuls (K streams
  through the MXU unpadded, so K = Cin = 48 costs nothing);
- recover the conv by 9 statically-shifted adds of P slices:
  ``y[h, w, co] = sum_{kh,kw} P[h+kh, w+kw, (kh,kw,co)]`` — cheap VPU work
  on VMEM tiles.

The depth halo is free at the BlockSpec level (blocks of size 1 along D,
three refs with index maps d, d+1, d+2); the height halo is materialized by
an overlapping-H-block copy of the padded input (~12% extra HBM, one
elementwise pass). Measured ~3x over the XLA conv at the model's shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret():
    return jax.default_backend() != "tpu"


def _pick_bh(h, w, cout, itemsize):
    """Largest H sub-block whose P tile ((BH+2, W+2, 9*Cout)) stays within
    a ~2.5MB VMEM budget (the 16MB scoped-vmem limit was measured to within
    4KB at 3MB; leave margin for double-buffered input blocks)."""
    budget = 2.5 * 1024 * 1024
    for bh in (16, 8, 4, 2, 1):
        if h % bh:
            continue
        p_bytes = (bh + 2) * (w + 2) * _round_up(9 * cout, 512) * itemsize
        if p_bytes <= budget or bh == 1:
            return bh
    return 1


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(x0_ref, x1_ref, x2_ref, wk_ref, out_ref, *, bh, w_out, cout):
    # x refs: (1, 1, 1, BH+2, W+2, Cin); wk: (3*Cin, 9*Cout)
    # One matmul with K = 3*Cin (the kd offsets folded into K): better MXU
    # K-utilization than three K=Cin dots, and a single f32 P tile in VMEM.
    lhs = jnp.concatenate(
        [x0_ref[0, 0, 0], x1_ref[0, 0, 0], x2_ref[0, 0, 0]], axis=-1)
    p = jax.lax.dot_general(
        lhs, wk_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # store P in the input dtype (halves the dominant VMEM tile); the
    # 9-term group sum below still accumulates in f32
    p = p.astype(x0_ref.dtype)
    y = None
    for kh in range(3):
        for kw in range(3):
            g = kh * 3 + kw
            sl = p[kh:kh + bh, kw:kw + w_out,
                   g * cout:(g + 1) * cout].astype(jnp.float32)
            y = sl if y is None else y + sl
    out_ref[0, 0, 0] = y.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3d_k3s1(x, w):
    """3D conv, kernel 3, stride 1, SAME padding, channels-last, no bias.

    x: (B, D, H, W, Cin); w: (3, 3, 3, Cin, Cout). Returns
    (B, D, H, W, Cout) in x.dtype (f32 accumulation inside).
    """
    return _conv3d_k3s1_fwd_impl(x, w)


def _build_wk(w):
    """w (3,3,3,Cin,Cout) -> Wk (3*Cin, 9*Cout), K=(kd,ci), N=(kh,kw,co)."""
    k, _, _, cin, cout = w.shape
    assert k == 3
    return jnp.transpose(w, (0, 3, 1, 2, 4)).reshape(3 * cin, 9 * cout)


def _overlap_h(xp, bh):
    """(B, D+2, H+2, W+2, C) -> (B, D+2, nH, BH+2, W+2, C) overlapping rows."""
    h_out = xp.shape[2] - 2
    nh = h_out // bh
    parts = [
        jax.lax.slice_in_dim(xp, i * bh, i * bh + bh + 2, axis=2)
        for i in range(nh)
    ]
    return jnp.stack(parts, axis=2)


def _conv3d_k3s1_fwd_impl(x, w):
    b, d, h, wdim, cin = x.shape
    cout = w.shape[-1]
    bh = _pick_bh(h, wdim, cout, jnp.dtype(x.dtype).itemsize)
    nh = h // bh
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xov = _overlap_h(xp, bh)  # (B, D+2, nH, BH+2, W+2, C)
    wk = _build_wk(w).astype(x.dtype)

    def in_spec(kd):
        return pl.BlockSpec((1, 1, 1, bh + 2, wdim + 2, cin),
                            lambda b_, d_, h_, kd=kd: (b_, d_ + kd, h_, 0, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, w_out=wdim, cout=cout),
        grid=(b, d, nh),
        in_specs=[in_spec(0), in_spec(1), in_spec(2),
                  pl.BlockSpec((3 * cin, 9 * cout), lambda b_, d_, h_: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, bh, wdim, cout),
                               lambda b_, d_, h_: (b_, d_, h_, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, nh, bh, wdim, cout), x.dtype),
        interpret=_interpret(),
    )(xov, xov, xov, wk)
    return out.reshape(b, d, h, wdim, cout)


def _conv3d_fwd(x, w):
    return _conv3d_k3s1_fwd_impl(x, w), (x, w)


def _conv3d_bwd(res, dy):
    x, w = res
    # dx = full correlation of dy with w = conv3d(dy, flip(w) transposed)
    wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)  # (3,3,3,Cout,Cin)
    dx = _conv3d_k3s1_fwd_impl(dy.astype(x.dtype), wt.astype(x.dtype))
    # dw[kd,kh,kw,ci,co] = sum_pos x[pos + k - 1, ci] * dy[pos, co]
    dw = _conv3d_dw(x, dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_k3s1.defvjp(_conv3d_fwd, _conv3d_bwd)


def _dw_kernel(x0_ref, x1_ref, x2_ref, dy_ref, dw_ref, *, bh, w_out, cout):
    # dw_ref: (3, Cin, 9*Cout) f32 accumulator across the whole grid
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
             & (pl.program_id(2) == 0))
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    dy = dy_ref[0, 0, 0].astype(jnp.float32)  # (BH, W, Cout)
    # dyP[h, w, (kh,kw,co)] = dy[h-kh, w-kw, co] on the (BH+2, W+2) halo grid
    parts = []
    for kh in range(3):
        for kw in range(3):
            parts.append(jnp.pad(
                dy, ((kh, 2 - kh), (kw, 2 - kw), (0, 0))))
    dyp = jnp.concatenate(parts, axis=-1)  # (BH+2, W+2, 9*Cout)
    for kd, ref in enumerate((x0_ref, x1_ref, x2_ref)):
        lhs = ref[0, 0, 0].astype(jnp.float32)  # (BH+2, W+2, Cin)
        dw_ref[kd] += jax.lax.dot_general(
            lhs, dyp, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)


def _conv3d_dw(x, dy):
    b, d, h, wdim, cin = x.shape
    cout = dy.shape[-1]
    bh = _pick_bh(h, wdim, cout, 4)
    nh = h // bh
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xov = _overlap_h(xp, bh)
    dyr = dy.reshape(b, d, nh, bh, wdim, cout)

    def in_spec(kd):
        return pl.BlockSpec((1, 1, 1, bh + 2, wdim + 2, cin),
                            lambda b_, d_, h_, kd=kd: (b_, d_ + kd, h_, 0, 0, 0))

    dwk = pl.pallas_call(
        functools.partial(_dw_kernel, bh=bh, w_out=wdim, cout=cout),
        grid=(b, d, nh),
        in_specs=[in_spec(0), in_spec(1), in_spec(2),
                  pl.BlockSpec((1, 1, 1, bh, wdim, cout),
                               lambda b_, d_, h_: (b_, d_, h_, 0, 0, 0))],
        out_specs=pl.BlockSpec((3, cin, 9 * cout),
                               lambda b_, d_, h_: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, cin, 9 * cout), jnp.float32),
        interpret=_interpret(),
    )(xov, xov, xov, dyr)
    # (3, Cin, 9*Cout) -> (3, 3, 3, Cin, Cout), N ordered (kh, kw, co)
    return jnp.transpose(dwk.reshape(3, cin, 3, 3, cout), (0, 2, 3, 1, 4))


# ---------------------------------------------------------------------------
# v2: lane-aligned P-form. v1's profile showed the 9 P slices at 48·g lane
# offsets lower to expensive lane-shuffle relayouts (every group boundary is
# misaligned w.r.t. the 128-lane tile). v2 pads each tap group's Cout to
# ``npad`` lanes (128 → slices are whole lane tiles; 64 → half-tile selects)
# and each depth-tap's Cin to ``kpad`` in the folded K dimension. More MXU
# FLOPs, but all VPU ops become (near-)aligned.
# ---------------------------------------------------------------------------


def _kernel_v2(x0_ref, x1_ref, x2_ref, wk_ref, out_ref, *, bh, w_out, cout,
               kpad, npad):
    cin = x0_ref.shape[-1]

    def padc(ref):
        t = ref[0, 0, 0]
        if cin == kpad:
            return t
        return jnp.pad(t, ((0, 0), (0, 0), (0, kpad - cin)))

    lhs = jnp.concatenate([padc(x0_ref), padc(x1_ref), padc(x2_ref)], axis=-1)
    p = jax.lax.dot_general(
        lhs, wk_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = p.astype(x0_ref.dtype)                 # (BH+2, W+2, 9*npad)
    y = None
    for kh in range(3):
        for kw in range(3):
            g = kh * 3 + kw
            sl = p[kh:kh + bh, kw:kw + w_out,
                   g * npad:g * npad + cout].astype(jnp.float32)
            y = sl if y is None else y + sl
    out_ref[0, 0, 0] = y.astype(out_ref.dtype)


def _build_wk_v2(w, kpad, npad):
    """w (3,3,3,Cin,Cout) -> Wk (3*kpad, 9*npad); K=(kd,ci-pad),
    N=(kh,kw,co-pad)."""
    _, _, _, cin, cout = w.shape
    wk = jnp.transpose(w, (0, 3, 1, 2, 4))          # (kd, ci, kh, kw, co)
    wk = jnp.pad(wk, ((0, 0), (0, kpad - cin), (0, 0), (0, 0),
                      (0, npad - cout)))
    return wk.reshape(3 * kpad, 9 * npad)


def _pick_bh_v2(h, w, npad, itemsize):
    budget = 6 * 1024 * 1024
    for bh in (16, 8, 4, 2, 1):
        if h % bh:
            continue
        p_bytes = (bh + 2) * (w + 2) * 9 * npad * itemsize
        if p_bytes <= budget or bh == 1:
            return bh
    return 1


def _pick_pads(cin, cout):
    kpad = {48: 64, 96: 96}.get(cin, _round_up(cin, 32))
    npad = 128 if cout <= 128 else _round_up(cout, 128)
    return kpad, npad


def _conv3d_k3s1_v2_impl(x, w, kpad=None, npad=None):
    b, d, h, wdim, cin = x.shape
    cout = w.shape[-1]
    kp, np_ = _pick_pads(cin, cout)
    kpad = kpad or kp
    npad = npad or np_
    bh = _pick_bh_v2(h, wdim, npad, jnp.dtype(x.dtype).itemsize)
    nh = h // bh
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xov = _overlap_h(xp, bh)  # (B, D+2, nH, BH+2, W+2, C)
    wk = _build_wk_v2(w, kpad, npad).astype(x.dtype)

    def in_spec(kd):
        return pl.BlockSpec((1, 1, 1, bh + 2, wdim + 2, cin),
                            lambda b_, d_, h_, kd=kd: (b_, d_ + kd, h_, 0, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel_v2, bh=bh, w_out=wdim, cout=cout,
                          kpad=kpad, npad=npad),
        grid=(b, d, nh),
        in_specs=[in_spec(0), in_spec(1), in_spec(2),
                  pl.BlockSpec((3 * kpad, 9 * npad),
                               lambda b_, d_, h_: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, 1, bh, wdim, cout),
                               lambda b_, d_, h_: (b_, d_, h_, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, nh, bh, wdim, cout), x.dtype),
        interpret=_interpret(),
    )(xov, xov, xov, wk)
    return out.reshape(b, d, h, wdim, cout)


@jax.custom_vjp
def conv3d_k3s1_v2(x, w):
    """Lane-aligned P-form 3D conv, kernel 3, stride 1, SAME, channels-last."""
    return _conv3d_k3s1_v2_impl(x, w)


def _conv3d_v2_fwd(x, w):
    return _conv3d_k3s1_v2_impl(x, w), (x, w)


def _conv3d_v2_bwd(res, dy):
    x, w = res
    wt = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = _conv3d_k3s1_v2_impl(dy.astype(x.dtype), wt.astype(x.dtype))
    dw = _conv3d_dw(x, dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_k3s1_v2.defvjp(_conv3d_v2_fwd, _conv3d_v2_bwd)


def conv3d_k3s1_supported(x_shape, w_shape):
    """Whether the Pallas path handles this conv (k3, s1, SAME, 5-D) within
    its VMEM budget. Above ~192 channels the folded weight block
    (3, Cin, 9*Cout) gets too large for VMEM — and XLA's own conv emitter is
    efficient there anyway (measured 77 Tflop/s at 128ch vs 15 at 48ch)."""
    if len(w_shape) != 5 or tuple(w_shape[:3]) != (3, 3, 3):
        return False
    if len(x_shape) != 5:
        return False
    _, d, h, w, cin = x_shape
    cout = w_shape[-1]
    if cin > 192 or cout > 192:
        return False
    return d >= 1 and h >= 1 and w >= 1
