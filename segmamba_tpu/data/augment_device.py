"""On-device (jitted) training augmentation chain.

The reference feeds augmentation through 18 batchgenerators worker processes
(/root/reference/light_training/trainer.py:154-162); this container has ONE
host core, so the numpy chain (data/augment.py) averages ~2.5 s per 2x128^3
batch against a ~1.3 s device step. The TPU-first fix is to run the chain on
the accelerator inside the train step: the host only memmap-crops patches
(cheap), and every transform below executes as fused XLA on bf16/f32 tiles.

Parity: op-for-op with ``data/augment.py`` / the reference chain
(train_augment.py:23-62) — same transforms, probabilities, and parameter
ranges. Documented deltas:
- spatial warp + low-res upsampling interpolate with Catmull-Rom cubic
  (matching the native host resampler's delta) or trilinear for the seg,
  instead of scipy's prefiltered B-spline;
- randomness comes from a JAX PRNG key (distribution-identical, different
  stream than the numpy chain).

Every transform draws its coin per sample (vmapped), matching
``p_per_sample`` semantics; "skipped" branches still execute and are
select-masked — uniform step time, no recompiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _u(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


# ---------------------------------------------------------------------------
# spatial warp (SpatialTransform: rot ±30° p=.2, scale .7-1.4 p=.2)
# ---------------------------------------------------------------------------


def _rotation_matrix(key, angle):
    """R2 @ R1 @ R0 with per-axis angles U(-angle, angle) — the composition
    order of the host chain (augment.py spatial_transform)."""
    ks = jax.random.split(key, 3)
    mat = jnp.eye(3)
    for ax in range(3):
        a = _u(ks[ax], -angle, angle)
        c, s = jnp.cos(a), jnp.sin(a)
        i, j = [k for k in range(3) if k != ax]
        rot = jnp.eye(3).at[i, i].set(c).at[i, j].set(-s) \
                        .at[j, i].set(s).at[j, j].set(c)
        mat = rot @ mat
    return mat


def _affine_coords(mat, shape):
    """Source coordinates (3, Z, Y, X) for output grid under ``mat`` about
    the volume center (src = mat @ (dst - center) + center)."""
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(shape[0], dtype=jnp.float32),
        jnp.arange(shape[1], dtype=jnp.float32),
        jnp.arange(shape[2], dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([zz, yy, xx])                       # (3, Z, Y, X)
    center = (jnp.asarray(shape, jnp.float32) - 1.0) / 2.0
    flat = grid.reshape(3, -1) - center[:, None]
    src = mat @ flat + center[:, None]
    return src.reshape(3, *shape)


def _gather_nd(vol, idx_z, idx_y, idx_x):
    Z, Y, X = vol.shape
    lin = (idx_z * Y + idx_y) * X + idx_x
    return jnp.take(vol.reshape(-1), lin.reshape(-1)).reshape(idx_z.shape)


def _trilinear(vol, coords, cval):
    """Order-1 sampling with constant out-of-bounds fill."""
    Z, Y, X = vol.shape
    cz, cy, cx = coords
    z0 = jnp.floor(cz).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    fz, fy, fx = cz - z0, cy - y0, cx - x0
    out = jnp.zeros(cz.shape, vol.dtype)
    for dz in (0, 1):
        wz = jnp.where(dz, fz, 1.0 - fz)
        for dy in (0, 1):
            wy = jnp.where(dy, fy, 1.0 - fy)
            for dx in (0, 1):
                wx = jnp.where(dx, fx, 1.0 - fx)
                iz, iy, ix = z0 + dz, y0 + dy, x0 + dx
                valid = ((iz >= 0) & (iz < Z) & (iy >= 0) & (iy < Y)
                         & (ix >= 0) & (ix < X))
                v = _gather_nd(vol, jnp.clip(iz, 0, Z - 1),
                               jnp.clip(iy, 0, Y - 1),
                               jnp.clip(ix, 0, X - 1))
                out = out + wz * wy * wx * jnp.where(valid, v, cval)
    return out


def _catmull_rom_w(t):
    """4 weights for taps at offsets (-1, 0, 1, 2), t in [0, 1)."""
    t2, t3 = t * t, t * t * t
    return (
        -0.5 * t3 + t2 - 0.5 * t,
        1.5 * t3 - 2.5 * t2 + 1.0,
        -1.5 * t3 + 2.0 * t2 + 0.5 * t,
        0.5 * t3 - 0.5 * t2,
    )


def _tricubic(vol, coords, cval):
    """Catmull-Rom cubic sampling (64 taps) with constant fill — the data-
    channel interpolation (host native resampler uses the same kernel)."""
    Z, Y, X = vol.shape
    cz, cy, cx = coords
    z0 = jnp.floor(cz).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    x0 = jnp.floor(cx).astype(jnp.int32)
    wz = _catmull_rom_w(cz - z0)
    wy = _catmull_rom_w(cy - y0)
    wx = _catmull_rom_w(cx - x0)
    out = jnp.zeros(cz.shape, jnp.float32)
    for dz in range(4):
        iz = z0 + dz - 1
        vz = (iz >= 0) & (iz < Z)
        izc = jnp.clip(iz, 0, Z - 1)
        for dy in range(4):
            iy = y0 + dy - 1
            vy = (iy >= 0) & (iy < Y)
            iyc = jnp.clip(iy, 0, Y - 1)
            w2 = wz[dz] * wy[dy]
            for dx in range(4):
                ix = x0 + dx - 1
                valid = vz & vy & (ix >= 0) & (ix < X)
                v = _gather_nd(vol, izc, iyc, jnp.clip(ix, 0, X - 1))
                out = out + w2 * wx[dx] * jnp.where(valid, v, cval)
    return out


# The direct warp (``_affine_coords`` + ``_trilinear``/``_tricubic``) is the
# *oracle*: geometrically exact one-shot resampling, but its arbitrary-coord
# gathers are TPU-hostile (measured 53 s for an order-3 warp of a 2x128^3x4
# batch on v5e — XLA lowers the 64-tap linear-index gather to scalar loads).
# The production path below factors the affine into elementary SHEAR/SCALE
# passes, each a 1-D resample along a single axis whose sample position
# depends on at most one other coordinate — so each pass is a batched
# (I_out x I_in) interpolation-matrix matmul that runs on the MXU.  The
# composed coordinate map is EXACTLY the requested affine (LU factorization,
# center-conjugated); the delta vs the one-shot oracle is interpolation
# smoothing from repeated 1-D kernels (the classic Paeth-shear rotation
# trade) and edge fill — acceptable for a stochastic augmentation, and the
# linear-ramp/identity cases stay exact.


def _lu_shear_passes(mat):
    """Factor ``mat`` into 9 elementary passes (applied order).

    Each pass is ``(axis_i, axis_j, m, alpha)``: resample along ``axis_i`` at
    ``src_i = m*(v_i - c_i) + alpha*(v_j - c_j) + c_i`` (``axis_j`` None for
    pure scales).  Product P9..P1 == mat via Doolittle LU:
    mat = L(l10,l20,l21) @ diag(d) @ U'(u01,u02,u12); elementary expansions
    are exact for unit-triangular 3x3.  Pivots d0, d1 stay > 0.4 for the
    augmentation's parameter range (rotations <= 30deg/axis, scale 0.7-1.4).
    """
    a = mat
    d0 = a[0, 0]
    u01 = a[0, 1] / d0
    u02 = a[0, 2] / d0
    l10 = a[1, 0] / d0
    l20 = a[2, 0] / d0
    d1 = a[1, 1] - l10 * u01 * d0
    u12 = (a[1, 2] - l10 * u02 * d0) / d1
    l21 = (a[2, 1] - l20 * u01 * d0) / d1
    d2 = a[2, 2] - l20 * u02 * d0 - l21 * u12 * d1
    one = jnp.float32(1.0)
    # (I+aE01)(I+bE02)(I+cE12) == I + aE01 + (b+ac)E02 + cE12
    b_ = u02 - u01 * u12
    # Each loop step does out_k(v) = out_{k-1}(P_k v), so the composed
    # sampling matrix is P1 @ P2 @ ... @ Pn with P1 applied FIRST — the
    # list below is therefore in matrix-product order L @ D @ U'.
    return [
        (1, 0, one, l10),     # E10
        (2, 0, one, l20),     # E20
        (2, 1, one, l21),     # E21
        (0, None, d0, None),  # S0
        (1, None, d1, None),  # S1
        (2, None, d2, None),  # S2
        (0, 1, one, u01),     # E01
        (0, 2, one, b_),      # E02
        (1, 2, one, u12),     # E12
    ]


def _pass_matrix(pos, size, order):
    """(.., I_out) sample positions -> (.., I_out, I_in) interpolation matrix
    plus the in-bounds weight mass (for constant fill)."""
    base = jnp.floor(pos).astype(jnp.int32)
    t = pos - base
    if order == 3:
        ws, offs = _catmull_rom_w(t), (-1, 0, 1, 2)
    else:
        ws, offs = (1.0 - t, t), (0, 1)
    W = jnp.zeros((*pos.shape, size), jnp.float32)
    mass = jnp.zeros(pos.shape, jnp.float32)
    for w, off in zip(ws, offs):
        idx = base + off
        valid = (idx >= 0) & (idx < size)
        wv = jnp.where(valid, w, 0.0)
        W = W + wv[..., None] * jax.nn.one_hot(jnp.clip(idx, 0, size - 1),
                                               size, dtype=jnp.float32)
        mass = mass + wv
    return W, mass


_PASS_SUBS = {
    (0, 1): "yab,byxc->ayxc", (0, 2): "xab,byxc->ayxc",
    (1, 0): "zab,zbxc->zaxc", (1, 2): "xab,zbxc->zaxc",
    (2, 0): "zab,zybc->zyac", (2, 1): "yab,zybc->zyac",
    (0, None): "ab,byxc->ayxc", (1, None): "ab,zbxc->zaxc",
    (2, None): "ab,zybc->zyac",
}


def _shear_pass(vol, axis_i, axis_j, m, alpha, order, cval):
    """One elementary resample of ``vol`` (Z, Y, X, C) along ``axis_i``."""
    shape = vol.shape[:3]
    I = shape[axis_i]
    ci = (I - 1) / 2.0
    pos = m * (jnp.arange(I, dtype=jnp.float32) - ci) + ci    # (I,)
    if axis_j is not None:
        J = shape[axis_j]
        cj = (J - 1) / 2.0
        pos = pos[None, :] + alpha * (jnp.arange(J, dtype=jnp.float32)
                                      - cj)[:, None]          # (J, I)
    W, mass = _pass_matrix(pos, I, order)
    out = jnp.einsum(_PASS_SUBS[(axis_i, axis_j)], W, vol,
                     precision=jax.lax.Precision.HIGHEST)
    if cval != 0.0:
        miss = 1.0 - mass                                     # (J, I) | (I,)
        bshape = [1, 1, 1, 1]
        bshape[axis_i] = I
        if axis_j is not None:
            bshape[axis_j] = J
            if axis_j > axis_i:
                miss = miss.T                                 # index as (i, j)
        out = out + cval * miss.reshape(bshape)
    return out


def _warp_affine_shear(vol, mat, order, cval):
    """Resample ``vol`` (Z, Y, X, C) at src = mat @ (dst - c) + c via shear
    passes. Centering conjugates every pass, so the composed map is exactly
    the centered affine with no offset bookkeeping."""
    out = vol.astype(jnp.float32)
    for axis_i, axis_j, m, alpha in _lu_shear_passes(mat):
        out = _shear_pass(out, axis_i, axis_j, m, alpha, order, cval)
    return out


def _spatial(img, seg, key, p_rot, p_scale, angle, scale_lo, scale_hi,
             order_data):
    kd, kr, ks, km = jax.random.split(key, 4)
    do_rot = _u(kd, 0, 1) < p_rot
    do_scale = _u(jax.random.fold_in(kd, 1), 0, 1) < p_scale
    mat = jnp.where(do_rot, _rotation_matrix(kr, angle), jnp.eye(3))
    sc = jnp.where(do_scale, _u(ks, scale_lo, scale_hi), 1.0)
    mat = mat * sc
    fire = do_rot | do_scale
    img_w = _warp_affine_shear(img.astype(jnp.float32), mat,
                               order_data, 0.0)
    seg_w = jnp.rint(_warp_affine_shear(seg.astype(jnp.float32)[..., None],
                                        mat, 1, -1.0)[..., 0])
    img = jnp.where(fire, img_w.astype(img.dtype), img)
    seg = jnp.where(fire, seg_w.astype(seg.dtype), seg)
    return img, seg


# ---------------------------------------------------------------------------
# intensity transforms (same p / ranges as augment.py)
# ---------------------------------------------------------------------------


def _noise(img, key, p=0.1, var_hi=0.1):
    k1, k2, k3 = jax.random.split(key, 3)
    fire = _u(k1, 0, 1) < p
    var = _u(k2, 0.0, var_hi)
    n = jax.random.normal(k3, img.shape, jnp.float32) * jnp.sqrt(var)
    return jnp.where(fire, img + n.astype(img.dtype), img)


def _blur(img, key, p=0.2, p_channel=0.5, sig_lo=0.5, sig_hi=1.0, radius=4):
    """Per-channel separable gaussian; kernel radius covers scipy's
    truncate=4 at sigma<=1 (radius = int(4*sigma + 0.5))."""
    C = img.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    fire = _u(k1, 0, 1) < p
    ch = _u(k2, 0, 1, (C,)) < p_channel
    sig = _u(k3, sig_lo, sig_hi, (C,))
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (offs[None, :] / sig[:, None]) ** 2)   # (C, K)
    # scipy zeroes taps beyond int(4*sigma+0.5) before normalizing
    eff = jnp.floor(4.0 * sig + 0.5)
    w = jnp.where(jnp.abs(offs[None, :]) <= eff[:, None], w, 0.0)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    out = img.astype(jnp.float32)
    for axis in range(3):
        acc = jnp.zeros_like(out)
        for i, off in enumerate(range(-radius, radius + 1)):
            # edge handling: nearest-clamp (scipy gaussian_filter default is
            # 'reflect'; the difference is confined to a 4-voxel border of a
            # stochastic transform)
            idx = jnp.clip(jnp.arange(out.shape[axis]) + off, 0,
                           out.shape[axis] - 1)
            acc = acc + w[:, i] * jnp.take(out, idx, axis=axis)
        out = acc
    sel = fire & ch
    return jnp.where(sel, out.astype(img.dtype), img)


def _brightness(img, key, p=0.15, lo=0.75, hi=1.25):
    C = img.shape[-1]
    k1, k2 = jax.random.split(key)
    fire = _u(k1, 0, 1) < p
    mult = _u(k2, lo, hi, (C,))
    return jnp.where(fire, img * mult.astype(img.dtype), img)


def _contrast(img, key, p=0.15, lo=0.75, hi=1.25):
    C = img.shape[-1]
    k1, k2 = jax.random.split(key)
    fire = _u(k1, 0, 1) < p
    f = _u(k2, lo, hi, (C,))
    x = img.astype(jnp.float32)
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    mn = jnp.min(x, axis=(0, 1, 2), keepdims=True)
    mx = jnp.max(x, axis=(0, 1, 2), keepdims=True)
    y = jnp.clip((x - mean) * f + mean, mn, mx)
    return jnp.where(fire, y.astype(img.dtype), img)


def _axis_lowres_taps(n, z):
    """Index/weight taps along one axis for the nearest-down + Catmull-Rom-up
    composite at zoom factor ``z`` (traced scalar), static shapes.

    down: small[i] = x[round-trip nearest of i/z'], S = round(n*z) conceptual;
    up:   out[j] = cubic(small, j * S/n). All index math stays elementwise.
    """
    S = jnp.round(n * z)                      # conceptual small size (traced)
    # scipy zoom maps centers: coord_in_small = j * (S-1)/(n-1)
    j = jnp.arange(n, dtype=jnp.float32)
    pos = j * (S - 1.0) / (n - 1.0)
    base = jnp.floor(pos).astype(jnp.int32)
    t = pos - base
    ws = _catmull_rom_w(t)                    # 4 x (n,)
    idx = []
    for d in range(4):
        i_small = jnp.clip(base + d - 1, 0, jnp.maximum(S - 1.0, 0.0)
                           .astype(jnp.int32))
        # nearest-neighbor "down": small[i] = x[round(i*(n-1)/(S-1))]
        i_full = jnp.round(i_small * (n - 1.0)
                           / jnp.maximum(S - 1.0, 1.0)).astype(jnp.int32)
        idx.append(jnp.clip(i_full, 0, n - 1))
    return idx, ws


def _lowres(img, key, p=0.25, p_channel=0.5, z_lo=0.5, z_hi=1.0):
    C = img.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    fire = _u(k1, 0, 1) < p
    ch = _u(k2, 0, 1, (C,)) < p_channel
    zs = _u(k3, z_lo, z_hi, (C,))

    chans = []
    for c in range(C):
        x = img[..., c].astype(jnp.float32)
        for axis in range(3):
            idx, ws = _axis_lowres_taps(x.shape[axis], zs[c])
            acc = jnp.zeros_like(x)
            for d in range(4):
                acc = acc + jnp.moveaxis(
                    jnp.moveaxis(jnp.take(x, idx[d], axis=axis), axis, 0)
                    * ws[d].reshape(-1, *([1] * 2)), 0, axis)
            x = acc
        chans.append(x)
    out = jnp.stack(chans, axis=-1)
    sel = fire & ch
    return jnp.where(sel, out.astype(img.dtype), img)


def _gamma(img, key, p, g_lo=0.7, g_hi=1.5, invert=False, retain_stats=True,
           eps=1e-7):
    C = img.shape[-1]
    k1, k2, k3 = jax.random.split(key, 3)
    fire = _u(k1, 0, 1) < p
    coin = _u(k2, 0, 1, (C,)) < 0.5
    g = jnp.where(coin & (g_lo < 1.0),
                  _u(k3, g_lo, 1.0, (C,)),
                  _u(jax.random.fold_in(k3, 1), max(g_lo, 1.0), g_hi, (C,)))
    x = img.astype(jnp.float32)
    if invert:
        x = -x
    mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    std = jnp.std(x, axis=(0, 1, 2), keepdims=True)
    mn = jnp.min(x, axis=(0, 1, 2), keepdims=True)
    rngv = jnp.maximum(jnp.max(x, axis=(0, 1, 2), keepdims=True) - mn, eps)
    y = jnp.power((x - mn) / rngv, g) * rngv + mn
    if retain_stats:
        y = ((y - jnp.mean(y, axis=(0, 1, 2), keepdims=True))
             / jnp.maximum(jnp.std(y, axis=(0, 1, 2), keepdims=True), 1e-8)
             * std + mean)
    if invert:
        y = -y
    return jnp.where(fire, y.astype(img.dtype), img)


def _mirror(img, seg, key, axes=(0, 1, 2)):
    coins = _u(key, 0, 1, (3,)) < 0.5
    for ax in axes:
        img = jnp.where(coins[ax], jnp.flip(img, axis=ax), img)
        seg = jnp.where(coins[ax], jnp.flip(seg, axis=ax), seg)
    return img, seg


# ---------------------------------------------------------------------------
# chain
# ---------------------------------------------------------------------------


def _augment_sample(img, seg, key, mirror_axes, order_data):
    """img (Z, Y, X, C) float, seg (Z, Y, X) int (crop padding = -1)."""
    ks = jax.random.split(key, 9)
    segf = seg.astype(jnp.float32)
    img, segf = _spatial(img, segf, ks[0], 0.2, 0.2, math.radians(30.0),
                         0.7, 1.4, order_data)
    img = _noise(img, ks[1])
    img = _blur(img, ks[2])
    img = _brightness(img, ks[3])
    img = _contrast(img, ks[4])
    img = _lowres(img, ks[5])
    img = _gamma(img, ks[6], p=0.1, invert=True)
    img = _gamma(img, ks[7], p=0.3, invert=False)
    if mirror_axes:
        img, segf = _mirror(img, segf, ks[8], mirror_axes)
    seg = jnp.rint(segf).astype(jnp.int32)
    seg = jnp.where(seg == -1, 0, seg)        # RemoveLabel(-1 -> 0)
    return img, seg


@functools.partial(jax.jit, static_argnames=("mirror_axes", "order_data"))
def device_augment(image, label, key, mirror_axes=(0, 1, 2), order_data=3):
    """Batched on-device augmentation.

    Args:
      image: (B, Z, Y, X, C) float array (device layout).
      label: (B, Z, Y, X) integer labels; -1 marks crop padding.
      key:   jax PRNG key; split per sample.
    Returns (image, label) with the full default chain applied.
    """
    keys = jax.random.split(key, image.shape[0])
    return jax.vmap(
        lambda i, s, k: _augment_sample(i, s, k, mirror_axes, order_data)
    )(image, label, keys)
