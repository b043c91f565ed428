"""Direction-aware fused scan + conv vs materialized-reorder references.

The dir/slice kernels (ops/scan_pallas_dir.py) must reproduce exactly what
the reference gets by materializing flipped / slice-interleaved copies
(mamba_simple.py:215-264) — same math, different data movement.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.models.mamba import (
    MambaV3,
    slice_deinterleave,
    slice_interleave,
)
from segmamba_tpu.ops.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_directional,
)
from segmamba_tpu.ops.scan_pallas_dir import (
    mamba_scan_fused_dir,
    mamba_scan_fused_slice,
    slice_scan_supported,
)
from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused


def test_conv_directional_matches_materialized():
    rng = np.random.default_rng(0)
    B, L, D, W, S = 2, 64, 8, 4, 8
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, W, D)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((3, D)), jnp.float32)

    got = causal_conv1d_directional(x, w, bias, activation="silu", nslices=S)

    want_f = causal_conv1d(x, w[0], bias[0], activation="silu")
    want_b = jnp.flip(causal_conv1d(jnp.flip(x, axis=1), w[1], bias[1],
                                    activation="silu"), axis=1)
    want_s = slice_deinterleave(
        causal_conv1d(slice_interleave(x, S), w[2], bias[2],
                      activation="silu"), S)
    for g, want in enumerate([want_f, want_b, want_s]):
        np.testing.assert_allclose(np.asarray(got[g]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=f"group {g}")


def _scan_inputs(seed, R, L, D, N, z_rows=None):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((R, L, D)), jnp.float32)
    dt = jnp.asarray(0.3 * rng.standard_normal((R, L, D)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((z_rows or R, L, D)), jnp.float32)
    A = jnp.asarray(-np.exp(0.3 * rng.standard_normal((R, D, N))), jnp.float32)
    B = jnp.asarray(rng.standard_normal((R, L, N)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((R, L, N)), jnp.float32)
    Dsk = jnp.asarray(rng.standard_normal((R, D)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((R, D)), jnp.float32)
    return u, dt, z, A, B, C, Dsk, bias


def test_dir_scan_forward_rows_match_fused():
    """With no reverse rows the dir kernel == the existing fused kernel."""
    u, dt, z, A, B, C, Dsk, bias = _scan_inputs(1, 2, 96, 8, 4)
    want = mamba_scan_fused(u, dt, z, A, B, C, Dsk, bias)
    got = mamba_scan_fused_dir(u, dt, z, A, B, C, Dsk, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dir_scan_reverse():
    """reverse=True == flip -> fused scan -> flip, in place."""
    R = 2
    u, dt, z, A, B, C, Dsk, bias = _scan_inputs(2, R, 96, 8, 4)
    flip = lambda a: jnp.flip(a, axis=1)
    want = flip(mamba_scan_fused(flip(u), flip(dt), flip(z), A, flip(B),
                                 flip(C), Dsk, bias))
    got = mamba_scan_fused_dir(u, dt, z, A, B, C, Dsk, bias, reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dir_scan_reverse_padded():
    """Physical end-padding must stay harmless for the reverse kernel."""
    u, dt, z, A, B, C, Dsk, bias = _scan_inputs(3, 1, 50, 8, 4)
    flip = lambda a: jnp.flip(a, axis=1)
    want = flip(mamba_scan_fused(flip(u), flip(dt), flip(z), A, flip(B),
                                 flip(C), Dsk, bias))
    got = mamba_scan_fused_dir(u, dt, z, A, B, C, Dsk, bias, reverse=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dir_scan_grads():
    """Gradients flow through the in-kernel reversal identically to the
    materialized-flip formulation."""
    u, dt, z, A, B, C, Dsk, bias = _scan_inputs(4, 1, 64, 8, 4)
    flip = lambda a: jnp.flip(a, axis=1)

    def loss_dir(u, dt, z, B, C):
        out = mamba_scan_fused_dir(u, dt, z, A, B, C, Dsk, bias,
                                   reverse=True)
        return jnp.sum(out ** 2)

    def loss_mat(u, dt, z, B, C):
        out = flip(mamba_scan_fused(flip(u), flip(dt), flip(z), A, flip(B),
                                    flip(C), Dsk, bias))
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_dir, argnums=(0, 1, 2, 3, 4))(u, dt, z, B, C)
    g2 = jax.grad(loss_mat, argnums=(0, 1, 2, 3, 4))(u, dt, z, B, C)
    for a, b, name in zip(g1, g2, "u dt z B C".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=name)


def test_slice_scan_matches_interleaved_fused():
    R, L, D, N, S = 1, 64, 8, 4, 8
    assert slice_scan_supported(L, S, chunk_size=32)
    u, dt, z, A, B, C, Dsk, bias = _scan_inputs(5, R, L, D, N)
    il = lambda a: slice_interleave(a, S)
    want = slice_deinterleave(
        mamba_scan_fused(il(u), il(dt), il(z), A, il(B), il(C), Dsk, bias,
                         chunk_size=32), S)
    got = mamba_scan_fused_slice(u, dt, z, A, B, C, Dsk, bias, nslices=S,
                                 chunk_size=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_slice_scan_padded_channels():
    """dim > Dblk forces channel padding; regression for the At transpose-
    before-pad bug (padding grew the state axis and drove OOB B/C reads)."""
    R, L, D, N, S = 1, 64, 136, 4, 8
    u, dt, z, A, B, C, Dsk, bias = _scan_inputs(11, R, L, D, N)
    il = lambda a: slice_interleave(a, S)
    want = slice_deinterleave(
        mamba_scan_fused(il(u), il(dt), il(z), A, il(B), il(C), Dsk, bias,
                         chunk_size=32), S)
    got = mamba_scan_fused_slice(u, dt, z, A, B, C, Dsk, bias, nslices=S,
                                 chunk_size=32, d_block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_slice_scan_grads():
    R, L, D, N, S = 1, 64, 8, 4, 8
    u, dt, z, A, B, C, Dsk, bias = _scan_inputs(6, R, L, D, N)
    il = lambda a: slice_interleave(a, S)

    def loss_slice(u, dt, z, B, C):
        out = mamba_scan_fused_slice(u, dt, z, A, B, C, Dsk, bias,
                                     nslices=S, chunk_size=32)
        return jnp.sum(out ** 2)

    def loss_mat(u, dt, z, B, C):
        out = slice_deinterleave(
            mamba_scan_fused(il(u), il(dt), il(z), A, il(B), il(C), Dsk,
                             bias, chunk_size=32), S)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_slice, argnums=(0, 1, 2, 3, 4))(u, dt, z, B, C)
    g2 = jax.grad(loss_mat, argnums=(0, 1, 2, 3, 4))(u, dt, z, B, C)
    for a, b, name in zip(g1, g2, "u dt z B C".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=name)


@pytest.mark.parametrize("L,S,slice_kernel", [(64, 8, False), (48, 6, False),
                                              (64, 8, True)])
def test_module_dir_impl_matches_ref(L, S, slice_kernel):
    """MambaV3(scan_impl='dir') == MambaV3(scan_impl='ref') — the full
    tri-oriented module (regular + irregular shapes; the irregular case
    exercises the interleave fallback, slice_kernel=True the zero-copy
    slice kernel)."""
    rng = np.random.default_rng(7)
    B, C = 1, 8
    x = jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)
    ref_mod = MambaV3(d_model=C, d_state=4, nslices=S, scan_impl="ref")
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    want = ref_mod.apply(params, x)
    got = MambaV3(d_model=C, d_state=4, nslices=S, scan_impl="dir",
                  slice_kernel=slice_kernel).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_module_dir_impl_grads():
    rng = np.random.default_rng(8)
    B, L, C, S = 1, 64, 8, 8
    x = jnp.asarray(rng.standard_normal((B, L, C)), jnp.float32)
    ref_mod = MambaV3(d_model=C, d_state=4, nslices=S, scan_impl="ref")
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    dir_mod = MambaV3(d_model=C, d_state=4, nslices=S, scan_impl="dir")
    g_ref = jax.grad(lambda p: jnp.sum(ref_mod.apply(p, x) ** 2))(params)
    g_dir = jax.grad(lambda p: jnp.sum(dir_mod.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_dir),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)
