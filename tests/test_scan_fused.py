"""Fused gated scan kernel vs the composed reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.ops import mamba_inner, selective_scan_ref
from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused


def make_inputs(rng, B, L, D, N, dtype=np.float32):
    u = rng.standard_normal((B, L, D)).astype(dtype)
    dt = (0.3 * rng.standard_normal((B, L, D))).astype(dtype)
    z = rng.standard_normal((B, L, D)).astype(dtype)
    A = -np.exp(0.3 * rng.standard_normal((D, N))).astype(np.float32)
    Bm = rng.standard_normal((B, L, N)).astype(dtype)
    Cm = rng.standard_normal((B, L, N)).astype(dtype)
    Dv = rng.standard_normal(D).astype(np.float32)
    bias = (0.1 * rng.standard_normal(D)).astype(np.float32)
    return u, dt, z, A, Bm, Cm, Dv, bias


@pytest.mark.parametrize("L,D", [(64, 8), (300, 12), (128, 130)])
def test_fused_forward_matches_ref(L, D):
    rng = np.random.default_rng(0)
    u, dt, z, A, Bm, Cm, Dv, bias = make_inputs(rng, 2, L, D, 4)
    got = mamba_scan_fused(u, dt, z, A, Bm, Cm, Dv, bias, chunk_size=64)
    want = selective_scan_ref(u, dt, A, Bm, Cm, D=Dv, z=z, delta_bias=bias,
                              delta_softplus=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-3)


def test_fused_gradients_match_ref():
    rng = np.random.default_rng(1)
    u, dt, z, A, Bm, Cm, Dv, bias = make_inputs(rng, 1, 70, 10, 4)
    cot = rng.standard_normal((1, 70, 10)).astype(np.float32)

    def loss_fused(u, dt, z, A, Bm, Cm, Dv, bias):
        return jnp.sum(mamba_scan_fused(u, dt, z, A, Bm, Cm, Dv, bias,
                                        chunk_size=32) * cot)

    def loss_ref(u, dt, z, A, Bm, Cm, Dv, bias):
        return jnp.sum(selective_scan_ref(
            u, dt, A, Bm, Cm, D=Dv, z=z, delta_bias=bias,
            delta_softplus=True) * cot)

    args = (u, dt, z, A, Bm, Cm, Dv, bias)
    g1 = jax.grad(loss_fused, argnums=range(8))(*args)
    g2 = jax.grad(loss_ref, argnums=range(8))(*args)
    names = ["u", "dt", "z", "A", "B", "C", "D", "bias"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=3e-3,
                                   err_msg=f"grad mismatch: {n}")


def test_mamba_inner_fused_dispatch_matches():
    """impl='fused' (forced kernel path) must equal impl='ref' end to end."""
    rng = np.random.default_rng(2)
    B, L, Din, N, R = 1, 96, 8, 4, 2
    xz = jnp.asarray(rng.standard_normal((B, L, 2 * Din)), jnp.float32)
    conv_w = (0.3 * rng.standard_normal((4, Din))).astype(np.float32)
    conv_b = (0.1 * rng.standard_normal(Din)).astype(np.float32)
    x_proj = (0.3 * rng.standard_normal((Din, R + 2 * N))).astype(np.float32)
    dt_proj = (0.3 * rng.standard_normal((R, Din))).astype(np.float32)
    dt_bias = (0.1 * rng.standard_normal(Din)).astype(np.float32)
    A = -np.exp(0.3 * rng.standard_normal((Din, N))).astype(np.float32)
    Dv = np.ones(Din, np.float32)

    kw = dict(d_state=N)
    want = mamba_inner(xz, conv_w, conv_b, x_proj, dt_proj, dt_bias, A, Dv,
                       impl="ref", **kw)
    got = mamba_inner(xz, conv_w, conv_b, x_proj, dt_proj, dt_bias, A, Dv,
                      impl="fused", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-3)


def test_fused_bf16():
    rng = np.random.default_rng(3)
    u, dt, z, A, Bm, Cm, Dv, bias = make_inputs(rng, 1, 128, 16, 8)
    bf = jnp.bfloat16
    got = mamba_scan_fused(jnp.asarray(u, bf), jnp.asarray(dt, bf),
                           jnp.asarray(z, bf), A, jnp.asarray(Bm, bf),
                           jnp.asarray(Cm, bf), Dv, bias)
    assert got.dtype == bf
    want = selective_scan_ref(u, dt, A, Bm, Cm, D=Dv, z=z, delta_bias=bias,
                              delta_softplus=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=5e-2, atol=5e-2)


def test_fused_bf16_gradients():
    """Grad dtypes must match bf16 primals (train path runs fully in bf16)."""
    rng = np.random.default_rng(4)
    u, dt, z, A, Bm, Cm, Dv, bias = make_inputs(rng, 1, 64, 8, 4)
    bf = jnp.bfloat16
    args = (jnp.asarray(u, bf), jnp.asarray(dt, bf), jnp.asarray(z, bf),
            jnp.asarray(A), jnp.asarray(Bm, bf), jnp.asarray(Cm, bf),
            jnp.asarray(Dv), jnp.asarray(bias))

    def loss(*a):
        return jnp.sum(mamba_scan_fused(*a).astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=range(8))(*args)
    for g, a in zip(grads, args):
        assert g.dtype == a.dtype, (g.dtype, a.dtype)
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
