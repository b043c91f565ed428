"""Selective-scan op tests: kernel implementations vs a pure-numpy oracle.

Mirrors the reference test strategy
(/root/reference/mamba/tests/ops/test_selective_scan.py): parametrize over
seqlen/dtype, compare outputs, final state and all gradients against a
sequential reference with dtype-tiered tolerances (:45-47 there).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.ops import (
    selective_scan,
    selective_scan_ref,
    selective_scan_chunked,
    selective_scan_pallas,
)


def numpy_selective_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                         delta_softplus=False):
    """float64 numpy oracle, time-major layout."""
    u = np.asarray(u, np.float64)
    delta = np.asarray(delta, np.float64)
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, np.float64)
    if delta_softplus:
        delta = np.logaddexp(0.0, delta)
    A = np.asarray(A, np.float64)
    batch, L, dim = u.shape
    n = A.shape[1]
    Bv = np.asarray(B, np.float64)
    Cv = np.asarray(C, np.float64)
    x = np.zeros((batch, dim, n))
    ys = np.zeros((batch, L, dim))
    for t in range(L):
        a = np.exp(delta[:, t, :, None] * A[None])  # (batch, dim, n)
        if Bv.ndim == 3:
            bu = delta[:, t, :, None] * Bv[:, t, None, :] * u[:, t, :, None]
        else:
            bu = delta[:, t, :, None] * Bv[None] * u[:, t, :, None]
        x = a * x + bu
        if Cv.ndim == 3:
            ys[:, t] = np.einsum("bdn,bn->bd", x, Cv[:, t])
        else:
            ys[:, t] = np.einsum("bdn,dn->bd", x, Cv)
    if D is not None:
        ys = ys + u * np.asarray(D, np.float64)
    if z is not None:
        zf = np.asarray(z, np.float64)
        ys = ys * (zf / (1 + np.exp(-zf)))
    return ys, x


def make_inputs(rng, batch, L, dim, n, dtype, var_bc=True, with_d=True,
                with_z=True, with_bias=True):
    u = rng.standard_normal((batch, L, dim)).astype(dtype)
    delta = (0.5 * rng.standard_normal((batch, L, dim))).astype(dtype)
    A = -np.exp(0.5 * rng.standard_normal((dim, n))).astype(np.float32)
    if var_bc:
        B = rng.standard_normal((batch, L, n)).astype(dtype)
        C = rng.standard_normal((batch, L, n)).astype(dtype)
    else:
        B = rng.standard_normal((dim, n)).astype(np.float32)
        C = rng.standard_normal((dim, n)).astype(np.float32)
    D = rng.standard_normal(dim).astype(np.float32) if with_d else None
    z = rng.standard_normal((batch, L, dim)).astype(dtype) if with_z else None
    db = (0.3 * rng.standard_normal(dim)).astype(np.float32) if with_bias else None
    return u, delta, A, B, C, D, z, db


IMPLS = {
    "ref": selective_scan_ref,
    "chunked": selective_scan_chunked,
    "pallas": selective_scan_pallas,
}


@pytest.mark.parametrize("L", [8, 37, 128, 260, 1024])
@pytest.mark.parametrize("impl", ["ref", "chunked", "pallas"])
def test_vs_numpy_oracle(L, impl):
    rng = np.random.default_rng(0)
    batch, dim, n = 2, 12, 8
    u, delta, A, B, C, D, z, db = make_inputs(rng, batch, L, dim, n, np.float32)
    fn = IMPLS[impl]
    out, last = fn(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                   delta_softplus=True, return_last_state=True)
    want, want_x = numpy_selective_scan(u, delta, A, B, C, D, z, db, True)
    # fp32 tiers from the reference test (test_selective_scan.py:45-47)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(last), want_x, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("impl", ["ref", "chunked"])
def test_static_bc(impl):
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, z, db = make_inputs(
        rng, 1, 64, 6, 4, np.float32, var_bc=False)
    out = IMPLS[impl](u, delta, A, B, C, D=D, z=z, delta_bias=db,
                      delta_softplus=True)
    want, _ = numpy_selective_scan(u, delta, A, B, C, D, z, db, True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("impl", ["chunked", "pallas"])
@pytest.mark.parametrize("use_last", [False, True])
def test_gradients_match_ref(impl, use_last):
    """All input gradients vs autodiff of the sequential reference, on a
    shared random cotangent (reference test :121-149)."""
    rng = np.random.default_rng(2)
    batch, L, dim, n = 2, 70, 10, 4
    u, delta, A, B, C, D, z, db = make_inputs(rng, batch, L, dim, n, np.float32)
    cot_y = rng.standard_normal((batch, L, dim)).astype(np.float32)
    cot_x = rng.standard_normal((batch, dim, n)).astype(np.float32)

    def loss(fn):
        def inner(u, delta, A, B, C, D, z, db):
            y, last = fn(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                         delta_softplus=True, return_last_state=True)
            val = jnp.sum(y * cot_y)
            if use_last:
                val = val + jnp.sum(last * cot_x)
            return val
        return inner

    args = (u, delta, A, B, C, D, z, db)
    g_ref = jax.grad(loss(selective_scan_ref), argnums=range(8))(*args)
    g_imp = jax.grad(loss(IMPLS[impl]), argnums=range(8))(*args)
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias"]
    for name, a, b in zip(names, g_ref, g_imp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch for {name}")


def test_bf16_tolerance():
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, z, db = make_inputs(
        rng, 1, 256, 16, 8, np.float32)
    bf = jnp.bfloat16
    out = selective_scan_pallas(
        jnp.asarray(u, bf), jnp.asarray(delta, bf), A,
        jnp.asarray(B, bf), jnp.asarray(C, bf), D=D, z=jnp.asarray(z, bf),
        delta_bias=db, delta_softplus=True)
    want, _ = numpy_selective_scan(u, delta, A, B, C, D, z, db, True)
    # bf16 tiers from reference test_selective_scan.py:45-47
    np.testing.assert_allclose(np.asarray(out, np.float64), want,
                               rtol=5e-2, atol=5e-2)


def test_dispatch():
    rng = np.random.default_rng(4)
    u, delta, A, B, C, D, z, db = make_inputs(rng, 1, 32, 8, 4, np.float32)
    a = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                       delta_softplus=True, impl="auto")
    b = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                       delta_softplus=True, impl="ref")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_jit_and_chunk_sizes():
    rng = np.random.default_rng(5)
    u, delta, A, B, C, D, z, db = make_inputs(rng, 1, 300, 8, 4, np.float32)
    f = jax.jit(lambda *a: selective_scan_pallas(*a, delta_softplus=True,
                                                 chunk_size=64))
    out = f(u, delta, A, B, C)
    want, _ = numpy_selective_scan(u, delta, A, B, C, None, None, None, True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=1e-3)
