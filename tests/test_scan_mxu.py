"""MXU ratio-form scan kernel (ops/scan_pallas_mxu.py) vs the numpy oracle:
outputs, final state, all gradients, and the overflow guard dispatch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.ops.scan_pallas_mxu import (
    MAX_BLOCK_DROP,
    _block_drop,
    selective_scan_mxu,
)
from segmamba_tpu.ops.selective_scan import selective_scan_ref

from test_selective_scan import make_inputs, numpy_selective_scan


@pytest.mark.parametrize("L", [8, 37, 128, 260, 1024])
def test_vs_numpy_oracle(L):
    rng = np.random.default_rng(0)
    batch, dim, n = 2, 12, 8
    u, delta, A, B, C, D, z, db = make_inputs(rng, batch, L, dim, n, np.float32)
    out, last = selective_scan_mxu(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                                   delta_softplus=True, return_last_state=True)
    want, want_x = numpy_selective_scan(u, delta, A, B, C, D, z, db, True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(last), want_x, rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("use_last", [False, True])
def test_gradients_match_ref(use_last):
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
    g_imp = jax.grad(loss(selective_scan_mxu), argnums=range(8))(*args)
    names = ["u", "delta", "A", "B", "C", "D", "z", "delta_bias"]
    for name, a, b in zip(names, g_ref, g_imp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"grad mismatch for {name}")


def test_multichunk_carry():
    """Carry chaining across several chunks (L spans 3 chunks at T=128)."""
    rng = np.random.default_rng(7)
    u, delta, A, B, C, D, z, db = make_inputs(rng, 1, 384, 8, 4, np.float32)
    out, last = selective_scan_mxu(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                                   delta_softplus=True, return_last_state=True)
    want, want_x = numpy_selective_scan(u, delta, A, B, C, D, z, db, True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(last), want_x, rtol=2e-3, atol=1e-3)


def test_guard_routes_pathological_decay():
    """Inputs whose in-chunk decay overflows the ratio form must still be
    exact (the guard dispatches to the Hillis-Steele kernel)."""
    rng = np.random.default_rng(8)
    batch, L, dim, n = 1, 256, 8, 4
    u, delta, A, B, C, D, z, db = make_inputs(rng, batch, L, dim, n, np.float32)
    # drive delta huge so softplus(delta) ~ delta and the block drop explodes
    delta = np.abs(delta) + 40.0
    At = jnp.asarray(A.T)
    d = jax.nn.softplus(jnp.asarray(delta) + jnp.asarray(db))
    assert float(_block_drop(d, At, 16)) > MAX_BLOCK_DROP

    out, last = selective_scan_mxu(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                                   delta_softplus=True, return_last_state=True)
    want, want_x = numpy_selective_scan(u, delta, A, B, C, D, z, db, True)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(last), want_x, rtol=2e-3, atol=2e-3)

    # gradients are finite and match through the guarded path too
    cot = rng.standard_normal(out.shape).astype(np.float32)

    def loss(fn, *a):
        return jnp.sum(fn(*a, D=D, z=z, delta_bias=db, delta_softplus=True)
                       * cot)

    g_ref = jax.grad(lambda *a: loss(selective_scan_ref, *a), argnums=(0, 1))(
        u, delta, A, B, C)
    g_mxu = jax.grad(lambda *a: loss(selective_scan_mxu, *a), argnums=(0, 1))(
        u, delta, A, B, C)
    for a, b in zip(g_ref, g_mxu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_unguarded_matches_on_benign_inputs():
    rng = np.random.default_rng(9)
    u, delta, A, B, C, D, z, db = make_inputs(rng, 1, 256, 8, 4, np.float32)
    a = selective_scan_mxu(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                           delta_softplus=True, guarded=False)
    b = selective_scan_mxu(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                           delta_softplus=True, guarded=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_dispatch_impl_mxu():
    from segmamba_tpu.ops import selective_scan

    rng = np.random.default_rng(10)
    u, delta, A, B, C, D, z, db = make_inputs(rng, 1, 64, 8, 4, np.float32)
    a = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                       delta_softplus=True, impl="mxu")
    b = selective_scan(u, delta, A, B, C, D=D, z=z, delta_bias=db,
                       delta_softplus=True, impl="ref")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)
