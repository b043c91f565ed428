"""Grouped-B/C and complex-weight selective scan vs a numpy loop oracle.

Covers the CUDA op's full input surface that SegMamba itself never uses
(G>1 groups, complex64 weights — selective_scan.cpp:235-262 and the torch
twin selective_scan_interface.py:86-152): grouped time-varying B/C where
channel d reads group d // (dim/G), and complex A/B/C with the 2*Re output
fold. Oracles are independent numpy loops, not ports.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from segmamba_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_chunked,
    selective_scan_ref,
)


def _oracle(u, delta, A, B, C, D=None):
    """Plain per-timestep numpy evaluation. B/C: (b, L, G, N) grouped or
    (b, L, N); A/B/C may be complex."""
    b, L, dim = u.shape
    N = A.shape[1]
    cplx = any(np.iscomplexobj(m) for m in (A, B, C))
    x = np.zeros((b, dim, N), np.complex64 if cplx else np.float32)

    def at(M, bi, t, d):
        if M.ndim == 3:
            return M[bi, t]
        G = M.shape[2]
        return M[bi, t, d // (dim // G)]

    y = np.zeros((b, L, dim), np.float32)
    for bi in range(b):
        for t in range(L):
            for d in range(dim):
                a = np.exp(delta[bi, t, d] * A[d])
                x[bi, d] = a * x[bi, d] + (delta[bi, t, d] * u[bi, t, d]
                                           * at(B, bi, t, d))
                yv = np.sum(x[bi, d] * at(C, bi, t, d))
                y[bi, t, d] = 2 * yv.real if cplx else yv.real
    if D is not None:
        y = y + u * D
    return y


@pytest.mark.parametrize("G", [1, 2, 4])
def test_grouped_bc_matches_oracle(G):
    rng = np.random.default_rng(0)
    b, L, dim, N = 2, 12, 8, 4
    u = rng.standard_normal((b, L, dim)).astype(np.float32)
    delta = (0.3 * np.abs(rng.standard_normal((b, L, dim)))).astype(np.float32)
    A = (-np.abs(rng.standard_normal((dim, N)))).astype(np.float32)
    B = rng.standard_normal((b, L, G, N)).astype(np.float32)
    C = rng.standard_normal((b, L, G, N)).astype(np.float32)
    D = rng.standard_normal(dim).astype(np.float32)

    want = _oracle(u, delta, A, B, C, D)
    for fn in (selective_scan_ref, selective_scan_chunked):
        got = np.asarray(fn(jnp.asarray(u), jnp.asarray(delta),
                            jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                            D=jnp.asarray(D)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # dispatch surface routes grouped inputs off the Pallas path
    got = np.asarray(selective_scan(
        jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A), jnp.asarray(B),
        jnp.asarray(C), D=jnp.asarray(D), impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("var_bc", [True, False])
def test_complex_weights_match_oracle(var_bc):
    rng = np.random.default_rng(1)
    b, L, dim, N = 1, 10, 6, 3
    u = rng.standard_normal((b, L, dim)).astype(np.float32)
    delta = (0.2 * np.abs(rng.standard_normal((b, L, dim)))).astype(np.float32)
    A = (-np.abs(rng.standard_normal((dim, N)))
         + 1j * rng.standard_normal((dim, N))).astype(np.complex64)
    if var_bc:
        B = (rng.standard_normal((b, L, N))
             + 1j * rng.standard_normal((b, L, N))).astype(np.complex64)
        C = (rng.standard_normal((b, L, N))
             + 1j * rng.standard_normal((b, L, N))).astype(np.complex64)
    else:
        B = (rng.standard_normal((dim, N))
             + 1j * rng.standard_normal((dim, N))).astype(np.complex64)
        C = (rng.standard_normal((dim, N))
             + 1j * rng.standard_normal((dim, N))).astype(np.complex64)

    # static-B/C complex oracle: per-channel weights
    if var_bc:
        want = _oracle(u, delta, A, B, C)
    else:
        bN, LN = u.shape[0], u.shape[1]
        want = np.zeros((bN, LN, dim), np.float32)
        x = np.zeros((bN, dim, N), np.complex64)
        for bi in range(bN):
            for t in range(LN):
                for d in range(dim):
                    a = np.exp(delta[bi, t, d] * A[d])
                    x[bi, d] = a * x[bi, d] + delta[bi, t, d] * u[bi, t, d] * B[d]
                    want[bi, t, d] = 2 * np.sum(x[bi, d] * C[d]).real

    for fn in (selective_scan_ref, selective_scan_chunked):
        got, last = fn(jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A),
                       jnp.asarray(B), jnp.asarray(C),
                       return_last_state=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-5)
        assert np.iscomplexobj(np.asarray(last))
