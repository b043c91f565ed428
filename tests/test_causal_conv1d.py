"""Causal conv1d vs numpy oracle + update-step consistency.

Mirrors /root/reference/causal-conv1d/tests/test_causal_conv1d.py:14-76
(seqlens incl. non-powers-of-2, widths 2-4, bias, silu)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.ops import causal_conv1d, causal_conv1d_update


def numpy_causal_conv1d(x, w, b=None, silu=False):
    batch, L, dim = x.shape
    K = w.shape[0]
    x64 = np.asarray(x, np.float64)
    xp = np.pad(x64, ((0, 0), (K - 1, 0), (0, 0)))
    y = np.zeros_like(x64)
    for i in range(K):
        y += np.asarray(w[i], np.float64) * xp[:, i:i + L]
    if b is not None:
        y += np.asarray(b, np.float64)
    if silu:
        y = y / (1 + np.exp(-y))
    return y


@pytest.mark.parametrize("L", [8, 151, 372, 512])
@pytest.mark.parametrize("K", [2, 3, 4])
@pytest.mark.parametrize("silu", [False, True])
def test_vs_numpy(L, K, silu):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, L, 6)).astype(np.float32)
    w = rng.standard_normal((K, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    out = causal_conv1d(x, w, b, activation="silu" if silu else None)
    want = numpy_causal_conv1d(x, w, b, silu)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_grad_exists():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 32, 4)).astype(np.float32)
    w = rng.standard_normal((4, 4)).astype(np.float32)

    def f(x, w):
        return jnp.sum(causal_conv1d(x, w, activation="silu") ** 2)

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    assert gx.shape == x.shape and gw.shape == w.shape
    assert np.isfinite(np.asarray(gx)).all()


def test_update_matches_full():
    """Streaming update over a sequence equals the full conv."""
    rng = np.random.default_rng(2)
    L, K, dim = 12, 4, 5
    x = rng.standard_normal((1, L, dim)).astype(np.float32)
    w = rng.standard_normal((K, dim)).astype(np.float32)
    b = rng.standard_normal(dim).astype(np.float32)
    full = np.asarray(causal_conv1d(x, w, b, activation="silu"))
    state = jnp.zeros((1, K, dim), jnp.float32)
    outs = []
    for t in range(L):
        o, state = causal_conv1d_update(x[:, t], state, w, b, activation="silu")
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.stack(outs, 1), full, rtol=1e-5, atol=1e-5)
