"""Decode path: selective_state_update vs full scan, fused norms, LM stack
step-vs-parallel consistency, generation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.models.mamba_lm import Block, MambaLMHeadModel, MambaUni
from segmamba_tpu.ops import selective_scan_ref
from segmamba_tpu.ops.fused_norm import layer_norm_fn, rms_norm_fn
from segmamba_tpu.ops.selective_state_update import selective_state_update


def test_state_update_matches_scan():
    """Stepping the recurrence token by token must equal the full scan
    (reference test_selective_state_update.py pattern)."""
    rng = np.random.default_rng(0)
    B, L, D, N = 2, 10, 6, 4
    u = rng.standard_normal((B, L, D)).astype(np.float32)
    dt = (0.2 * rng.standard_normal((B, L, D))).astype(np.float32)
    A = -np.exp(rng.standard_normal((D, N)) * 0.3).astype(np.float32)
    Bm = rng.standard_normal((B, L, N)).astype(np.float32)
    Cm = rng.standard_normal((B, L, N)).astype(np.float32)
    Dsk = rng.standard_normal(D).astype(np.float32)
    z = rng.standard_normal((B, L, D)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(D)).astype(np.float32)

    full = selective_scan_ref(u, dt, A, Bm, Cm, D=Dsk, z=z, delta_bias=bias,
                              delta_softplus=True)
    state = jnp.zeros((B, D, N), jnp.float32)
    outs = []
    for t in range(L):
        y, state = selective_state_update(
            state, u[:, t], dt[:, t], A, Bm[:, t], Cm[:, t], D=Dsk,
            z=z[:, t], dt_bias=bias, dt_softplus=True)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_fused_norms():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    w = jnp.ones(16) * 1.5
    b = jnp.ones(16) * 0.2
    out, new_res = layer_norm_fn(x, w, b, residual=res, prenorm=True)
    np.testing.assert_allclose(np.asarray(new_res), np.asarray(x + res),
                               rtol=1e-6)
    s = np.asarray(x + res)
    want = (s - s.mean(-1, keepdims=True)) / np.sqrt(
        s.var(-1, keepdims=True) + 1e-6) * 1.5 + 0.2
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)

    r = rms_norm_fn(x, w, residual=None, prenorm=False)
    xs = np.asarray(x)
    want_r = xs / np.sqrt((xs ** 2).mean(-1, keepdims=True) + 1e-6) * 1.5
    np.testing.assert_allclose(np.asarray(r), want_r, rtol=1e-4, atol=1e-5)


def test_mamba_uni_step_matches_parallel():
    """Token-by-token decode must equal the parallel forward."""
    rng = np.random.default_rng(2)
    m = MambaUni(d_model=8, d_state=4, scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    full = m.apply(params, x)

    cache = m.apply(params, 2, method=MambaUni.init_cache)
    outs = []
    for t in range(6):
        y, cache = m.apply(params, x[:, t], cache, method=MambaUni.step)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full),
                               rtol=1e-3, atol=1e-4)


def test_prefill_cache_matches_sequential_steps():
    """forward_with_cache (parallel prefill) must land in exactly the state
    that token-by-token stepping reaches, so decode can continue from it."""
    rng = np.random.default_rng(5)
    m = MambaUni(d_model=8, d_state=4, scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((2, 6, 8)), jnp.float32)
    params = m.init(jax.random.key(0), x)

    out_par, cache_par = m.apply(params, x,
                                 method=MambaUni.forward_with_cache)
    full = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_par), np.asarray(full),
                               rtol=1e-4, atol=1e-5)

    cache = m.apply(params, 2, method=MambaUni.init_cache)
    for t in range(6):
        _, cache = m.apply(params, x[:, t], cache, method=MambaUni.step)
    np.testing.assert_allclose(np.asarray(cache_par["conv"]),
                               np.asarray(cache["conv"]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_par["ssm"]),
                               np.asarray(cache["ssm"]), rtol=1e-3,
                               atol=1e-4)


def test_prefill_cache_short_prompt():
    """Prompts shorter than d_conv need left-zero-padded conv state."""
    rng = np.random.default_rng(6)
    m = MambaUni(d_model=8, d_state=4, d_conv=4, scan_impl="ref")
    x = jnp.asarray(rng.standard_normal((1, 2, 8)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    _, cache_par = m.apply(params, x, method=MambaUni.forward_with_cache)
    cache = m.apply(params, 1, method=MambaUni.init_cache)
    for t in range(2):
        _, cache = m.apply(params, x[:, t], cache, method=MambaUni.step)
    np.testing.assert_allclose(np.asarray(cache_par["conv"]),
                               np.asarray(cache["conv"]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_par["ssm"]),
                               np.asarray(cache["ssm"]), rtol=1e-3,
                               atol=1e-4)


def test_lm_forward_and_generate():
    model = MambaLMHeadModel(vocab_size=50, d_model=16, n_layer=2,
                             rms_norm=True, scan_impl="ref")
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 50, (2, 7)))
    params = model.init(jax.random.key(0), ids)
    logits = model.apply(params, ids)
    assert logits.shape == (2, 7, 50)

    out = model.apply(params, ids, 5, method=MambaLMHeadModel.generate)
    assert out.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(out[:, :7]), np.asarray(ids))

    # greedy generation consistency: step logits == parallel logits
    full_logits = model.apply(params, out)
    # next-token from parallel forward at position 6 should equal out[:, 7]
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(full_logits[:, 6], -1)), np.asarray(out[:, 7]))
