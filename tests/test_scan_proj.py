"""Projection-fused scan kernel (ops/scan_pallas_proj.py) vs composed
reference (einsum projections + selective_scan ref), interpret mode.

Mirrors the reference test style of mamba/tests/ops/test_selective_scan.py
(kernel vs pure ref, outputs + all gradients on a shared cotangent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmamba_tpu.ops.scan_pallas_proj import mamba_scan_proj
from segmamba_tpu.ops.selective_scan import selective_scan

N = 16


def _make(rng, b, L, D, rank, dtype=jnp.float32):
    return dict(
        xc=jnp.asarray(rng.standard_normal((b, L, D)), dtype),
        z=jnp.asarray(rng.standard_normal((b, L, D)), dtype),
        acc=jnp.asarray(rng.standard_normal((b, L, D)), dtype),
        x_proj=jnp.asarray(rng.standard_normal((D, rank + 2 * N)) * 0.1,
                           dtype),
        dt_proj=jnp.asarray(rng.standard_normal((rank, D)) * 0.3,
                            jnp.float32),
        dt_bias=jnp.asarray(rng.standard_normal((D,)) * 0.5, jnp.float32),
        A=-jnp.exp(jnp.asarray(rng.standard_normal((D, N)), jnp.float32)),
        Dv=jnp.asarray(rng.standard_normal((D,)), jnp.float32),
    )


def _ref(xc, x_proj, dt_proj, dt_bias, A, Dv, z=None, acc=None,
         reverse=False):
    rank = x_proj.shape[1] - 2 * N
    x_dbl = jnp.einsum("bld,de->ble", xc, x_proj)
    dt = jnp.einsum("blr,rd->bld", x_dbl[..., :rank].astype(jnp.float32),
                    dt_proj)
    B = x_dbl[..., rank:rank + N].astype(jnp.float32)
    C = x_dbl[..., rank + N:].astype(jnp.float32)
    xin, dtin, Bin, Cin = ((jnp.flip(t, 1) for t in (xc, dt, B, C))
                           if reverse else (xc, dt, B, C))
    y = selective_scan(xin, dtin, A, Bin, Cin, D=Dv, delta_bias=dt_bias,
                       delta_softplus=True, impl="ref")
    if reverse:
        y = jnp.flip(y, 1)
    y = y.astype(jnp.float32)
    if acc is not None:
        y = y + acc.astype(jnp.float32)
    if z is not None:
        z = z.astype(jnp.float32)
        y = y * jax.nn.silu(z)
    return y


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("L,D,rank", [(256, 96, 3), (300, 64, 4), (96, 128, 8)])
def test_proj_forward(reverse, L, D, rank):
    a = _make(np.random.default_rng(0), 2, L, D, rank)
    for z, acc in ((a["z"], a["acc"]), (None, a["acc"]), (None, None),
                   (a["z"], None)):
        got = mamba_scan_proj(a["xc"], a["x_proj"], a["dt_proj"],
                              a["dt_bias"], a["A"], a["Dv"], z=z, acc=acc,
                              reverse=reverse)
        want = _ref(a["xc"], a["x_proj"], a["dt_proj"], a["dt_bias"],
                    a["A"], a["Dv"], z=z, acc=acc, reverse=reverse)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=2e-4, rtol=1e-3)


def test_proj_chain_grads():
    """Gradients of the full 3-orientation chain (slice via pre-interleaved
    input) vs the composed reference, all 9 leaves."""
    rng = np.random.default_rng(1)
    b, L, D, rank = 1, 256, 96, 3
    a = _make(rng, b, L, D, rank)
    xcr = jnp.asarray(rng.standard_normal((b, L, D)), jnp.float32)
    xcs = jnp.asarray(rng.standard_normal((b, L, D)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, L, D)), jnp.float32)
    args = (a["xc"], xcr, xcs, a["z"], a["x_proj"], a["dt_proj"],
            a["dt_bias"], a["A"], a["Dv"])

    def chain(run):
        def loss(args):
            xcf, xcr, xcs, z, wp, dtp, bias, A, Dv = args
            ys = run(xcs, wp, dtp, bias, A, Dv)
            yr = run(xcr, wp, dtp, bias, A, Dv, acc=ys, reverse=True)
            return jnp.sum(run(xcf, wp, dtp, bias, A, Dv, acc=yr, z=z) * cot)
        return loss

    g_new = jax.grad(chain(
        lambda *a, **k: mamba_scan_proj(*a, **k)))(args)
    g_ref = jax.grad(chain(_ref))(args)
    for name, gn, gr in zip(
            "xcf xcr xcs z x_proj dt_proj dt_bias A Dv".split(),
            g_new, g_ref):
        scale = float(jnp.max(jnp.abs(gr))) + 1e-8
        np.testing.assert_allclose(np.asarray(gn) / scale,
                                   np.asarray(gr) / scale, atol=1e-4,
                                   err_msg=name)


def test_proj_bf16_io():
    a = _make(np.random.default_rng(2), 1, 128, 96, 3, dtype=jnp.bfloat16)
    got = mamba_scan_proj(a["xc"], a["x_proj"], a["dt_proj"], a["dt_bias"],
                          a["A"], a["Dv"], z=a["z"])
    assert got.dtype == jnp.bfloat16
    want = _ref(a["xc"].astype(jnp.float32),
                a["x_proj"].astype(jnp.float32), a["dt_proj"], a["dt_bias"],
                a["A"], a["Dv"], z=a["z"].astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=8e-2, rtol=8e-2)


@pytest.mark.heavy
def test_mamba_v3_proj_matches_ref():
    """MambaV3(scan_impl='proj') == MambaV3(scan_impl='ref') with shared
    params — the model-level wiring of the chained kernel (conv directional
    groups + slice interleave + gate-once)."""
    from segmamba_tpu.models.mamba import MambaV3

    rng = np.random.default_rng(3)
    b, L, d_model, ns = 2, 64, 16, 4
    x = jnp.asarray(rng.standard_normal((b, L, d_model)), jnp.float32)
    m_ref = MambaV3(d_model=d_model, nslices=ns, scan_impl="ref")
    m_proj = MambaV3(d_model=d_model, nslices=ns, scan_impl="proj")
    params = m_ref.init(jax.random.key(0), x)

    y_ref = m_ref.apply(params, x)
    y_proj = m_proj.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_proj), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-3)

    cot = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda p: jnp.sum(m_ref.apply(p, x) * cot))(params)
    g_proj = jax.grad(lambda p: jnp.sum(m_proj.apply(p, x) * cot))(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_proj)
    for (pr, vr), (pp, vp) in zip(flat_r, flat_p):
        scale = float(jnp.max(jnp.abs(vr))) + 1e-8
        np.testing.assert_allclose(np.asarray(vp) / scale,
                                   np.asarray(vr) / scale, atol=2e-4,
                                   err_msg=str(pr))
