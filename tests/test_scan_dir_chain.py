"""Chained (acc/gate) options of the direction-aware scan kernel
(ops/scan_pallas_dir.py mamba_scan_fused_dir) vs the selective_scan
reference, interpret mode.

Mirrors the reference test style of mamba/tests/ops/test_selective_scan.py
(kernel vs pure ref, outputs + all gradients on a shared cotangent), plus
the chain property the options exist for: the reverse orientation's ungated
partial fed through ``acc`` with one shared gate must equal the sum of
independently gated direction outputs (the scan_impl="dir2" MambaV3 path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmamba_tpu.ops.scan_pallas_dir import mamba_scan_fused_dir
from segmamba_tpu.ops.selective_scan import selective_scan

N = 16


def _make(rng, b, L, D, dtype=jnp.float32):
    return dict(
        u=jnp.asarray(rng.standard_normal((b, L, D)), dtype),
        dt=jnp.asarray(0.2 * rng.standard_normal((b, L, D)), dtype),
        z=jnp.asarray(rng.standard_normal((b, L, D)), dtype),
        acc=jnp.asarray(rng.standard_normal((b, L, D)), dtype),
        B=jnp.asarray(rng.standard_normal((b, L, N)), dtype),
        C=jnp.asarray(rng.standard_normal((b, L, N)), dtype),
        A=-jnp.exp(jnp.asarray(rng.standard_normal((b, D, N)), jnp.float32)),
        Dv=jnp.asarray(rng.standard_normal((b, D)), jnp.float32),
        bias=jnp.asarray(0.3 * rng.standard_normal((b, D)), jnp.float32),
    )


def _ref(u, dt, z, B, C, A, Dv, bias, acc=None, gate=True, reverse=False):
    """Per-row-parameter reference via vmapped selective_scan ref."""

    def one(u1, dt1, B1, C1, A1, D1, b1):
        xin, dtin, Bin, Cin = ((jnp.flip(t, 0) for t in (u1, dt1, B1, C1))
                               if reverse else (u1, dt1, B1, C1))
        y = selective_scan(xin[None], dtin[None], A1, Bin[None], Cin[None],
                           D=D1, delta_bias=b1, delta_softplus=True,
                           impl="ref")[0]
        return jnp.flip(y, 0) if reverse else y

    y = jax.vmap(one)(u, dt, B, C, A, Dv, bias).astype(jnp.float32)
    if acc is not None:
        y = y + acc.astype(jnp.float32)
    if gate:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y


def _run(a, has_acc, gate, reverse):
    return mamba_scan_fused_dir(
        a["u"], a["dt"], a["z"] if gate else None, a["A"], a["B"], a["C"],
        a["Dv"], a["bias"], acc=a["acc"] if has_acc else None, gate=gate,
        reverse=reverse)


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("gate,has_acc",
                         [(True, True), (False, True), (False, False)])
def test_dir_chain_forward(reverse, gate, has_acc):
    a = _make(np.random.default_rng(0), 2, 320, 96)
    out = _run(a, has_acc, gate, reverse)
    ref = _ref(a["u"], a["dt"], a["z"], a["B"], a["C"], a["A"], a["Dv"],
               a["bias"], acc=a["acc"] if has_acc else None, gate=gate,
               reverse=reverse)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_dir_chain_grads(reverse):
    a = _make(np.random.default_rng(2), 1, 256, 96)
    names = ("u", "dt", "z", "B", "C", "A", "Dv", "bias", "acc")
    args = tuple(a[k] for k in names)
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 256, 96)), jnp.float32)

    def lossk(u, dt, z, B, C, A, Dv, bias, acc):
        out = mamba_scan_fused_dir(u, dt, z, A, B, C, Dv, bias, acc=acc,
                                   gate=True, reverse=reverse)
        return jnp.sum(out * cot)

    def lossr(u, dt, z, B, C, A, Dv, bias, acc):
        out = _ref(u, dt, z, B, C, A, Dv, bias, acc=acc, gate=True,
                   reverse=reverse)
        return jnp.sum(out * cot)

    gk = jax.grad(lossk, argnums=tuple(range(9)))(*args)
    gr = jax.grad(lossr, argnums=tuple(range(9)))(*args)
    for n, k, r in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r), rtol=2e-3,
                                   atol=2e-3, err_msg=f"grad {n}")


def test_dir_chain_matches_separate_gating():
    """(y_f + y_r) * silu(z) == sum of independently gated outputs — the
    algebraic identity the chained MambaV3 path relies on."""
    a = _make(np.random.default_rng(4), 1, 256, 96)
    sep = (_ref(a["u"], a["dt"], a["z"], a["B"], a["C"], a["A"], a["Dv"],
                a["bias"])
           + _ref(a["u"], a["dt"], a["z"], a["B"], a["C"], a["A"], a["Dv"],
                  a["bias"], reverse=True))
    p = mamba_scan_fused_dir(a["u"], a["dt"], None, a["A"], a["B"], a["C"],
                             a["Dv"], a["bias"], reverse=True, gate=False)
    out = mamba_scan_fused_dir(a["u"], a["dt"], a["z"], a["A"], a["B"],
                               a["C"], a["Dv"], a["bias"], acc=p, gate=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sep), rtol=2e-4,
                               atol=2e-4)


def test_dir_bf16_grad_dtype():
    """The backward emits the big per-token gradients in the storage dtype
    (no f32 round trip) — the VERDICT r4 item-6 bandwidth contract."""
    a = _make(np.random.default_rng(5), 1, 128, 96, dtype=jnp.bfloat16)

    def loss(u, dt, z):
        out = mamba_scan_fused_dir(u, dt, z, a["A"], a["B"], a["C"],
                                   a["Dv"], a["bias"])
        return jnp.sum(out.astype(jnp.float32))

    du, ddt, dz = jax.grad(loss, argnums=(0, 1, 2))(a["u"], a["dt"], a["z"])
    assert du.dtype == jnp.bfloat16
    assert ddt.dtype == jnp.bfloat16
    assert dz.dtype == jnp.bfloat16


def test_dir2_model_parity():
    """MambaV3(scan_impl='dir2') == scan_impl='fused' (full tri-oriented
    composition: rev->fwd chained, slice gated separately)."""
    from segmamba_tpu.models.mamba import MambaV3

    rng = np.random.default_rng(6)
    h = jnp.asarray(rng.standard_normal((2, 256, 48)), jnp.float32)
    m2 = MambaV3(d_model=48, nslices=8, scan_impl="dir2")
    mf = MambaV3(d_model=48, nslices=8, scan_impl="fused")
    p = m2.init(jax.random.key(0), h)
    np.testing.assert_allclose(np.asarray(m2.apply(p, h)),
                               np.asarray(mf.apply(p, h)), rtol=2e-4,
                               atol=2e-4)
    g2 = jax.grad(lambda pp: jnp.sum(jnp.sin(m2.apply(pp, h))))(p)
    gf = jax.grad(lambda pp: jnp.sum(jnp.sin(mf.apply(pp, h))))(p)
    for (k2, a2), (kf, af) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g2),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gf),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(a2), np.asarray(af), rtol=2e-3,
                                   atol=2e-3, err_msg=str(k2))
