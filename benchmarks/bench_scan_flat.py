"""A/B: flat-lane fused scan kernel vs the production (N, T, Dblk) kernel.

The production kernel's VMEM working arrays are (N=16, T, Dblk=96): Dblk=96
fills 96/128 lanes (75%). The flat variant keeps one 2-D working shape
(T, N*Dblk) whose lane dim is a multiple of 128 (16*96 = 1536 = 12 full
lane groups), generating the broadcasts with ``pltpu.repeat`` (delta/u tiled
over N) and tiny MXU matmuls (B expand: (T,N)@(N,ND); C reduce:
(T,ND)@(ND,D)), with the Hillis-Steele combine unchanged on sublanes.
"""
import os
import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microbench import chain_time
from segmamba_tpu.ops.scan_pallas import _shift_down_ax
from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused


def _hs_fwd_flat(a, b, T):
    k = 1
    while k < T:
        b = a * _shift_down_ax(b, k, 0.0, 0) + b
        if 2 * k < T:
            a = a * _shift_down_ax(a, k, 1.0, 0)
        k *= 2
    return b


def _fwd_kernel_flat(u_ref, dt_ref, z_ref, Af_ref, BT_ref, CT_ref, bias_ref,
                     Dv_ref, expB_ref, redC_ref, out_ref, carry_ref, *, N):
    T, Dblk = u_ref.shape[1], u_ref.shape[2]
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    u = u_ref[0].astype(jnp.float32)                    # (T, D)
    delta = jax.nn.softplus(dt_ref[0].astype(jnp.float32)
                            + bias_ref[0, 0].astype(jnp.float32))
    z = z_ref[0].astype(jnp.float32)
    Af = Af_ref[0]                                      # (1, N*D) f32
    BT = BT_ref[0].astype(jnp.float32)                  # (T, N)
    CT = CT_ref[0].astype(jnp.float32)                  # (T, N)

    delta_t = pltpu.repeat(delta, N, axis=1)            # (T, N*D)
    du_t = pltpu.repeat(delta * u, N, axis=1)
    a = jnp.exp(delta_t * Af)                           # (T, N*D)
    # B expand: (T, N) @ (N, N*D) one-hot -> B_flat[t, n*D+d] = BT[t, n]
    Bf = jax.lax.dot_general(BT, expB_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    b = du_t * Bf
    carry = carry_ref[...]                              # (1, N*D)
    b = jnp.concatenate([b[0:1] + a[0:1] * carry, b[1:]], axis=0)
    x = _hs_fwd_flat(a, b, T)                           # (T, N*D)
    Cf = jax.lax.dot_general(CT, expB_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # y[t, d] = sum_n (C*x)[t, n*D+d]: (T, N*D) @ (N*D, D). The DEFAULT f32
    # matmul truncates its inputs to bf16 (measured err 0.5 on y) and
    # HIGHEST costs 6 MXU passes; instead split the product into bf16
    # hi+lo halves and run two DEFAULT one-hot matmuls (exact to ~2^-16).
    p = Cf * x
    p_hi = p.astype(jnp.bfloat16).astype(jnp.float32)
    dot = lambda lhs: jax.lax.dot_general(
        lhs, redC_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = dot(p_hi) + dot(p - p_hi)
    ytot = y + Dv_ref[0, 0].astype(jnp.float32) * u
    out_ref[0] = (ytot * (z * jax.nn.sigmoid(z))).astype(out_ref.dtype)
    carry_ref[...] = x[T - 1:T]


def flat_call(u, dt, z, A, B, C, D, dt_bias, T=128):
    batch, L, dim = u.shape
    N = A.shape[1]
    nc = L // T
    ND = N * dim
    Af = jnp.transpose(A.astype(jnp.float32)).reshape(1, 1, ND)  # n-major
    bias3 = dt_bias.astype(jnp.float32).reshape(1, 1, dim)
    Dv3 = D.astype(jnp.float32).reshape(1, 1, dim)
    expB = np.zeros((N, ND), np.float32)
    for n in range(N):
        expB[n, n * dim:(n + 1) * dim] = 1.0
    redC = np.zeros((ND, dim), np.float32)
    for n in range(N):
        redC[n * dim:(n + 1) * dim] += np.eye(dim, dtype=np.float32)
    expB = jnp.asarray(expB)
    redC = jnp.asarray(redC)

    seq_spec = pl.BlockSpec((1, T, dim), lambda b, d, c: (b, c, 0))
    vec_spec = pl.BlockSpec((1, 1, dim), lambda b, d, c: (0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_flat, N=N),
        grid=(batch, 1, nc),
        in_specs=[
            seq_spec, seq_spec, seq_spec,
            pl.BlockSpec((1, 1, ND), lambda b, d, c: (0, 0, 0)),
            pl.BlockSpec((1, T, N), lambda b, d, c: (b, c, 0)),
            pl.BlockSpec((1, T, N), lambda b, d, c: (b, c, 0)),
            vec_spec, vec_spec,
            pl.BlockSpec((N, ND), lambda b, d, c: (0, 0)),
            pl.BlockSpec((ND, dim), lambda b, d, c: (0, 0)),
        ],
        out_specs=seq_spec,
        out_shape=jax.ShapeDtypeStruct((batch, L, dim), u.dtype),
        scratch_shapes=[pltpu.VMEM((1, ND), jnp.float32)],
    )(u, dt, z, Af, B, C, bias3, Dv3, expB, redC)
    return out


def main():
    rng = np.random.default_rng(0)
    L, E, N = 262144, 96, 16
    for batch in (1, 3):
        u = jnp.asarray(rng.standard_normal((batch, L, E)), jnp.bfloat16)
        dt = jnp.asarray(0.1 * rng.standard_normal((batch, L, E)), jnp.bfloat16)
        z = jnp.asarray(rng.standard_normal((batch, L, E)), jnp.bfloat16)
        A = -jnp.exp(jnp.asarray(rng.standard_normal((E, N)), jnp.float32))
        Bm = jnp.asarray(rng.standard_normal((batch, L, N)), jnp.bfloat16)
        Cm = jnp.asarray(rng.standard_normal((batch, L, N)), jnp.bfloat16)
        D = jnp.ones((E,), jnp.float32)
        bias = jnp.zeros((E,), jnp.float32)

        ref = mamba_scan_fused(u, dt, z, A, Bm, Cm, D, bias)
        got = flat_call(u, dt, z, A, Bm, Cm, D, bias)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        t_ref = chain_time(lambda *a: mamba_scan_fused(*a),
                           (u, dt, z, A, Bm, Cm, D, bias), k=6)
        t_new = chain_time(lambda *a: flat_call(*a),
                           (u, dt, z, A, Bm, Cm, D, bias), k=6)
        print(f"batch={batch}: ref {t_ref*1e3:6.2f} ms  flat {t_new*1e3:6.2f}"
              f" ms  x{t_ref/t_new:4.2f}  err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
