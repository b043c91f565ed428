"""Lower-bound probe for the fused scan kernel: replace the Hillis-Steele
shift-concats with identity reads (wrong numerics, identical FLOP/pass
structure) to measure what the shifts themselves cost; also a no-HS variant
(generation + reduction only) for the memory/transcendental floor."""
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
from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused


def _kernel(u_ref, dt_ref, z_ref, At_ref, Bt_ref, Ct_ref, bias_ref,
            Dv_ref, out_ref, carry_ref, *, variant):
    T = u_ref.shape[1]
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    u = u_ref[0].astype(jnp.float32)
    delta = jax.nn.softplus(dt_ref[0].astype(jnp.float32)
                            + bias_ref[0, 0].astype(jnp.float32))
    z = z_ref[0].astype(jnp.float32)
    At = At_ref[0].astype(jnp.float32)
    Bt = Bt_ref[0].astype(jnp.float32)
    Ct = Ct_ref[0].astype(jnp.float32)

    a = jnp.exp(delta[None] * At[:, None, :])
    b = (delta * u)[None] * Bt[:, :, None]
    carry = carry_ref[...][:, None, :]
    b = jnp.concatenate([b[:, 0:1] + a[:, 0:1] * carry, b[:, 1:]], axis=1)
    if variant == "noshift":
        k = 1
        while k < T:
            b = a * b * 0.5 + b          # same op count, no shift
            if 2 * k < T:
                a = a * a
            k *= 2
        x = b
    elif variant == "nohs":
        x = a * b                         # generation + reduce only
    else:
        raise ValueError(variant)
    y = jnp.sum(Ct[:, :, None] * x, axis=0)
    ytot = y + Dv_ref[0, 0].astype(jnp.float32) * u
    out_ref[0] = (ytot * (z * jax.nn.sigmoid(z))).astype(out_ref.dtype)
    N, Dblk = carry_ref.shape
    carry_ref[...] = x[:, T - 1:T].reshape(N, Dblk)


def variant_call(u, dt, z, A, B, C, D, dt_bias, variant, T=128):
    batch, L, dim = u.shape
    N = A.shape[1]
    nc = L // T
    At3 = A.astype(jnp.float32).T[None]
    bias3 = dt_bias.astype(jnp.float32).reshape(1, 1, dim)
    Dv3 = D.astype(jnp.float32).reshape(1, 1, dim)
    seq_spec = pl.BlockSpec((1, T, dim), lambda b, d, c: (b, c, d))
    vec_spec = pl.BlockSpec((1, 1, dim), lambda b, d, c: (0, 0, d))
    out = pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid=(batch, 1, nc),
        in_specs=[
            seq_spec, seq_spec, seq_spec,
            pl.BlockSpec((1, N, dim), lambda b, d, c: (0, 0, d)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
            pl.BlockSpec((1, N, T), lambda b, d, c: (b, 0, c)),
            vec_spec, vec_spec,
        ],
        out_specs=seq_spec,
        out_shape=jax.ShapeDtypeStruct((batch, L, dim), u.dtype),
        scratch_shapes=[pltpu.VMEM((N, dim), jnp.float32)],
    )(u, dt, z, At3, jnp.swapaxes(B, 1, 2), jnp.swapaxes(C, 1, 2),
      bias3, Dv3)
    return out


def main():
    rng = np.random.default_rng(0)
    L, E, N = 262144, 96, 16
    batch = 1
    u = jnp.asarray(rng.standard_normal((batch, L, E)), jnp.bfloat16)
    dt = jnp.asarray(0.1 * rng.standard_normal((batch, L, E)), jnp.bfloat16)
    z = jnp.asarray(rng.standard_normal((batch, L, E)), jnp.bfloat16)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((E, N)), jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((batch, L, N)), jnp.bfloat16)
    Cm = jnp.asarray(rng.standard_normal((batch, L, N)), jnp.bfloat16)
    D = jnp.ones((E,), jnp.float32)
    bias = jnp.zeros((E,), jnp.float32)
    args = (u, dt, z, A, Bm, Cm, D, bias)

    t = chain_time(lambda *a: mamba_scan_fused(*a), args, k=6)
    print(f"production kernel: {t*1e3:6.2f} ms", flush=True)
    for variant in ("noshift", "nohs"):
        t = chain_time(lambda *a: variant_call(*a, variant), args, k=6)
        print(f"variant {variant:8s}: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
