"""A/B: projection-fused scan chain (scan_pallas_proj) vs the round-4
production path (einsum projections + scan_pallas_dir per direction) at the
SegMamba stage shapes. Run on the TPU dev chip:

    python -u benchmarks/bench_proj.py

Timing uses a dependent chain inside one jit (relay-safe; see
.claude/skills/verify/SKILL.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from segmamba_tpu.ops.scan_pallas_dir import mamba_scan_fused_dir
from segmamba_tpu.ops.scan_pallas_proj import mamba_scan_proj


def old_chain(xc3, z, wp, dtp, bias, A, Dv):
    """Round-4 path: XLA einsum projections + 2 dir kernels + slice via
    interleave + fused kernel, partial outputs gated individually and added
    (models/mamba.py:256-271 without the slice branch for isolation)."""
    outs = []
    for g, rev in ((0, False), (1, True)):
        x_dbl = jnp.einsum("bld,de->ble", xc3[g], wp.astype(xc3.dtype))
        rank = wp.shape[1] - 32
        dt = jnp.einsum("blr,rd->bld", x_dbl[..., :rank],
                        dtp.astype(xc3.dtype))
        B = x_dbl[..., rank:rank + 16]
        C = x_dbl[..., rank + 16:]
        outs.append(mamba_scan_fused_dir(
            xc3[g], dt, z, A[None], B, C, Dv[None], bias[None],
            reverse=rev))
    return outs[0] + outs[1]


def new_chain(xc3, z, wp, dtp, bias, A, Dv):
    yr = mamba_scan_proj(xc3[1], wp, dtp, bias, A, Dv, reverse=True)
    return mamba_scan_proj(xc3[0], wp, dtp, bias, A, Dv, acc=yr, z=z)


def bench(fn, args, iters=20):
    """Dependent chain inside one jit: iteration i's first arg carries a
    (numerically negligible) term of iteration i-1's output, so XLA cannot
    CSE the iterations into one call (SKILL.md timing recipe)."""

    @jax.jit
    def chain(*a):
        first = a[0]
        o = None
        for _ in range(iters):
            o = fn(first, *a[1:])
            first = first + (o[0, 0, 0] * 1e-30).astype(first.dtype)
        return jnp.sum(o[:, :1, :1].astype(jnp.float32))

    r = float(chain(*args))  # compile+run
    t0 = time.perf_counter()
    r = float(chain(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt, r


def main():
    rng = np.random.default_rng(0)
    for (L, D, rank, tag) in ((64**3, 96, 3, "stage0"), (32**3, 192, 6,
                                                         "stage1")):
        if D > 128:
            print(f"{tag}: D={D} > 128, proj kernel n/a")
            continue
        N = 16
        b = 1
        xc3 = jnp.asarray(rng.standard_normal((2, b, L, D)), jnp.bfloat16)
        z = jnp.asarray(rng.standard_normal((b, L, D)), jnp.bfloat16)
        wp = jnp.asarray(rng.standard_normal((D, rank + 2 * N)) * 0.1,
                         jnp.bfloat16)
        dtp = jnp.asarray(rng.standard_normal((rank, D)) * 0.3, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((D,)) * 0.5, jnp.float32)
        A = -jnp.exp(jnp.asarray(rng.standard_normal((D, N)), jnp.float32))
        Dv = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
        args = (xc3, z, wp, dtp, bias, A, Dv)

        o_old = jax.jit(old_chain)(*args)
        o_new = jax.jit(new_chain)(*args)
        err = (float(jnp.max(jnp.abs(o_old.astype(jnp.float32)
                                     - o_new.astype(jnp.float32))))
               / float(jnp.max(jnp.abs(o_old.astype(jnp.float32)))))
        t_old, _ = bench(old_chain, args)
        t_new, _ = bench(new_chain, args)
        print(f"{tag} (L={L}, D={D}): old {t_old*1e3:.2f} ms  "
              f"new {t_new*1e3:.2f} ms  ({t_old/t_new:.2f}x)  "
              f"rel|diff|={err:.3e}")

        # backward A/B (training path)
        def loss_old(a):
            return jnp.sum(old_chain(*a).astype(jnp.float32) ** 2)

        def loss_new(a):
            return jnp.sum(new_chain(*a).astype(jnp.float32) ** 2)

        def g_old(a):
            return jax.grad(loss_old)(a)[0]

        def g_new(a):
            return jax.grad(loss_new)(a)[0]

        tb_old, _ = bench(lambda *a: g_old(a), args, iters=10)
        tb_new, _ = bench(lambda *a: g_new(a), args, iters=10)
        print(f"{tag} grad: old {tb_old*1e3:.2f} ms  new {tb_new*1e3:.2f} ms"
              f"  ({tb_old/tb_new:.2f}x)")


if __name__ == "__main__":
    main()
