"""Dispatch-free microbenchmarks: run an op k times inside ONE jit as a
dependent chain (each iteration consumes a scalar from the previous), so the
~20 ms per-call relay dispatch amortizes away and device time dominates.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_FETCH_OVERHEAD = [None]


def fetch_overhead():
    """One scalar fetch through the axon relay costs ~25 ms of pure host/relay
    latency (measured: a trivial jit + float() takes the same ~25 ms as a
    chained 100MB pallas copy at k=2). Every timing must subtract it, or at
    small k it inflates per-op numbers by 25/k ms — which is how round-1
    recorded a 36 GB/s "pallas copy" on what is actually a full-speed
    (~780 GB/s) v5e."""
    if _FETCH_OVERHEAD[0] is None:
        x = jnp.ones((8, 128), jnp.float32)

        @jax.jit
        def triv(x):
            return jnp.sum(x[:1, :1])

        float(triv(x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(triv(x))
            best = min(best, time.perf_counter() - t0)
        _FETCH_OVERHEAD[0] = best
    return _FETCH_OVERHEAD[0]


def chain_time(f, args, k=10, reps=3):
    """Median device time per application of f, chained k times inside one
    jit, with the per-fetch relay overhead subtracted."""

    @jax.jit
    def run(args):
        s = jnp.float32(0.0)
        for _ in range(k):
            perturbed = jax.tree_util.tree_map(
                lambda a: a + (s * 1e-30).astype(a.dtype), args)
            out = f(*perturbed) if isinstance(perturbed, tuple) else f(perturbed)
            leaves = jax.tree_util.tree_leaves(out)
            # reduce the FULL output: a partial slice lets XLA dead-code-
            # eliminate most of the op (observed: "356 Tf/s" matmuls)
            s = s + jnp.sum(leaves[0], dtype=jnp.float32)
        return s

    float(run(args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, (time.perf_counter() - t0))
    return max(best - fetch_overhead(), 1e-9) / k


def report(name, f, args, k=10):
    t = chain_time(f, args, k=k)
    print(f"{name}: {t*1e3:.2f} ms")
    return t


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    L, E = 64**3, 96

    if which in ("all", "dispatch"):
        x = jnp.ones((8, 128), jnp.float32)
        report("dispatch floor (tiny op)", lambda a: a * 1.0000001, x, k=50)

    if which in ("all", "glue"):
        from segmamba_tpu.models.mamba import slice_interleave, slice_deinterleave
        xz = jnp.asarray(rng.standard_normal((1, L, 2 * E)), jnp.bfloat16)
        report("flip (1,262144,192)", lambda a: jnp.flip(a, axis=1), xz)
        report("interleave ns=64", lambda a: slice_interleave(a, 64), xz)
        report(
            "full glue (flip+il+concat)",
            lambda a: jnp.concatenate(
                [a, jnp.flip(a, axis=1), slice_interleave(a, 64)], axis=0),
            xz)
        o3 = jnp.asarray(rng.standard_normal((3, 1, L, E)), jnp.bfloat16)
        report(
            "output unglue",
            lambda o: o[0] + jnp.flip(o[1], axis=1)
            + slice_deinterleave(o[2], 64), o3)

    if which in ("all", "scan"):
        from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused
        g, N = 3, 16
        u = jnp.asarray(rng.standard_normal((g, L, E)), jnp.bfloat16)
        dt = jnp.asarray(0.1 * rng.standard_normal((g, L, E)), jnp.bfloat16)
        z = jnp.asarray(rng.standard_normal((g, L, E)), jnp.bfloat16)
        A = -jnp.exp(jnp.asarray(rng.standard_normal((g, E, N)), jnp.float32))
        Bm = jnp.asarray(rng.standard_normal((g, L, N)), jnp.bfloat16)
        Cm = jnp.asarray(rng.standard_normal((g, L, N)), jnp.bfloat16)
        D = jnp.ones((g, E), jnp.float32)
        bias = jnp.zeros((g, E), jnp.float32)
        report("fused scan 3x(262144,96)",
               lambda *a: mamba_scan_fused(*a), (u, dt, z, A, Bm, Cm, D, bias),
               k=5)

    if which in ("all", "scan_ab"):
        # Hillis-Steele kernel vs MXU ratio-form kernel at the stage-0
        # profile shape (VERDICT r2 item 1): fwd and fwd+bwd.
        from segmamba_tpu.ops.scan_pallas import selective_scan_pallas
        from segmamba_tpu.ops.scan_pallas_mxu import selective_scan_mxu
        N = 16
        u1 = jnp.asarray(rng.standard_normal((1, L, E)), jnp.float32)
        dt1 = jnp.asarray(
            np.abs(0.05 * rng.standard_normal((1, L, E))), jnp.float32)
        A1 = -jnp.exp(jnp.asarray(
            rng.uniform(0.0, np.log(16.0), (E, N)), jnp.float32))
        B1 = jnp.asarray(rng.standard_normal((1, L, N)), jnp.float32)
        C1 = jnp.asarray(rng.standard_normal((1, L, N)), jnp.float32)
        args1 = (u1, dt1, A1, B1, C1)

        impls = {
            "hs": lambda *a: selective_scan_pallas(*a, delta_softplus=True),
            "mxu": lambda *a: selective_scan_mxu(*a, delta_softplus=True,
                                                 guarded=False),
            "mxu_guard": lambda *a: selective_scan_mxu(*a,
                                                       delta_softplus=True),
        }
        outs = {}
        for name, fn in impls.items():
            outs[name] = fn(*args1)
            report(f"scan fwd {name} (262144,96,N16)", fn, args1, k=5)
        err = float(jnp.max(jnp.abs(outs["hs"] - outs["mxu"])))
        print(f"  max|hs - mxu| = {err:.3e}")
        for name, fn in impls.items():
            def vg(fn):
                return lambda *a: jax.grad(
                    lambda *b: jnp.sum(fn(*b)).astype(jnp.float32),
                    argnums=(0, 1, 2, 3, 4))(*a)
            report(f"scan fwd+bwd {name}", vg(fn), args1, k=3)

    if which in ("all", "layer"):
        from segmamba_tpu.models.segmamba import MambaLayer
        h = jnp.asarray(rng.standard_normal((1, 64, 64, 64, 48)), jnp.bfloat16)
        ml = MambaLayer(dim=48, num_slices=64, dtype=jnp.bfloat16)
        mp = jax.jit(ml.init)(jax.random.key(0), h)
        report("MambaLayer stage0", lambda a: ml.apply(mp, a), h, k=5)

    if which in ("all", "conv"):
        # k3 conv at full res, 48ch vs padded 64 vs 128
        for C in (48, 64, 128):
            x = jnp.asarray(rng.standard_normal((1, 128, 128, 128, C)),
                            jnp.bfloat16)
            w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05,
                            jnp.bfloat16)

            def conv(x, w):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

            flops = 2 * 128**3 * C * C * 27
            t = chain_time(conv, (x, w), k=5)
            print(f"conv3d 128^3 {C}ch: {t*1e3:.2f} ms "
                  f"({flops/t/1e12:.1f} Tflop/s)")

    if which in ("all", "forward"):
        from segmamba_tpu.models import SegMamba
        model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, 128, 128, 128, 4)),
                        jnp.float32)
        params = jax.jit(model.init)(jax.random.key(0), x)
        # pass params as args (a closure bakes 240MB of constants into the
        # program and overflows the remote-compile relay); k=2 chain max
        report("full 128^3 forward",
               lambda p, a: model.apply(p, a), (params, x), k=2)


if __name__ == "__main__":
    main()
