"""Profile the 128^3 patch forward on the real chip (dependent-chain timing)."""
import os
import sys
import time
import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=5, inner=3):
    # dependent chain inside one jit; fetch scalar; subtract the ~25 ms
    # relay fetch overhead (see microbench.fetch_overhead)
    from microbench import fetch_overhead
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(inner):
            out = fn(*args)
        s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return max(best - fetch_overhead(), 1e-9) / inner


def main():
    from segmamba_tpu.models import SegMamba
    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 128, 128, 128, 4)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)
    fwd = jax.jit(model.apply)
    t = timeit(fwd, params, x)
    print(f"full 128^3 forward: {t*1e3:.1f} ms")

    # encoder only
    from segmamba_tpu.models.segmamba import MambaEncoder
    enc = MambaEncoder(in_chans=4, dtype=jnp.bfloat16)
    ep = jax.jit(enc.init)(jax.random.key(0), x)
    efwd = jax.jit(lambda p, a: enc.apply(p, a)[-1])
    t = timeit(efwd, ep, x)
    print(f"encoder only: {t*1e3:.1f} ms")

    # single MambaLayer at stage-0 shape (L=64^3=262144, dim=48)
    from segmamba_tpu.models.segmamba import MambaLayer
    L, C = 64**3, 48
    h = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64, 64, 64, C)), jnp.bfloat16)
    ml = MambaLayer(dim=C, num_slices=64, dtype=jnp.bfloat16)
    mp = jax.jit(ml.init)(jax.random.key(0), h)
    mfwd = jax.jit(ml.apply)
    t = timeit(mfwd, mp, h)
    print(f"MambaLayer stage0 (L=262144, C=48): {t*1e3:.1f} ms")

    # stage-1: L=32768, C=96
    h1 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 32, 96)), jnp.bfloat16)
    ml1 = MambaLayer(dim=96, num_slices=32, dtype=jnp.bfloat16)
    mp1 = jax.jit(ml1.init)(jax.random.key(0), h1)
    t = timeit(jax.jit(ml1.apply), mp1, h1)
    print(f"MambaLayer stage1 (L=32768, C=96): {t*1e3:.1f} ms")

    # raw fused scan at stage-0 shape, 3 dirs batched: (3, L, 96)
    from segmamba_tpu.ops.scan_pallas_fused import mamba_scan_fused
    rng = np.random.default_rng(2)
    g, E, N, R = 3, 96, 16, 3  # dt_rank=ceil(48/16)=3
    u = jnp.asarray(rng.standard_normal((g, L, E)), jnp.bfloat16)
    dt = jnp.asarray(0.1 * rng.standard_normal((g, L, E)), jnp.bfloat16)
    z = jnp.asarray(rng.standard_normal((g, L, E)), jnp.bfloat16)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((g, E, N)), jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((g, L, N)), jnp.bfloat16)
    Cm = jnp.asarray(rng.standard_normal((g, L, N)), jnp.bfloat16)
    D = jnp.ones((g, E), jnp.float32)
    bias = jnp.zeros((g, E), jnp.float32)
    sfwd = jax.jit(lambda *a: mamba_scan_fused(*a))
    t = timeit(sfwd, u, dt, z, A, Bm, Cm, D, bias)
    print(f"fused scan 3x(262144,96): {t*1e3:.1f} ms")

    # glue: flip + interleave + concat at stage0
    from segmamba_tpu.models.mamba import slice_interleave
    xz = jnp.asarray(rng.standard_normal((1, L, 2 * E)), jnp.bfloat16)
    def glue(a):
        return jnp.concatenate([a, jnp.flip(a, axis=1), slice_interleave(a, 64)], axis=0)
    t = timeit(jax.jit(glue), xz)
    print(f"glue flip+interleave+concat (262144,192): {t*1e3:.2f} ms")

if __name__ == "__main__":
    main()
