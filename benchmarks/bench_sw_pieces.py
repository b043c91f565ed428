"""Decompose the fused sliding-window program's +300 ms overhead:
(a) scan(gather+forward+reduce) — no scatter, (b) scatter-only program on
precomputed logits, (c) full fused program, (d) full with bf16 volume."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microbench import fetch_overhead
from segmamba_tpu.infer.sliding_window import (_scan_starts, _scatter_all,
                                               sliding_window_inference)
from segmamba_tpu.models import SegMamba


def timeit(run, reps=3):
    run()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return max(best - fetch_overhead(), 0)


def main():
    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x128 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x128)
    fwd = jax.jit(model.apply)

    pz, py, px = 160, 192, 160
    vol = jnp.asarray(
        np.random.default_rng(0).standard_normal((pz, py, px, 4)),
        jnp.float32)
    starts = _scan_starts((pz, py, px), (128, 128, 128), 0.5)
    print(f"windows: {len(starts)}", flush=True)
    sg = jnp.asarray(starts.reshape(-1, 1, 3))

    # (a) gather + forward + scalar reduce, no scatter
    @jax.jit
    def no_scatter(params, vol, sg):
        def body(acc, s):
            win = lax.dynamic_slice(vol, (s[0, 0], s[0, 1], s[0, 2], 0),
                                    (128, 128, 128, 4))
            logits = model.apply(params, win[None])
            return acc + jnp.sum(logits, dtype=jnp.float32), None
        acc, _ = lax.scan(body, jnp.float32(0.0), sg)
        return acc

    t = timeit(lambda: float(no_scatter(params, vol, sg)))
    print(f"(a) scan gather+fwd+reduce: {t*1e3:7.1f} ms", flush=True)

    # (b) scatter-only on precomputed logits
    rng = np.random.default_rng(1)
    logits_all = jnp.asarray(
        rng.standard_normal((len(starts), 1, 128, 128, 128, 4)) * 0.1,
        jnp.float32)
    from segmamba_tpu.infer.sliding_window import gaussian_importance_map
    imp = jnp.asarray(gaussian_importance_map((128, 128, 128)))
    wmask = jnp.ones((len(starts), 1), jnp.float32)

    @jax.jit
    def fetch(o):
        return jnp.sum(o)

    def run_scatter():
        out = _scatter_all(logits_all, sg, wmask, imp, (pz, py, px), 1)
        return float(fetch(out))

    t = timeit(run_scatter)
    print(f"(b) scatter-only:           {t*1e3:7.1f} ms", flush=True)

    # (c)/(d) full fused via public API
    case = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 150, 180, 150, 4)),
        jnp.float32)

    for label, kw in [("(c) fused f32", {}),
                      ("(d) fused bf16", {"compute_dtype": jnp.bfloat16})]:
        def run():
            return float(fetch(sliding_window_inference(
                case, (128, 128, 128), lambda p, w: fwd(p, w), overlap=0.5,
                sw_batch_size=1, num_classes=4, host_loop=False,
                predictor_args=(params,), **kw)))
        t = timeit(run)
        print(f"{label}:            {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
