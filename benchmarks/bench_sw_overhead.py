"""Attribute the sliding-window case time: fused program vs bare forwards.

The bench-case program (150x180x150, roi 128^3, overlap .5 -> 8 windows)
should cost ~8 forwards + stitch. This measures (a) 8 chained bare 128^3
forwards in one jit, (b) the fused sliding-window program, (c) the same with
a bf16 device volume, so the stitch/gather overhead is pinned.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microbench import fetch_overhead
from segmamba_tpu.infer.sliding_window import sliding_window_inference
from segmamba_tpu.models import SegMamba


def main():
    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x128 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x128)
    fwd = jax.jit(model.apply)

    # (a) 8 dependent forwards in one jit
    @jax.jit
    def eight(params, x):
        s = jnp.float32(0.0)
        for _ in range(8):
            xi = x + (s * 1e-30).astype(x.dtype)
            out = fwd(params, xi)
            s = s + jnp.sum(out[..., 0], dtype=jnp.float32)
        return s

    float(eight(params, x128))
    best = min(
        (lambda t0: (float(eight(params, x128)), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(3))
    t8 = max(best - fetch_overhead(), 0)
    print(f"8 bare forwards (one jit): {t8*1e3:7.1f} ms "
          f"({t8/8*1e3:.1f} ms/fwd)", flush=True)

    case = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 150, 180, 150, 4)),
        jnp.float32)

    def predictor(p, w):
        return fwd(p, w)

    @jax.jit
    def fetch(o):
        return jnp.sum(o)

    for label, kwargs in [("fused f32", {}),
                          ("fused bf16 vol", {"compute_dtype": jnp.bfloat16})]:
        def run():
            return float(fetch(sliding_window_inference(
                case, (128, 128, 128), predictor, overlap=0.5,
                sw_batch_size=1, num_classes=4, host_loop=False,
                predictor_args=(params,), **kwargs)))
        run()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        print(f"{label}: {min(times)*1e3:7.1f} ms/case", flush=True)


if __name__ == "__main__":
    main()
