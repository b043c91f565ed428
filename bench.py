"""Benchmark entry point (driver contract): prints ONE JSON line.

Current headline: SegMamba 128^3-patch forward latency on one chip, the
building block of sliding-window inference (the reference's eval protocol,
4_predict.py:55-62). ``vs_baseline`` is the speedup vs the reference's
published 1.51 s/case inference (images/segmamba_ablation.jpg) divided by
the ~18 sliding windows of a 240x240x155 BraTS case at overlap 0.5 —
i.e. an assumed ~83.9 ms/window on the authors' GPU.

Once the sliding-window inferer lands this switches to volumes/sec/chip.
"""

import json
import time

import numpy as np


BASELINE_WINDOW_MS = 1510.0 / 18.0  # reference case time / windows per case


def main():
    import jax
    try:  # persistent compile cache: first driver run pays, reruns are fast
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/segmamba_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from segmamba_tpu.models import SegMamba

    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 128, 128, 128, 4)),
        jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def fwd_sum(params, x):
        return jnp.sum(model.apply(params, x))

    float(fwd_sum(params, x))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fwd_sum(params, x))  # scalar fetch forces full sync
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1000.0
    print(json.dumps({
        "metric": "segmamba_128cube_patch_fwd",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_WINDOW_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
