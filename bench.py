"""Benchmark entry point (driver contract): prints ONE JSON line.

Headline: BraTS-case sliding-window inference throughput (volumes/sec/chip)
on a synthetic preprocessed-size case (150x180x150, 4 modalities), single
pass (no TTA), roi 128^3 / overlap 0.5 / gaussian blending / sw_batch 1
(batch 1 beats 2 on the 16GB dev chip; the reference's published
1.51 s/case ablation figure is likewise a single sliding-window pass).
``vs_baseline`` compares against that 1.51 s/case
(images/segmamba_ablation.jpg) => 0.662 volumes/sec on the authors' GPU.
The full 8x-mirror-TTA eval protocol (4_predict.py:55-62) is measured
separately by benchmarks/bench_tta.py.
"""

import json
import time

import numpy as np

BASELINE_VOLS_PER_SEC = 1.0 / 1.51


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
    from segmamba_tpu.infer import SlidingWindowInferer
    from segmamba_tpu.models import SegMamba

    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x128 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x128)
    fwd = jax.jit(model.apply)

    def predictor(p, w):
        # params ride as jit args (predictor_args) so the fused window
        # program doesn't inline the weights as MLIR constants
        return fwd(p, w)

    case = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 150, 180, 150, 4)),
        jnp.float32)
    # sw_batch 1 outperforms 2 on the 16GB dev chip (batch-2 windows hit
    # memory pressure); the reference's own training inferer also uses 1
    inferer = SlidingWindowInferer((128, 128, 128), sw_batch_size=1,
                                   overlap=0.5)

    @jax.jit
    def fetch(o):
        return jnp.sum(o)

    import sys

    def run(host_loop):
        from segmamba_tpu.infer.sliding_window import sliding_window_inference
        return float(fetch(sliding_window_inference(
            case, inferer.roi_size, predictor, overlap=inferer.overlap,
            sw_batch_size=inferer.sw_batch_size, num_classes=4,
            host_loop=host_loop, predictor_args=(params,))))

    # A/B the fused single-program path against the per-group host loop and
    # report whichever is faster on this chip (the fused path removes
    # ~2 dispatches/window but must fit the remote-compile relay)
    sec_by_path = {}
    # host_loop=False = strict fused (no silent fallback), True = host loop
    for path, host_loop in (("fused", False), ("hostloop", True)):
        try:
            run(host_loop)  # compile
        except Exception as e:  # relay cap or compile failure: skip path
            print(f"# {path} path unavailable: {type(e).__name__}",
                  file=sys.stderr)
            continue
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run(host_loop)
            times.append(time.perf_counter() - t0)
        sec_by_path[path] = min(times)
        print(f"# {path}: {min(times):.3f} s/case", file=sys.stderr)
    sec = min(sec_by_path.values())
    vps = 1.0 / sec
    print(json.dumps({
        "metric": "brats_case_sliding_window_inference",
        "value": round(vps, 4),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vps / BASELINE_VOLS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
