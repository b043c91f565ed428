"""Re-A/B sliding-window sw_batch and shape-bucket choices (VERDICT r4
item 7) after the round-5 kernel work (chained dir scans, storage-dtype
scan grads).

Protocol context: the reference evaluates at sw_batch 2
(/root/reference/4_predict.py:56); rounds 1-4 measured sw_batch 1 faster
on the 16GB v5e dev chip and bench.py uses 1. The bucket question: at the
synthetic 150x180x150 case, bucket 32 and 16 both pad to 160x192x160 and
the overlap-0.5 grid is 2x2x2 = 8 windows for ANY pad in [150, 192] per
dim, so bucket granularity cannot change the compute here — only the
scatter-accumulator footprint. Measured anyway so the claim is recorded,
plus bucket=None (exact-shape pad, 150x180x150 accumulators).

MEASURED (v5e, round 5, after the chained-dir-scan kernel work):

    sw=1 bucket=  32 pad=(160, 192, 160) windows=8: 0.992 s/case
    sw=2 bucket=  32 pad=(160, 192, 160) windows=8: 1.100 s/case
    sw=4 bucket=  32 pad=(160, 192, 160) windows=8: 1.120 s/case
    sw=1 bucket=  16 pad=(160, 192, 160) windows=8: 0.992 s/case
    sw=1 bucket=   8 pad=(152, 184, 152) windows=8: 0.995 s/case
    sw=1 bucket=none pad=(150, 180, 150) windows=8: 0.996 s/case

sw_batch 1 still wins on the 16GB chip (batch-2 windows pressure HBM and
serialize worse than two batch-1 programs); bucket granularity is within
noise because the window grid and per-window compute are identical at any
pad in [150, 192] — bench.py keeps sw_batch 1 / bucket 32.

Run on the TPU dev chip: python benchmarks/bench_sw_ab.py
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

from segmamba_tpu.infer.sliding_window import (_scan_starts,
                                               sliding_window_inference)
from segmamba_tpu.models import SegMamba

RNG = np.random.default_rng(0)


def main():
    model = SegMamba(in_chans=4, out_chans=4, dtype=jnp.bfloat16)
    x128 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x128)
    fwd = jax.jit(model.apply)

    def predictor(p, w):
        return fwd(p, w)

    case = jnp.asarray(RNG.standard_normal((1, 150, 180, 150, 4)),
                       jnp.float32)

    @jax.jit
    def fetch(o):
        return jnp.sum(o)

    def run(sw, bucket):
        return float(fetch(sliding_window_inference(
            case, (128, 128, 128), predictor, overlap=0.5,
            sw_batch_size=sw, num_classes=4, bucket=bucket,
            host_loop=False, predictor_args=(params,), in_graph_pad=True)))

    for sw, bucket in [(1, 32), (2, 32), (4, 32), (1, 16), (1, 8), (1, 0)]:
        pad = tuple(
            (max(d, 128) + bucket - 1) // bucket * bucket if bucket
            else max(d, 128) for d in (150, 180, 150))
        nwin = len(_scan_starts(pad, (128, 128, 128), 0.5))
        try:
            run(sw, bucket)  # compile
        except Exception as e:
            print(f"sw={sw} bucket={bucket or 'none'}: "
                  f"unavailable ({type(e).__name__})", flush=True)
            continue
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            run(sw, bucket)
            times.append(time.perf_counter() - t0)
        print(f"sw={sw} bucket={bucket or 'none':>4} pad={pad} "
              f"windows={nwin}: {min(times):.3f} s/case", flush=True)


if __name__ == "__main__":
    main()
