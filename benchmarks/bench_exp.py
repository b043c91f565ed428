"""VPU transcendental cost: exp vs exp2 vs mul on scan-kernel-sized arrays.

Sizes the biggest elementwise term in the selective-scan kernel
(a = exp(delta*A) over (N, L, D) = (16, 262144, 96) per direction,
ops/scan_pallas.py:176) so kernel work goes where the cycles are.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microbench import chain_time

RNG = np.random.default_rng(0)
# one stage-0 chunk-grid's worth of (N, T, Dblk) tiles, as one array
x = jnp.asarray(-np.abs(RNG.standard_normal((16, 8192, 96))), jnp.float32)
LOG2E = float(np.log2(np.e))

for name, fn in [
    ("mul      ", lambda a: a * 1.0001 + 0.5),
    ("exp      ", jnp.exp),
    ("exp2     ", jnp.exp2),
    ("exp2scale", lambda a: jnp.exp2(a * LOG2E)),
    ("tanh     ", jnp.tanh),
    ("logistic ", jax.nn.sigmoid),
]:
    t = chain_time(fn, (x,), k=10)
    gel = x.size / t / 1e9
    print(f"{name}: {t*1e3:6.3f} ms  ({gel:7.1f} Gelem/s)")
