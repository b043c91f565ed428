"""Measure the exp's share of the fused scan kernel by tracing variants.

Patches jnp.exp inside the kernel trace with cheaper stand-ins (NOT
numerically valid — timing only) to attribute the kernel's runtime between
the transcendental and the Hillis-Steele FMA passes at the stage-0 shape
(3 directions x (262144, 96), N=16).
"""
import os
import sys
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microbench import chain_time
from segmamba_tpu.ops import scan_pallas_fused as spf

RNG = np.random.default_rng(0)
B, L, D, N = 3, 262144, 96, 16

u = jnp.asarray(RNG.standard_normal((B, L, D)), jnp.bfloat16)
dt = jnp.asarray(RNG.standard_normal((B, L, D)) * 0.5 - 2.0, jnp.bfloat16)
z = jnp.asarray(RNG.standard_normal((B, L, D)), jnp.bfloat16)
A = -np.abs(RNG.standard_normal((B, D, N))).astype(np.float32) * 2
Bm = jnp.asarray(RNG.standard_normal((B, L, N)), jnp.bfloat16)
Cm = jnp.asarray(RNG.standard_normal((B, L, N)), jnp.bfloat16)
Dv = jnp.ones((B, D), jnp.float32)
bias = jnp.zeros((B, D), jnp.float32)


def run(chunk):
    def f(u, dt, z, Bm, Cm):
        return spf.mamba_scan_fused(u, dt, z, jnp.asarray(A), Bm, Cm, Dv,
                                    bias, chunk_size=chunk)
    return chain_time(f, (u, dt, z, Bm, Cm), k=4)


variants = [
    ("baseline exp, T=128", None, 128),
    ("no-exp (x+1)       ", lambda x: x + 1.0, 128),
    ("exp2(x)            ", jnp.exp2, 128),
    ("baseline exp, T=256", None, 256),
    ("baseline exp, T=512", None, 512),
]

for name, sub, chunk in variants:
    spf._make_core.cache_clear()
    if sub is None:
        t = run(chunk)
    else:
        with mock.patch.object(jnp, "exp", sub):
            t = run(chunk)
    print(f"{name}: {t*1e3:7.2f} ms")
