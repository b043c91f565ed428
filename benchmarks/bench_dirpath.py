"""A/B the MambaLayer direction strategies at the stage-0 shape.

"fused"  — flip/interleave/concat the three orientation inputs, one batched
           fused-scan call (the round-2/3 default).
"dir"    — forward+flip on the original layout (directional conv + reversed
           chunk walk in-kernel), slice orientation interleaves xz once.
Numerical agreement is asserted alongside the timing.
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
from segmamba_tpu.models.segmamba import MambaLayer

RNG = np.random.default_rng(0)


def main():
    outs = {}
    for stage, (s, c, ns) in [("stage0", (64, 48, 64)),
                              ("stage1", (32, 96, 32))]:
        h = jnp.asarray(RNG.standard_normal((1, s, s, s, c)), jnp.bfloat16)
        for impl in ("fused", "dir"):
            ml = MambaLayer(dim=c, num_slices=ns, scan_impl=impl,
                            dtype=jnp.bfloat16)
            mp = jax.jit(ml.init)(jax.random.key(0), h)
            fwd = jax.jit(ml.apply)
            t = chain_time(fwd, (mp, h), k=4)
            outs[impl] = fwd(mp, h)
            print(f"MambaLayer {stage} ({s}^3, C={c}) impl={impl}: "
                  f"{t*1e3:6.2f} ms", flush=True)
        d = float(jnp.max(jnp.abs(outs["fused"].astype(jnp.float32)
                                  - outs["dir"].astype(jnp.float32))))
        print(f"  max|fused - dir| = {d:.2e}")


if __name__ == "__main__":
    main()
