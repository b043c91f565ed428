"""A/B the chained direction composition (VERDICT r4 item 1) vs the
unchained dir path, MambaLayer level, both Mamba stages.

VERDICT r4 item 1 proposed merging the fwd+rev direction scans into ONE
pallas_call with two carries and a single pass over u/dt/z. A single
sequential grid walk cannot carry both directions (fwd needs chunks
left->right, rev right->left; one walk would need a local-scan +
cumprod-correction decomposition whose recomputed exp(A·cumsum delta)
costs more transcendentals than the fusion saves IO — the bench_scan_lb
floor probe shows exp generation dominates, and u/dt/B/C differ per
direction anyway: only z and the output add are shared). The realizable
form is a CHAIN through the kernel's new ``acc``/``gate`` operands:
rev emits an ungated partial, fwd adds it and applies silu(z) once.

MEASURED (v5e, back-to-back runs of this file's predecessor scripts):

1. (T, N, Dblk) time-leading kernel layout (shifts become tile re-indexing
   instead of sublane moves), natural (R, L, N) B/C blocks, full 3-dir
   chain: stage0 28.4 vs 24.5 ms fwd — LOSES. Raw-kernel isolate: the
   layout alone costs +0.43 ms/call (5.73 vs 5.30 gated) while removing
   the gate saves 0.58 (5.15 ungated). The (N, T, Dblk) layout stays.
2. Full 3-dir chain on the (N, T, Dblk) kernels (slice via interleaved
   xc/dt/B/C + ungated kernel): stage0 25.6 vs 24.7 — LOSES; isolating
   with bimamba v2 (no slice) the rev->fwd chain WINS 15.9 vs 17.2, so
   the slice-orientation handling was the regression (4-array interleave
   + directional-conv slice branch lose to mamba_inner on interleaved xz).
3. HYBRID (production, scan_impl="dir2" = the auto default): rev->fwd
   chained, slice kept on the mamba_inner fused path, gated separately:
   stage0 fwd 23.8 vs 25.1, fwd+bwd 66.7 vs 67.6; stage1 fwd 4.8 vs 4.5
   (drift-level loss), fwd+bwd 14.6 vs 15.5 — net WIN, adopted.

The same round also switched the dir backward's per-token gradient
outputs (du/ddt/dz/dacc) to the storage dtype with in-kernel dbias
accumulation (VERDICT r4 item 6): the f32-then-cast form cost a full
extra HBM round trip per tensor. MambaLayer fwd+bwd: stage0 69.1 ->
66.6-67.6, stage1 15.1 -> 13.6-15.5 ms across sessions.

This file reruns variant 3's A/B (dir vs dir2) so the numbers can be
refreshed back-to-back on the current chip.
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
    for stage, (s, c, ns) in [("stage0", (64, 48, 64)),
                              ("stage1", (32, 96, 32))]:
        h = jnp.asarray(RNG.standard_normal((1, s, s, s, c)), jnp.bfloat16)
        outs = {}
        for impl in ("dir", "dir2"):
            ml = MambaLayer(dim=c, num_slices=ns, scan_impl=impl,
                            dtype=jnp.bfloat16)
            mp = jax.jit(ml.init)(jax.random.key(0), h)
            fwd = jax.jit(ml.apply)
            t = chain_time(fwd, (mp, h), k=4)
            outs[impl] = fwd(mp, h)

            def vg(ml=ml):
                def f(mp, h):
                    return jax.grad(
                        lambda p, a: jnp.sum(
                            ml.apply(p, a).astype(jnp.float32)),
                        argnums=(0, 1))(mp, h)
                return f

            tg = chain_time(jax.jit(vg()), (mp, h), k=2)
            print(f"{stage} {impl}: fwd {t*1e3:6.2f} ms   "
                  f"fwd+bwd {tg*1e3:6.2f} ms", flush=True)
        d = float(jnp.max(jnp.abs(outs["dir"].astype(jnp.float32)
                                  - outs["dir2"].astype(jnp.float32))))
        print(f"  {stage} max|dir - dir2| = {d:.2e}")


if __name__ == "__main__":
    main()
