"""A/B the Pallas P-form convs (v1/v2) against the conv2d K-fold form at the
decoder's hot shapes. The conv2d form materializes a 3x input blowup
(128^3 x 3*Cin) in HBM per call; the P-form streams halos via BlockSpecs and
fills MXU columns with N = 9*Cout."""
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
from segmamba_tpu.ops.conv3d_pallas import conv3d_k3s1, conv3d_k3s1_v2

RNG = np.random.default_rng(0)


def conv2d_kfold(x, w):
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[:, kd:kd + d] for kd in range(3)], axis=-1)
    wcat = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * c, o)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * d, h, wd, 3 * c), wcat, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, d, h, wd, o)


def main():
    for s, cin, cout in [(128, 96, 48), (128, 48, 48), (128, 4, 48),
                         (64, 96, 96), (64, 48, 96)]:
        x = jnp.asarray(RNG.standard_normal((1, s, s, s, cin)), jnp.bfloat16)
        w = jnp.asarray(RNG.standard_normal((3, 3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        gf = 2 * s ** 3 * 27 * cin * cout / 1e9
        print(f"== k3s1 {cin}->{cout} @{s}^3 ({gf:.1f} GF)")
        ys = {}
        for name, fn in [("conv2d-kfold", conv2d_kfold),
                         ("pform-v1    ", conv3d_k3s1),
                         ("pform-v2    ", conv3d_k3s1_v2)]:
            try:
                t = chain_time(fn, (x, w), k=6)
            except Exception as e:
                print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            ys[name] = fn(x, w)
            print(f"  {name}: {t*1e3:7.2f} ms  ({gf/t/1e3:6.1f} Tf/s)")
        ref = ys.get("conv2d-kfold")
        for name, y in ys.items():
            if ref is not None and name != "conv2d-kfold":
                d = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                          - ref.astype(jnp.float32))))
                print(f"  max|{name.strip()} - kfold| = {d:.2e}")


if __name__ == "__main__":
    main()
