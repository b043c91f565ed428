"""A/B: conv2d z-fold (materializes a 3x xcat) vs 3 accumulated conv2ds on
shifted z-views (no materialization, 3x output-accumulation traffic), vs
z-fold with the concat on the W dim (minor-most concat may fuse better)."""
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
DT = jnp.bfloat16


def conv_kfold(x, w):
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[:, kd:kd + d] for kd in range(3)], axis=-1)
    wcat = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * c, o)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * d, h, wd, 3 * c), wcat, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, d, h, wd, o)


def conv_acc(x, w):
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = None
    for kd in range(3):
        xi = xp[:, kd:kd + d].reshape(b * d, h, wd, c)
        yi = jax.lax.conv_general_dilated(
            xi, w[kd], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yi if y is None else y + yi
    return y.reshape(b, d, h, wd, o)


def conv3d_plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def main():
    for s, cin, cout in [(64, 96, 96), (64, 48, 96), (32, 96, 192)]:
        x = jnp.asarray(RNG.standard_normal((1, s, s, s, cin)), DT)
        w = jnp.asarray(0.05 * RNG.standard_normal((3, 3, 3, cin, cout)), DT)
        gf = 2 * s ** 3 * cin * cout * 27 / 1e9
        res = {}
        for name, fn in [("kfold", conv_kfold), ("acc3", conv_acc),
                         ("conv3d", conv3d_plain)]:
            t = chain_time(fn, (x, w), k=6)
            res[name] = t
            print(f"{cin:3d}->{cout} @{s}^3 {name:6s}: {t*1e3:6.2f} ms "
                  f"({gf/t/1e3:6.1f} Tf/s)", flush=True)
        err = float(jnp.max(jnp.abs(
            conv_acc(x, w).astype(jnp.float32)
            - conv_kfold(x, w).astype(jnp.float32))))
        print(f"   acc3 vs kfold err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
