"""A/B: z-pair output-packed conv2d form for k3s1 convs with small cout.

The model's cout=48 convs fill only 48/128 MXU lanes (measured 21-62 Tf/s).
Packing TWO adjacent output z-planes into the channel dim makes N=2*cout=96
lanes at the cost of a 4/3 K overhead (the pair's input window spans 4 depth
taps instead of 3): theoretical 1.5x. The packed form is ONE plain conv2d:

    X'[z2, h, w, (t, ci)] = x[2*z2 + t - 1, h, w, ci]   t in 0..3 (overlap 2)
    Y' = conv2d(X', W')    W'[(kh,kw), (t,ci), (o,co)] = W[t-1+o? ...]
    y[2*z2 + o] = Y'[..., (o, :)]

with W'[(t,ci),(o,co)] = W[kz = t - o, ci, co] (zero when t-o not in 0..2).
Overhead 4/3 in K, zeros only 2 of 8 (t,o) combos -> performed/useful
= (9*4cin*2cout) / (2*27cin*cout) = 4/3.
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

from microbench import chain_time

DT = jnp.bfloat16
RNG = np.random.default_rng(0)


def conv_ref(x, w):
    """Current dispatch: conv2d depth-fold (large vols) or plain conv3d."""
    b, d, h, wd, cin = x.shape
    cout = w.shape[-1]
    vol = d * h * wd
    if (vol >= 128 ** 3 and cin <= 96) or (vol >= 64 ** 3 and cin >= 96):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xcat = jnp.concatenate([xp[:, kd:kd + d] for kd in range(3)], axis=-1)
        wcat = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * cin, cout)
        y = jax.lax.conv_general_dilated(
            xcat.reshape(b * d, h, wd, 3 * cin), wcat, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(b, d, h, wd, cout)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv_zpair(x, w):
    """z-pair packed conv2d: N = 2*cout, K = 4*cin, one plain conv2d."""
    b, d, h, wd, cin = x.shape
    cout = w.shape[-1]
    # X': 4 overlapping z-taps, stride 2  (b, d//2, h, w, 4*cin)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate(
        [jax.lax.slice_in_dim(xp, t, t + d - 1, 2, axis=1)
         for t in range(4)], axis=-1)
    # W': (3, 3, 4*cin, 2*cout); W'[kh,kw,(t,ci),(o,co)] = w[t-o, kh,kw,ci,co]
    wt = np.zeros((3, 3, 4, cin, 2, cout), np.float32)
    wt = jnp.zeros((3, 3, 4, cin, 2, cout), w.dtype)
    for t in range(4):
        for o in range(2):
            kz = t - o
            if 0 <= kz <= 2:
                wt = wt.at[:, :, t, :, o, :].set(w[kz])
    wt = wt.reshape(3, 3, 4 * cin, 2 * cout)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * (d // 2), h, wd, 4 * cin), wt, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, d // 2, h, wd, 2, cout)
    y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, d, h, wd, cout)
    return y


def main():
    shapes = [  # (label, spatial, cin, cout)
        ("dec2.conv1  96->48 @128^3", 128, 96, 48),
        ("dec2.conv2  48->48 @128^3", 128, 48, 48),
        ("gsc0.conv   48->48 @64^3", 64, 48, 48),
        ("enc2.conv1  48->96 @64^3", 64, 48, 96),
        ("dec3.conv1 192->96 @64^3", 64, 192, 96),
        ("dec3.conv2  96->96 @64^3", 64, 96, 96),
    ]
    for label, s, cin, cout in shapes:
        x = jnp.asarray(RNG.standard_normal((1, s, s, s, cin)), DT)
        w = jnp.asarray(0.05 * RNG.standard_normal((3, 3, 3, cin, cout)), DT)
        gf = 2 * (s ** 3) * cin * cout * 27 / 1e9
        # correctness first (f32 on small shape)
        xs = jnp.asarray(RNG.standard_normal((1, 16, 12, 10, cin)), jnp.float32)
        ws = jnp.asarray(0.05 * RNG.standard_normal((3, 3, 3, cin, cout)),
                         jnp.float32)
        ref = jax.lax.conv_general_dilated(
            xs, ws, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        got = conv_zpair(xs, ws)
        err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
        t_ref = chain_time(lambda a, b: conv_ref(a, b), (x, w), k=8)
        t_new = chain_time(lambda a, b: conv_zpair(a, b), (x, w), k=8)
        print(f"{label}: ref {t_ref*1e3:6.2f} ms ({gf/t_ref/1e3:5.1f} Tf/s)"
              f"  zpair {t_new*1e3:6.2f} ms ({gf/t_new/1e3:5.1f} Tf/s)"
              f"  x{t_ref/t_new:4.2f}  err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
