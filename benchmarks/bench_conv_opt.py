"""A/B candidate conv reformulations against the current Conv3d forms.

Motivation (round-4 profile): the decoder is ~51 ms of the 129 ms 128^3
forward and every 48-out-channel conv is MXU column-bound (48/128 lanes).
Candidates:
  1. conv_transpose k2s2  -> matmul (C -> 8*Cout) + depth-to-space reshape
     (N = 8*48 = 384 full MXU columns instead of the conv emitter's 48)
  2. downsample k2s2 conv -> space-to-depth reshape + matmul (K = 8*C)
  3. k3s1 conv with Cout=48 -> "2-plane" packing: fold 4 depth taps into
     input channels and produce TWO depth planes per GEMM so the output
     column dim is 96, not 48 (useful-MXU fraction 0.5625 vs 0.375)
All are algebraically exact reformulations (same weights, reordered).
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


def vol(shape, dtype=DT):
    return jnp.asarray(RNG.standard_normal(shape), dtype)


# --- 1. transposed conv k2s2 ---

def transp_conv_emitter(x, w):
    return jax.lax.conv_transpose(
        x, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def transp_conv_matmul(x, w):
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    wm = w.reshape(8 * c, o) if False else w  # keep explicit below
    # (2,2,2,C,O) -> (C, 2,2,2,O) -> (C, 8O)
    wm = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(c, 8 * o)
    y = x.reshape(b * d * h * wd, c) @ wm
    y = y.reshape(b, d, h, wd, 2, 2, 2, o)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
    return y.reshape(b, 2 * d, 2 * h, 2 * wd, o)


# --- 2. downsample k2s2 ---

def down_conv_emitter(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2, 2), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def down_conv_matmul(x, w):
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    xs = x.reshape(b, d // 2, 2, h // 2, 2, wd // 2, 2, c)
    xs = jnp.transpose(xs, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
        b * (d // 2) * (h // 2) * (wd // 2), 8 * c)
    wm = w.reshape(8 * c, o)
    y = xs @ wm
    return y.reshape(b, d // 2, h // 2, wd // 2, o)


# --- 3. k3s1 two-plane packing (48-out convs) ---

def k3_conv2dform(x, w):
    """Current Conv3d fast path: depth taps folded into channels, conv2d."""
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[:, kd:kd + d] for kd in range(3)], axis=-1)
    wcat = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * c, o)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * d, h, wd, 3 * c), wcat, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, d, h, wd, o)


def k3_conv2dform_p2(x, w):
    """Two output depth-planes per GEMM row-block: 4 depth taps in, 2*Cout
    out. Output plane z uses taps z-1..z+1; plane z+1 uses z..z+2; the
    combined weight block is (3,3, 4C, 2O) with one zero C-slab per half."""
    b, d, h, wd, c = x.shape
    o = w.shape[-1]
    assert d % 2 == 0
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))  # z: -1..d
    # rows are even planes z = 0,2,..; taps z-1, z, z+1, z+2
    xcat = jnp.concatenate([xp[:, kd:kd + d:2] for kd in range(4)], axis=-1)
    # weights: out plane 0 (even z) uses taps 0..2; plane 1 uses taps 1..3
    wz = jnp.transpose(w, (1, 2, 0, 3, 4))        # (3,3,3,C,O)
    zero = jnp.zeros_like(wz[:, :, :1])
    w0 = jnp.concatenate([wz, zero], axis=2)      # taps 0..2 + zero tap3
    w1 = jnp.concatenate([zero, wz], axis=2)      # zero tap0 + taps 1..3
    wcat = jnp.concatenate([w0, w1], axis=4).reshape(3, 3, 4 * c, 2 * o)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * (d // 2), h, wd, 4 * c), wcat, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, d // 2, h, wd, 2, o)
    y = jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b, d, h, wd, o)
    return y


def k3_conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def report(name, fn, args, gflop, k=8):
    t = chain_time(fn, args, k=k)
    print(f"{name}: {t*1e3:7.2f} ms  ({gflop/t/1e3:6.1f} Tf/s)")
    return t


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "transp"):
        print("== transposed conv k2s2 96->48 @64^3 -> 128^3")
        x = vol((1, 64, 64, 64, 96))
        w = vol((2, 2, 2, 96, 48))
        gf = 2 * 128 ** 3 * 96 * 48 / 1e9
        a = report("  emitter", transp_conv_emitter, (x, w), gf)
        bt = report("  matmul+d2s", transp_conv_matmul, (x, w), gf)
        y1, y2 = transp_conv_emitter(x, w), transp_conv_matmul(x, w)
        print(f"  max|diff| = {float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))):.2e}  speedup {a/bt:.2f}x")
        print("== transposed conv k2s2 768->384 @8^3 -> 16^3")
        x = vol((1, 8, 8, 8, 768))
        w = vol((2, 2, 2, 768, 384))
        gf = 2 * 16 ** 3 * 768 * 384 / 1e9
        a = report("  emitter", transp_conv_emitter, (x, w), gf)
        bt = report("  matmul+d2s", transp_conv_matmul, (x, w), gf)

    if which in ("all", "down"):
        print("== downsample k2s2 48->96 @64^3")
        x = vol((1, 64, 64, 64, 48))
        w = vol((2, 2, 2, 48, 96))
        gf = 2 * 32 ** 3 * 8 * 48 * 96 / 1e9
        a = report("  emitter", down_conv_emitter, (x, w), gf)
        bt = report("  s2d+matmul", down_conv_matmul, (x, w), gf)
        y1, y2 = down_conv_emitter(x, w), down_conv_matmul(x, w)
        print(f"  max|diff| = {float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))):.2e}  speedup {a/bt:.2f}x")

    if which in ("all", "p2"):
        for (s, cin, cout) in [(128, 48, 48), (128, 96, 48), (64, 48, 48)]:
            print(f"== k3s1 {cin}->{cout} @{s}^3")
            x = vol((1, s, s, s, cin))
            w = vol((3, 3, 3, cin, cout))
            gf = 2 * s ** 3 * 27 * cin * cout / 1e9
            a = report("  conv2d-form   ", k3_conv2dform, (x, w), gf)
            bt = report("  conv2d-form p2", k3_conv2dform_p2, (x, w), gf)
            y1, y2 = k3_conv2dform(x, w), k3_conv2dform_p2(x, w)
            print(f"  max|diff| = {float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))):.2e}  speedup {a/bt:.2f}x")

    if which in ("all", "stem"):
        print("== stem k7s2 4->48 @128^3 (current conv3d emitter)")
        x = vol((1, 128, 128, 128, 4))
        w = vol((7, 7, 7, 4, 48))
        gf = 2 * 64 ** 3 * 343 * 4 * 48 / 1e9

        def stem_emitter(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (2, 2, 2), [(3, 3)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        def stem_conv2dform(x, w):
            # depth taps folded into channels (7 taps, stride-2 on z by
            # slicing), conv2d k7s2 on the plane
            b, d, h, wd, c = x.shape
            o = w.shape[-1]
            xp = jnp.pad(x, ((0, 0), (3, 3), (0, 0), (0, 0), (0, 0)))
            xcat = jnp.concatenate(
                [xp[:, kd:kd + d:2] for kd in range(7)], axis=-1)
            wcat = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(7, 7, 7 * c, o)
            y = jax.lax.conv_general_dilated(
                xcat.reshape(b * (d // 2), h, wd, 7 * c), wcat, (2, 2),
                [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y.reshape(b, d // 2, h // 2, wd // 2, o)

        a = report("  emitter    ", stem_emitter, (x, w), gf)
        bt = report("  conv2d-form", stem_conv2dform, (x, w), gf)
        y1, y2 = stem_emitter(x, w), stem_conv2dform(x, w)
        print(f"  max|diff| = {float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))):.2e}  speedup {a/bt:.2f}x")


if __name__ == "__main__":
    main()
