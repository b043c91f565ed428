"""Per-block profile of the SegMamba forward at 128^3 (dependent-chain timing).

Times every UNETR encoder/decoder block, the encoder conv pieces (stem, GSC,
MLP heads, downsamples), and the MambaLayer internals at their real shapes so
optimization effort lands where the milliseconds are.
"""
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/segmamba_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from microbench import chain_time

DT = jnp.bfloat16
RNG = np.random.default_rng(0)


def vol(shape):
    return jnp.asarray(RNG.standard_normal(shape), DT)


def mod_time(mod, x, k=5, extra=None):
    args = (x,) if extra is None else (x, extra)
    params = jax.jit(mod.init)(jax.random.key(0), *args)
    if extra is None:
        return chain_time(lambda p, a: mod.apply(p, a), (params, x), k=k)
    return chain_time(lambda p, a, e: mod.apply(p, a, e), (params, x, extra),
                      k=k)


def gflops_conv(spatial, cin, cout, k=3):
    return 2 * (spatial ** 3) * cin * cout * (k ** 3) / 1e9


def main():
    from segmamba_tpu.models.unetr_blocks import (UnetrBasicBlock,
                                                  UnetrUpBlock)
    from segmamba_tpu.models.segmamba import GSC, MlpChannel
    from segmamba_tpu.models.layers import Conv3d, instance_norm

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "unetr"):
        specs = [  # (name, module, input shape, skip shape or None, ~GF)
            ("enc1 4->48 @128^3", UnetrBasicBlock(48, dtype=DT),
             (1, 128, 128, 128, 4), None, 24 + 261),
            ("enc2 48->96 @64^3", UnetrBasicBlock(96, dtype=DT),
             (1, 64, 64, 64, 48), None, 65 + 130),
            ("enc3 96->192 @32^3", UnetrBasicBlock(192, dtype=DT),
             (1, 32, 32, 32, 96), None, 33 + 65),
            ("enc4 192->384 @16^3", UnetrBasicBlock(384, dtype=DT),
             (1, 16, 16, 16, 192), None, 16 + 33),
            ("enc5 384->768 @8^3", UnetrBasicBlock(768, dtype=DT),
             (1, 8, 8, 8, 384), None, 8 + 16),
            ("dec5 768->384 @16^3", UnetrUpBlock(384, dtype=DT),
             (1, 8, 8, 8, 768), (1, 16, 16, 16, 384), 19 + 65 + 33),
            ("dec4 384->192 @32^3", UnetrUpBlock(192, dtype=DT),
             (1, 16, 16, 16, 384), (1, 32, 32, 32, 192), 19 + 130 + 65),
            ("dec3 192->96 @64^3", UnetrUpBlock(96, dtype=DT),
             (1, 32, 32, 32, 192), (1, 64, 64, 64, 96), 77 + 261 + 130),
            ("dec2 96->48 @128^3", UnetrUpBlock(48, dtype=DT),
             (1, 64, 64, 64, 96), (1, 128, 128, 128, 48), 155 + 522 + 261),
            ("dec1 48->48 @128^3", UnetrBasicBlock(48, dtype=DT),
             (1, 128, 128, 128, 48), None, 261 + 261),
        ]
        tot = 0.0
        for name, mod, xs, ss, gf in specs:
            x = vol(xs)
            skip = vol(ss) if ss else None
            t = mod_time(mod, x, extra=skip)
            tot += t
            print(f"{name}: {t*1e3:6.2f} ms  ({gf/t/1e3:5.1f} Tf/s)")
        print(f"UNETR blocks total: {tot*1e3:.1f} ms")

    if which in ("all", "encoder"):
        x = vol((1, 128, 128, 128, 4))
        t = mod_time(Conv3d(48, 7, 2, 3, dtype=DT), x)
        print(f"stem k7s2 4->48: {t*1e3:6.2f} ms")
        for i, (s, c) in enumerate([(64, 48), (32, 96), (16, 192), (8, 384)]):
            h = vol((1, s, s, s, c))
            t = mod_time(GSC(c, dtype=DT), h)
            gf = 2 * gflops_conv(s, c, c) + 2 * 2 * (s**3) * c * c / 1e9
            print(f"GSC stage{i} @{s}^3 {c}ch: {t*1e3:6.2f} ms ({gf/t/1e3:5.1f} Tf/s)")
            t = mod_time(MlpChannel(c, 2 * c, dtype=DT), h)
            print(f"MLP stage{i}: {t*1e3:6.2f} ms")
            t = chain_time(lambda a: instance_norm(a), h, k=10)
            print(f"IN stage{i}: {t*1e3:6.2f} ms")
        for i, (s, cin, cout) in enumerate(
                [(64, 48, 96), (32, 96, 192), (16, 192, 384)], start=1):
            h = vol((1, s, s, s, cin))
            t = mod_time(Conv3d(cout, 2, 2, 0, dtype=DT), h)
            print(f"downsample{i}: {t*1e3:6.2f} ms")

    if which in ("all", "mamba"):
        from flax import linen as nn
        L, C, E = 64 ** 3, 48, 96
        h = vol((1, L, C))
        t = mod_time(nn.LayerNorm(epsilon=1e-5, dtype=DT), h, k=10)
        print(f"LN (262144, 48): {t*1e3:6.2f} ms")
        w = vol((C, 2 * E))
        t = chain_time(lambda a, ww: jnp.einsum("bld,de->ble", a, ww), (h, w),
                       k=10)
        print(f"in_proj 48->192: {t*1e3:6.2f} ms")
        from segmamba_tpu.ops.causal_conv1d import causal_conv1d_grouped
        x3 = vol((3, L, E))
        cw = vol((3, 4, E))
        t = chain_time(
            lambda a, ww: causal_conv1d_grouped(a, ww, None, 1,
                                                activation="silu"),
            (x3, cw), k=10)
        print(f"conv1d grouped 3x(262144,96): {t*1e3:6.2f} ms")
        xp = vol((3, E, 3 + 32))
        t = chain_time(
            lambda a, ww: jnp.einsum("gld,gde->gle", a, ww), (x3, xp), k=10)
        print(f"x_proj 3x: {t*1e3:6.2f} ms")
        o3 = vol((3, L, E))
        wo = vol((E, C))
        t = chain_time(
            lambda a, ww: jnp.einsum("bld,de->ble",
                                     a[0:1] + a[1:2] + a[2:3], ww),
            (o3, wo), k=10)
        print(f"sum+out_proj: {t*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
