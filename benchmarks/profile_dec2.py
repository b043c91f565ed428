"""Piecewise attribution of dec2 (UnetrUpBlock 96->48 @128^3), the single
most expensive UNETR block (20.4 ms of the 124 ms forward)."""
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
from segmamba_tpu.models.layers import Conv3d, ConvTranspose3d, instance_norm, leaky_relu
from segmamba_tpu.models.unetr_blocks import UnetrUpBlock

DT = jnp.bfloat16
RNG = np.random.default_rng(0)


def vol(shape):
    return jnp.asarray(RNG.standard_normal(shape), DT)


def mod_time(mod, *args, k=6):
    params = jax.jit(mod.init)(jax.random.key(0), *args)
    return chain_time(lambda p, *a: mod.apply(p, *a), (params,) + args, k=k)


def main():
    x64 = vol((1, 64, 64, 64, 96))      # dec3 output
    skip = vol((1, 128, 128, 128, 48))  # enc2 skip
    h96 = vol((1, 128, 128, 128, 96))   # concat output
    h48 = vol((1, 128, 128, 128, 48))

    t = mod_time(UnetrUpBlock(48, dtype=DT), x64, skip)
    print(f"dec2 full:            {t*1e3:7.2f} ms", flush=True)

    t = mod_time(ConvTranspose3d(48, 2, 2, dtype=DT), x64)
    print(f"  upT 96->48 @64^3:   {t*1e3:7.2f} ms", flush=True)

    t = chain_time(lambda a, b: jnp.concatenate([a, b], axis=-1),
                   (h48, skip), k=6)
    print(f"  concat @128^3:      {t*1e3:7.2f} ms", flush=True)

    t = mod_time(Conv3d(48, 3, 1, 1, use_bias=False, dtype=DT), h96)
    print(f"  conv1 96->48:       {t*1e3:7.2f} ms", flush=True)

    t = mod_time(Conv3d(48, 3, 1, 1, use_bias=False, dtype=DT), h48)
    print(f"  conv2 48->48:       {t*1e3:7.2f} ms", flush=True)

    t = mod_time(Conv3d(48, 1, 1, 0, use_bias=False, dtype=DT), h96)
    print(f"  conv3 1x1 96->48:   {t*1e3:7.2f} ms", flush=True)

    t = chain_time(lambda a: instance_norm(a), (h48,), k=6)
    print(f"  IN @128^3x48:       {t*1e3:7.2f} ms", flush=True)

    t = chain_time(lambda a: leaky_relu(instance_norm(a)), (h48,), k=6)
    print(f"  IN+lrelu:           {t*1e3:7.2f} ms", flush=True)

    # conv1 + IN fused vs separate (does XLA fuse the stats pass?)
    c1 = Conv3d(48, 3, 1, 1, use_bias=False, dtype=DT)
    p1 = jax.jit(c1.init)(jax.random.key(0), h96)
    t = chain_time(lambda p, a: leaky_relu(instance_norm(c1.apply(p, a))),
                   (p1, h96), k=6)
    print(f"  conv1+IN+lrelu:     {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
