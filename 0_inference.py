"""Smoke forward: SegMamba on a random 1x4x128^3 MRI patch.

Parity with /root/reference/0_inference.py:3-16 (which requires CUDA; this
runs on TPU or CPU). Volumes here are channels-last (B, Z, Y, X, C).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--in-chans", type=int, default=4)
    ap.add_argument("--out-chans", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (Pallas runs in interpreter mode)")
    args = ap.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from segmamba_tpu.models import SegMamba

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = SegMamba(in_chans=args.in_chans, out_chans=args.out_chans,
                     dtype=dtype)
    s = args.size
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, s, s, s, args.in_chans)),
        jnp.float32)
    print(f"device: {jax.devices()[0].device_kind}; input {x.shape}")
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.key(0), x)
    out = jax.block_until_ready(jax.jit(model.apply)(params, x))
    print(f"logits: {out.shape} {out.dtype} "
          f"(compile+run {time.time() - t0:.1f}s)")
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"params: {n / 1e6:.2f} M")


if __name__ == "__main__":
    main()
