"""Mamba LM generation throughput benchmark.

Counterpart of the reference's
/root/reference/mamba/benchmarks/benchmark_generation_mamba_simple.py
(prompt prefill + token-by-token decode timing), on the TPU-native LM stack.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=1000)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--n-layer", type=int, default=4)
    ap.add_argument("--promptlen", type=int, default=64)
    ap.add_argument("--genlen", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from segmamba_tpu.models.mamba_lm import MambaLMHeadModel

    model = MambaLMHeadModel(vocab_size=args.vocab, d_model=args.d_model,
                             n_layer=args.n_layer, rms_norm=True)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, args.vocab, (args.batch, args.promptlen)))
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.key(0), ids)
    print(f"init: {time.time() - t0:.1f}s on {jax.default_backend()}")

    t0 = time.time()
    out = model.apply(params, ids, args.genlen,
                      temperature=args.temperature,
                      method=MambaLMHeadModel.generate)
    out = jax.block_until_ready(out)
    dt = time.time() - t0
    total = args.batch * (args.promptlen + args.genlen)
    print(f"prompt {args.promptlen} + generate {args.genlen} "
          f"(batch {args.batch}): {dt:.2f}s "
          f"({args.batch * args.genlen / dt:.1f} tok/s decode incl. compile)")
    print("output shape:", out.shape)


if __name__ == "__main__":
    main()
