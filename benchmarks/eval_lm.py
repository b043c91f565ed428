"""Offline LM evaluation: perplexity / bits-per-byte over a text file.

Covers the reference's eval surface (mamba/evals/lm_harness_eval.py) in an
egress-free form: where the reference shells out to lm-evaluation-harness
(network datasets + HF tokenizers), this computes the standard
cross-entropy metrics over any local text with byte-level tokens, using
the same parallel-scan forward the training stack uses. Pretrained
state-spaces snapshots load through ``segmamba_tpu.utils.hf``.

Usage:
  python benchmarks/eval_lm.py --text FILE [--model-dir HF_SNAPSHOT_DIR]
                               [--seq-len 1024] [--limit-bytes 1000000]

Without --model-dir a randomly initialized model is used (pipeline smoke).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", required=True, help="local text/bytes file")
    ap.add_argument("--model-dir", default=None,
                    help="local HF-layout snapshot (config.json + weights)")
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--limit-bytes", type=int, default=1_000_000)
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--n-layer", type=int, default=2)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the container pins the platform before env vars are read;
        # honor an explicit CPU request (tests/conftest.py recipe)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if args.model_dir:
        from segmamba_tpu.utils.hf import from_pretrained
        model, params = from_pretrained(args.model_dir)
        vocab = model.vocab_size
    else:
        from segmamba_tpu.models.mamba_lm import MambaLMHeadModel
        vocab = 256
        model = MambaLMHeadModel(vocab_size=vocab, d_model=args.d_model,
                                 n_layer=args.n_layer, rms_norm=True)
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, 8), jnp.int32))

    data = np.frombuffer(
        open(args.text, "rb").read()[:args.limit_bytes], np.uint8)
    if vocab < 256:
        data = data % vocab
    L = args.seq_len
    n_seq = (len(data) - 1) // L
    if n_seq == 0:
        raise SystemExit("text shorter than one sequence")

    fwd = jax.jit(model.apply)

    @jax.jit
    def nll(logits, targets):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, targets[..., None],
                                    axis=-1).sum()

    total_nll, total_tok = 0.0, 0
    for i in range(n_seq):
        chunk = data[i * L:(i + 1) * L + 1].astype(np.int32)
        ids = jnp.asarray(chunk[:-1])[None]
        tgt = jnp.asarray(chunk[1:])[None]
        total_nll += float(nll(fwd(params, ids), tgt))
        total_tok += L
    nats = total_nll / total_tok
    print(json.dumps({
        "tokens": total_tok,
        "nll_per_token_nats": round(nats, 4),
        "perplexity": round(float(np.exp(nats)), 4),
        "bits_per_byte": round(nats / np.log(2), 4),
    }))


if __name__ == "__main__":
    main()
