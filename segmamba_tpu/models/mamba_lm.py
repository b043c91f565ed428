"""Single-direction Mamba block, prenorm wrapper, and the language-model
stack with autoregressive generation.

Rebuilds the non-SegMamba half of the reference's module inventory:
- ``MambaUni``  — the plain ``Mamba`` module (bimamba_type="none" path,
  /root/reference/mamba/mamba_ssm/modules/mamba_simple.py:188-353) plus its
  single-token ``step`` decode (:356-401) on the TPU-native ops.
- ``Block``     — Add -> Norm -> Mixer prenorm wrapper
  (mamba_simple.py:445-501); the fused-add-norm path maps to
  ``ops.fused_norm.layer_norm_fn``.
- ``MixerModel`` / ``MambaLMHeadModel`` — embedding + n_layer Blocks + final
  norm + tied LM head (mamba/mamba_ssm/models/mixer_seq_simple.py:83-260),
  with greedy/temperature generation
  (mamba/mamba_ssm/utils/generation.py semantics) as a jitted lax scan.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from segmamba_tpu.models.layers import torch_bias_uniform, torch_kaiming_uniform
from segmamba_tpu.models.mamba import _a_log_init, _dt_bias_init
from segmamba_tpu.ops.causal_conv1d import causal_conv1d_update
from segmamba_tpu.ops.fused_norm import layer_norm_fn, rms_norm_fn
from segmamba_tpu.ops.mamba_inner import mamba_inner
from segmamba_tpu.ops.selective_state_update import selective_state_update


class MambaUni(nn.Module):
    """Uni-directional selective-SSM mixer with decode cache support."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int | None = None
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        self._d_inner, self._dt_rank = d_inner, dt_rank
        self.in_proj = self.param("in_proj",
                                  torch_kaiming_uniform(self.d_model),
                                  (self.d_model, 2 * d_inner))
        self.conv1d_weight = self.param(
            "conv1d_weight", torch_kaiming_uniform(self.d_conv),
            (self.d_conv, d_inner))
        self.conv1d_bias = (
            self.param("conv1d_bias", torch_bias_uniform(self.d_conv),
                       (d_inner,)) if self.conv_bias else None)
        self.x_proj = self.param("x_proj", torch_kaiming_uniform(d_inner),
                                 (d_inner, dt_rank + 2 * self.d_state))
        std = dt_rank ** -0.5
        self.dt_proj = self.param(
            "dt_proj",
            lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -std, std),
            (dt_rank, d_inner))
        self.dt_proj_bias = self.param(
            "dt_proj_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (d_inner,))
        self.A_log = self.param("A_log", _a_log_init(self.d_state),
                                (d_inner, self.d_state))
        self.D = self.param("D", nn.initializers.ones, (d_inner,))
        self.out_proj = self.param("out_proj", torch_kaiming_uniform(d_inner),
                                   (d_inner, self.d_model))

    def __call__(self, hidden_states):
        """(batch, L, d_model) -> same."""
        h = hidden_states.astype(self.dtype)
        xz = jnp.einsum("bld,de->ble", h, self.in_proj.astype(self.dtype))
        A = -jnp.exp(self.A_log.astype(jnp.float32))
        y = mamba_inner(
            xz, self.conv1d_weight.astype(self.dtype),
            None if self.conv1d_bias is None
            else self.conv1d_bias.astype(self.dtype),
            self.x_proj.astype(self.dtype), self.dt_proj.astype(self.dtype),
            self.dt_proj_bias.astype(jnp.float32), A,
            self.D.astype(jnp.float32), d_state=self.d_state,
            impl=self.scan_impl)
        return jnp.einsum("bld,de->ble", y, self.out_proj.astype(self.dtype))

    def init_cache(self, batch):
        d_inner = self.expand * self.d_model
        return {
            "conv": jnp.zeros((batch, self.d_conv, d_inner), jnp.float32),
            "ssm": jnp.zeros((batch, d_inner, self.d_state), jnp.float32),
        }

    def forward_with_cache(self, hidden_states):
        """Parallel prefill: one full-sequence scan + the decode cache it
        ends in, instead of L sequential ``step`` calls (the reference's
        prefill is likewise its parallel forward,
        mamba_ssm/utils/generation.py). Returns ((batch, L, d_model), cache).
        """
        from segmamba_tpu.ops.causal_conv1d import causal_conv1d
        from segmamba_tpu.ops.selective_scan import selective_scan

        h = hidden_states.astype(self.dtype)
        L = h.shape[1]
        xz = jnp.einsum("bld,de->ble", h, self.in_proj.astype(self.dtype))
        d_inner = self._d_inner
        x, z = xz[..., :d_inner], xz[..., d_inner:]
        xc = causal_conv1d(
            x, self.conv1d_weight.astype(self.dtype),
            None if self.conv1d_bias is None
            else self.conv1d_bias.astype(self.dtype), activation="silu")
        x_db = jnp.einsum("bld,de->ble", xc, self.x_proj.astype(xc.dtype))
        dt_rank = self._dt_rank
        dt = jnp.einsum("blr,rd->bld", x_db[..., :dt_rank],
                        self.dt_proj.astype(xc.dtype))
        B = x_db[..., dt_rank:dt_rank + self.d_state]
        C = x_db[..., dt_rank + self.d_state:]
        A = -jnp.exp(self.A_log.astype(jnp.float32))
        y, last = selective_scan(
            xc, dt, A, B, C, D=self.D.astype(jnp.float32), z=z,
            delta_bias=self.dt_proj_bias.astype(jnp.float32),
            delta_softplus=True, return_last_state=True,
            impl=self.scan_impl)
        out = jnp.einsum("bld,de->ble", y, self.out_proj.astype(y.dtype))
        # conv cache = last d_conv RAW x tokens (what causal_conv1d_update
        # rolls over), left-padded with zeros for short prompts
        xf = x.astype(jnp.float32)
        if L >= self.d_conv:
            tail = xf[:, L - self.d_conv:, :]
        else:
            tail = jnp.pad(xf, ((0, 0), (self.d_conv - L, 0), (0, 0)))
        return out, {"conv": tail, "ssm": last.astype(jnp.float32)}

    def step(self, hidden_state, cache):
        """One decode token: (batch, d_model), cache -> (out, new_cache).
        Mirrors Mamba.step (mamba_simple.py:356-401)."""
        h = hidden_state.astype(self.dtype)
        xz = h @ self.in_proj.astype(self.dtype)   # (batch, 2*d_inner)
        d_inner = self.expand * self.d_model
        x, z = xz[..., :d_inner], xz[..., d_inner:]
        x, conv_state = causal_conv1d_update(
            x, cache["conv"], self.conv1d_weight.astype(self.dtype),
            None if self.conv1d_bias is None
            else self.conv1d_bias.astype(self.dtype), activation="silu")
        x_db = x @ self.x_proj.astype(x.dtype)
        dt_rank = self._dt_rank
        dt = x_db[..., :dt_rank] @ self.dt_proj.astype(x.dtype)
        B = x_db[..., dt_rank:dt_rank + self.d_state]
        C = x_db[..., dt_rank + self.d_state:]
        A = -jnp.exp(self.A_log.astype(jnp.float32))
        y, ssm_state = selective_state_update(
            cache["ssm"], x, dt, A, B, C, D=self.D.astype(jnp.float32), z=z,
            dt_bias=self.dt_proj_bias.astype(jnp.float32), dt_softplus=True)
        out = y @ self.out_proj.astype(y.dtype)
        return out, {"conv": conv_state, "ssm": ssm_state}


class Block(nn.Module):
    """Prenorm residual block: out = mixer(norm(x + residual))
    (mamba_simple.py:445-501). ``fused_add_norm`` uses the fused norm op."""

    d_model: int
    norm_eps: float = 1e-5
    rms_norm: bool = False
    fused_add_norm: bool = True
    residual_in_fp32: bool = True
    mixer_kwargs: Any = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm_weight = self.param("norm_weight", nn.initializers.ones,
                                      (self.d_model,))
        self.norm_bias = (None if self.rms_norm else
                          self.param("norm_bias", nn.initializers.zeros,
                                     (self.d_model,)))
        kw = dict(self.mixer_kwargs or {})
        self.mixer = MambaUni(d_model=self.d_model, dtype=self.dtype, **kw)

    def _addnorm(self, x, residual):
        fn = rms_norm_fn if self.rms_norm else layer_norm_fn
        return fn(x, self.norm_weight, self.norm_bias, residual=residual,
                  prenorm=True, residual_in_fp32=self.residual_in_fp32,
                  eps=self.norm_eps)

    def __call__(self, hidden_states, residual=None):
        normed, residual = self._addnorm(hidden_states, residual)
        return self.mixer(normed), residual

    def step(self, hidden_state, residual, cache):
        normed, residual = self._addnorm(hidden_state, residual)
        out, cache = self.mixer.step(normed, cache)
        return out, residual, cache

    def forward_with_cache(self, hidden_states, residual=None):
        normed, residual = self._addnorm(hidden_states, residual)
        out, cache = self.mixer.forward_with_cache(normed)
        return out, residual, cache

    def init_cache(self, batch):
        return self.mixer.init_cache(batch)


class MixerModel(nn.Module):
    """Embedding + n_layer Blocks + final norm
    (mixer_seq_simple.py:83-170)."""

    vocab_size: int
    d_model: int
    n_layer: int
    rms_norm: bool = False
    norm_eps: float = 1e-5
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.d_model))
        self.blocks = [
            Block(d_model=self.d_model, rms_norm=self.rms_norm,
                  norm_eps=self.norm_eps,
                  mixer_kwargs={"scan_impl": self.scan_impl},
                  dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.n_layer)]
        self.norm_f_weight = self.param("norm_f_weight",
                                        nn.initializers.ones, (self.d_model,))
        self.norm_f_bias = (None if self.rms_norm else
                            self.param("norm_f_bias", nn.initializers.zeros,
                                       (self.d_model,)))

    def _final_norm(self, x, residual):
        fn = rms_norm_fn if self.rms_norm else layer_norm_fn
        return fn(x, self.norm_f_weight, self.norm_f_bias, residual=residual,
                  prenorm=False, eps=self.norm_eps)

    def __call__(self, input_ids):
        h = self.embedding[input_ids].astype(self.dtype)
        residual = None
        for blk in self.blocks:
            h, residual = blk(h, residual)
        return self._final_norm(h, residual)

    def step(self, token_ids, residual_unused, caches):
        h = self.embedding[token_ids].astype(self.dtype)
        residual = None
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            h, residual, cache = blk.step(h, residual, cache)
            new_caches.append(cache)
        return self._final_norm(h, residual), new_caches

    def prefill(self, input_ids):
        """Parallel-scan prefill: (batch, L) -> (normed (batch, L, d), caches)."""
        h = self.embedding[input_ids].astype(self.dtype)
        residual = None
        caches = []
        for blk in self.blocks:
            h, residual, cache = blk.forward_with_cache(h, residual)
            caches.append(cache)
        return self._final_norm(h, residual), caches

    def init_cache(self, batch):
        return [blk.init_cache(batch) for blk in self.blocks]


class MambaLMHeadModel(nn.Module):
    """MixerModel + tied LM head + generation
    (mixer_seq_simple.py:173-260, utils/generation.py)."""

    vocab_size: int
    d_model: int
    n_layer: int
    rms_norm: bool = False
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = MixerModel(
            vocab_size=self.vocab_size, d_model=self.d_model,
            n_layer=self.n_layer, rms_norm=self.rms_norm,
            scan_impl=self.scan_impl, dtype=self.dtype)

    def __call__(self, input_ids):
        h = self.backbone(input_ids)
        # tied embeddings (mixer_seq_simple.py: tie_weights)
        return jnp.einsum("bld,vd->blv", h.astype(jnp.float32),
                          self.backbone.embedding.astype(jnp.float32))

    def _logits_step(self, token_ids, caches):
        h, caches = self.backbone.step(token_ids, None, caches)
        logits = jnp.einsum("bd,vd->bv", h.astype(jnp.float32),
                            self.backbone.embedding.astype(jnp.float32))
        return logits, caches

    def generate(self, input_ids, max_new_tokens, temperature=0.0, key=None):
        """Parallel-scan prefill (ONE forward regardless of prompt length,
        like the reference's parallel forward before decoding,
        mamba_ssm/utils/generation.py) + ``lax.scan`` decode loop (one
        compiled step reused per token — the reference achieves the same
        with CUDA graphs, benchmark_generation_mamba_simple.py:56-60).
        temperature 0 = greedy."""
        batch, prompt_len = input_ids.shape
        if key is None:
            key = jax.random.key(0)

        h, caches = self.backbone.prefill(input_ids)
        logits = jnp.einsum("bd,vd->bv", h[:, -1].astype(jnp.float32),
                            self.backbone.embedding.astype(jnp.float32))

        def decode_step(carry, _):
            logits, caches, key = carry
            if temperature <= 0.0:
                tok = jnp.argmax(logits, axis=-1)
            else:
                key, sub = jax.random.split(key)
                tok = jax.random.categorical(sub, logits / temperature)
            logits, caches = self._logits_step(tok, caches)
            return (logits, caches, key), tok

        (_, _, _), toks = jax.lax.scan(
            decode_step, (logits, caches, key), None, length=max_new_tokens)
        return jnp.concatenate([input_ids, jnp.swapaxes(toks, 0, 1)], axis=1)
