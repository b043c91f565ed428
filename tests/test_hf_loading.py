"""Pretrained-LM loading: torch Mamba LM state dict -> flax tree.

Covers the reference's hf.py surface (mamba_ssm/utils/hf.py) in offline
form: name/layout conversion plus a numeric check of a converted mixer
against an explicit torch forward.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from segmamba_tpu.models.mamba_lm import MambaLMHeadModel, MambaUni
from segmamba_tpu.utils.hf import (
    convert_lm_state_dict,
    from_pretrained,
    load_config,
)
from tests.test_torch_convert import _selective_scan


class TUniMamba(tnn.Module):
    """Uni-directional Mamba mixer with reference parameter names
    (mamba_simple.py:60-121, bimamba_type='none' path)."""

    def __init__(self, d_model, d_state=16, d_conv=4, expand=2):
        super().__init__()
        E = expand * d_model
        R = -(-d_model // 16)
        self.E, self.R, self.N = E, R, d_state
        self.in_proj = tnn.Linear(d_model, 2 * E, bias=False)
        self.out_proj = tnn.Linear(E, d_model, bias=False)
        self.conv1d = tnn.Conv1d(E, E, d_conv, groups=E, padding=d_conv - 1)
        self.x_proj = tnn.Linear(E, R + 2 * d_state, bias=False)
        self.dt_proj = tnn.Linear(R, E, bias=True)
        self.A_log = tnn.Parameter(0.3 * torch.randn(E, d_state))
        self.D = tnn.Parameter(torch.ones(E))

    def forward(self, h):
        E, R, N = self.E, self.R, self.N
        L = h.shape[1]
        xz = self.in_proj(h)
        x, z = xz[..., :E], xz[..., E:]
        xc = tF.silu(self.conv1d(x.transpose(1, 2))[:, :, :L]
                     .transpose(1, 2))
        db = self.x_proj(xc)
        delta = tF.softplus(self.dt_proj(db[..., :R]))
        B, C = db[..., R:R + N], db[..., R + N:]
        y = _selective_scan(xc, delta, -torch.exp(self.A_log), B, C,
                            self.D, z)
        return self.out_proj(y)


def test_mixer_conversion_numeric():
    torch.manual_seed(1)
    tm = TUniMamba(16).eval()
    sd = {f"backbone.layers.0.mixer.{k}": v
          for k, v in tm.state_dict().items()}
    sd["backbone.embedding.weight"] = torch.zeros(8, 16)
    sd["backbone.layers.0.norm.weight"] = torch.ones(16)
    sd["backbone.norm_f.weight"] = torch.ones(16)
    params = convert_lm_state_dict(sd)
    mixer_params = {"params":
                    params["params"]["backbone"]["layers_0"]["mixer"]}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    fm = MambaUni(d_model=16, scan_impl="ref")
    got = np.asarray(fm.apply(
        jax.tree_util.tree_map(jnp.asarray, mixer_params), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_from_pretrained_local_dir(tmp_path):
    """End-to-end: config.json + pytorch_model.bin dir -> model + params
    with a tree matching the flax init exactly."""
    cfg = dict(d_model=16, n_layer=2, vocab_size=50, rms_norm=True)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg, f)

    ref = MambaLMHeadModel(vocab_size=50, d_model=16, n_layer=2,
                           rms_norm=True, scan_impl="ref")
    want_tree = ref.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))

    torch.manual_seed(0)
    sd = {"backbone.embedding.weight": torch.randn(50, 16),
          "backbone.norm_f.weight": torch.ones(16),
          "lm_head.weight": torch.randn(50, 16)}
    for i in range(2):
        m = TUniMamba(16)
        sd.update({f"backbone.layers.{i}.mixer.{k}": v
                   for k, v in m.state_dict().items()})
        sd[f"backbone.layers.{i}.norm.weight"] = torch.ones(16)
    torch.save(sd, tmp_path / "pytorch_model.bin")

    model, params = from_pretrained(str(tmp_path))
    assert model.n_layer == 2 and model.vocab_size == 50
    pw = sorted(tuple(str(k.key) for k in p) for p, _ in
                jax.tree_util.tree_flatten_with_path(want_tree)[0])
    pg = sorted(tuple(str(k.key) for k in p) for p, _ in
                jax.tree_util.tree_flatten_with_path(
                    jax.tree_util.tree_map(jnp.asarray, params))[0])
    assert pg == pw
    logits = model.apply(jax.tree_util.tree_map(jnp.asarray, params),
                         jnp.zeros((1, 4), jnp.int32))
    assert logits.shape == (1, 4, 50)
