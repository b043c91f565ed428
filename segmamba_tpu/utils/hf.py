"""Pretrained Mamba LM loading (offline HF-checkpoint layout).

Equivalent of the reference's ``mamba_ssm/utils/hf.py:load_config_hf /
load_state_dict_hf`` (which pull ``config.json`` + ``pytorch_model.bin``
from the HuggingFace hub): this container has no egress, so the loaders
take a LOCAL directory in the same layout — the files a
``state-spaces/mamba-*`` snapshot contains. Torch-tensor state dicts are
converted to this repo's flax ``MambaLMHeadModel`` tree
(models/mamba_lm.py; torch names per
mamba/mamba_ssm/models/mixer_seq_simple.py:83-260).
"""

from __future__ import annotations

import json
import os

import numpy as np


def load_config(model_dir: str) -> dict:
    """Read ``config.json`` (keys d_model / n_layer / vocab_size /
    rms_norm... as published by state-spaces)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_lm_state_dict(state_dict) -> dict:
    """Torch ``MambaLMHeadModel.state_dict()`` -> flax ``{"params": ...}``.

    Handles: Linear transpose, depthwise Conv1d (E, 1, W) -> (W, E),
    tied ``lm_head.weight`` (dropped — the flax model reuses the
    embedding), and the norm weight/bias naming.
    """
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state_dict.items()}
    lin = lambda w: np.transpose(_np(w), (1, 0))
    backbone: dict = {"embedding": _np(sd["backbone.embedding.weight"])}
    n_layer = 1 + max(int(k.split(".")[2]) for k in sd
                      if k.startswith("backbone.layers."))
    for i in range(n_layer):
        p = f"backbone.layers.{i}"
        mixer = {
            "in_proj": lin(sd[f"{p}.mixer.in_proj.weight"]),
            "out_proj": lin(sd[f"{p}.mixer.out_proj.weight"]),
            "conv1d_weight": np.transpose(
                _np(sd[f"{p}.mixer.conv1d.weight"])[:, 0, :], (1, 0)),
            "conv1d_bias": _np(sd[f"{p}.mixer.conv1d.bias"]),
            "x_proj": lin(sd[f"{p}.mixer.x_proj.weight"]),
            "dt_proj": lin(sd[f"{p}.mixer.dt_proj.weight"]),
            "dt_proj_bias": _np(sd[f"{p}.mixer.dt_proj.bias"]),
            "A_log": _np(sd[f"{p}.mixer.A_log"]),
            "D": _np(sd[f"{p}.mixer.D"]),
        }
        layer = {"mixer": mixer,
                 "norm_weight": _np(sd[f"{p}.norm.weight"])}
        if f"{p}.norm.bias" in sd:
            layer["norm_bias"] = _np(sd[f"{p}.norm.bias"])
        backbone[f"layers_{i}"] = layer
    backbone["norm_f_weight"] = _np(sd["backbone.norm_f.weight"])
    if "backbone.norm_f.bias" in sd:
        backbone["norm_f_bias"] = _np(sd["backbone.norm_f.bias"])
    return {"params": {"backbone": backbone}}


def from_pretrained(model_dir: str, dtype=None, scan_impl: str = "auto"):
    """Build a ``MambaLMHeadModel`` + converted params from a local
    HF-layout snapshot directory (reference: MambaLMHeadModel.from_pretrained,
    mixer_seq_simple.py:240-252)."""
    import torch

    import jax.numpy as jnp
    from segmamba_tpu.models.mamba_lm import MambaLMHeadModel

    cfg = load_config(model_dir)
    model = MambaLMHeadModel(
        vocab_size=cfg["vocab_size"], d_model=cfg["d_model"],
        n_layer=cfg["n_layer"], rms_norm=cfg.get("rms_norm", True),
        scan_impl=scan_impl, dtype=dtype or jnp.float32)
    for name in ("pytorch_model.bin", "model.pt"):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            sd = torch.load(path, map_location="cpu", weights_only=True)
            return model, convert_lm_state_dict(sd)
    raise FileNotFoundError(f"no weights file in {model_dir}")
