"""Torch SegMamba checkpoint -> flax params converter.

Maps the reference's ``state_dict`` names and tensor layouts
(/root/reference/model_segmamba/segmamba.py:134-343 module tree,
/root/reference/mamba/mamba_ssm/modules/mamba_simple.py:60-186 Mamba
parameters) onto this repo's flax tree (models/segmamba.py /
models/mamba.py). This is what unlocks loading the published
``final_model_0.9038.pt`` (4_predict.py:51) into the TPU model.

Layout rules:
- torch Conv3d weight (Cout, Cin, kz, ky, kx)  -> DHWIO (kz, ky, kx, Cin, Cout)
- torch ConvTranspose3d weight (Cin, Cout, k..) -> DHWIO + SPATIAL FLIP
  (the two parameterizations differ by kernel reorientation — validated in
  tests/test_torch_parity.py::test_conv_transpose3d_matches_torch)
- torch Linear weight (out, in)                -> (in, out)
- torch depthwise Conv1d weight (E, 1, W)      -> (W, E)
- LayerNorm weight/bias                        -> scale/bias
- InstanceNorm3d everywhere is affine=False    -> no parameters
- DDP checkpoints carry a ``module.`` prefix   -> stripped
  (reference strips it the same way, light_training/trainer.py:503-515)

Input tensors may be numpy arrays or torch tensors.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv3d(w):
    return np.transpose(_np(w), (2, 3, 4, 1, 0))


def _conv_transpose3d(w):
    k = np.transpose(_np(w), (2, 3, 4, 0, 1))
    return k[::-1, ::-1, ::-1].copy()


def _linear(w):
    return np.transpose(_np(w), (1, 0))


def _conv1d_depthwise(w):
    return np.transpose(_np(w)[:, 0, :], (1, 0))


def _mamba_params(get, prefix):
    """One tri-oriented Mamba module (mamba_simple.py:60-186)."""
    out = {
        "in_proj": _linear(get(f"{prefix}.in_proj.weight")),
        "out_proj": _linear(get(f"{prefix}.out_proj.weight")),
    }
    for tsuf, fsuf in (("", ""), ("_b", "_b"), ("_s", "_s")):
        out[f"conv1d{fsuf}_weight"] = _conv1d_depthwise(
            get(f"{prefix}.conv1d{tsuf}.weight"))
        out[f"conv1d{fsuf}_bias"] = _np(get(f"{prefix}.conv1d{tsuf}.bias"))
        out[f"x_proj{fsuf}"] = _linear(get(f"{prefix}.x_proj{tsuf}.weight"))
        out[f"dt_proj{fsuf}"] = _linear(get(f"{prefix}.dt_proj{tsuf}.weight"))
        out[f"dt_proj{fsuf}_bias"] = _np(get(f"{prefix}.dt_proj{tsuf}.bias"))
        out[f"A{fsuf}_log"] = _np(get(f"{prefix}.A{tsuf}_log"))
        out[f"D{fsuf}"] = _np(get(f"{prefix}.D{tsuf}"))
    return out


def _res_block(get, prefix, has_conv3):
    """MONAI UnetResBlock / UnetrBasicBlock.layer
    (monai/networks/blocks/dynunet_block.py:25-111)."""
    out = {
        "conv1": {"kernel": _conv3d(get(f"{prefix}.conv1.conv.weight"))},
        "conv2": {"kernel": _conv3d(get(f"{prefix}.conv2.conv.weight"))},
    }
    if has_conv3:
        out["conv3"] = {"kernel": _conv3d(get(f"{prefix}.conv3.conv.weight"))}
    return out


def convert_segmamba_state_dict(state_dict, depths=(2, 2, 2, 2)):
    """Reference ``SegMamba().state_dict()`` -> ``{"params": ...}``.

    ``depths`` must match the checkpoint's per-stage MambaLayer counts
    (segmamba.py:195-209 default [2, 2, 2, 2]).
    """
    sd = {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state_dict.items()}
    seen = set()

    def get(name):
        seen.add(name)
        return sd[name]

    vit = {
        "stem": {"kernel": _conv3d(get("vit.downsample_layers.0.0.weight")),
                 "bias": _np(get("vit.downsample_layers.0.0.bias"))},
    }
    for i in range(1, 4):
        vit[f"downsample{i}"] = {
            "kernel": _conv3d(get(f"vit.downsample_layers.{i}.1.weight")),
            "bias": _np(get(f"vit.downsample_layers.{i}.1.bias")),
        }
    for i in range(4):
        vit[f"gsc{i}"] = {
            name: {"kernel": _conv3d(get(f"vit.gscs.{i}.{name}.weight")),
                   "bias": _np(get(f"vit.gscs.{i}.{name}.bias"))}
            for name in ("proj", "proj2", "proj3", "proj4")
        }
        for j in range(depths[i]):
            vit[f"stage{i}_block{j}"] = {
                "LayerNorm_0": {
                    "scale": _np(get(f"vit.stages.{i}.{j}.norm.weight")),
                    "bias": _np(get(f"vit.stages.{i}.{j}.norm.bias")),
                },
                "mamba": _mamba_params(get, f"vit.stages.{i}.{j}.mamba"),
            }
        vit[f"mlp{i}"] = {
            "fc1": {"kernel": _conv3d(get(f"vit.mlps.{i}.fc1.weight")),
                    "bias": _np(get(f"vit.mlps.{i}.fc1.bias"))},
            "fc2": {"kernel": _conv3d(get(f"vit.mlps.{i}.fc2.weight")),
                    "bias": _np(get(f"vit.mlps.{i}.fc2.bias"))},
        }

    params = {"vit": vit}
    # a res block carries a 1x1 shortcut conv3 iff in/out channels differ
    # or it strides (dynunet_block.py:25-111) — detect from the checkpoint
    params["encoder1"] = {
        "layer": _res_block(get, "encoder1.layer",
                            "encoder1.layer.conv3.conv.weight" in sd)}
    for k in range(2, 6):
        params[f"encoder{k}"] = {
            "layer": _res_block(get, f"encoder{k}.layer",
                                f"encoder{k}.layer.conv3.conv.weight" in sd)}
    for k in range(2, 6):
        params[f"decoder{k}"] = {
            "transp_conv": {"kernel": _conv_transpose3d(
                get(f"decoder{k}.transp_conv.conv.weight"))},
            "conv_block": _res_block(
                get, f"decoder{k}.conv_block",
                f"decoder{k}.conv_block.conv3.conv.weight" in sd),
        }
    params["decoder1"] = {"layer": _res_block(get, "decoder1.layer", False)}
    params["out"] = {"conv": {
        "kernel": _conv3d(get("out.conv.conv.weight")),
        "bias": _np(get("out.conv.conv.bias")),
    }}

    leftover = sorted(k for k in sd if k not in seen
                      and not k.endswith("num_batches_tracked"))
    if leftover:
        raise ValueError(f"unconverted checkpoint entries: {leftover[:10]}"
                         f"{'...' if len(leftover) > 10 else ''}")
    return {"params": params}


def load_torch_checkpoint(path, depths=(2, 2, 2, 2)):
    """Load a reference ``.pt`` checkpoint file and convert it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_segmamba_state_dict(sd, depths=depths)
