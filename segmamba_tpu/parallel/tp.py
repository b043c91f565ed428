"""Tensor parallelism (channel sharding) for the Mamba inner op.

A capability beyond the reference (its parallelism is DP-only NCCL,
/root/reference/light_training/trainer.py:100-107): the selective scan is
elementwise over the channel (d_inner) axis, so Mamba's inner dimension
shards cleanly over a "model" mesh axis the TPU-idiomatic way — parameter
NamedShardings + activation ``with_sharding_constraint`` markers, with XLA
GSPMD inserting the two reduce collectives (after the row-parallel
``x_proj`` and ``out_proj`` matmuls) over ICI.

Sharding layout per MambaV3 parameter (models/mamba.py:110-136):

    in_proj        (d_model, 2*d_inner)   column-parallel  P(None, model)
    conv1d*_weight (d_conv, d_inner)      channel          P(None, model)
    conv1d*_bias   (d_inner,)             channel          P(model)
    x_proj*        (d_inner, R+2N)        row-parallel     P(model, None)
    dt_proj*       (R, d_inner)           column-parallel  P(None, model)
    dt_proj*_bias  (d_inner,)             channel          P(model)
    A*_log         (d_inner, N)           channel          P(model, None)
    D*             (d_inner,)             channel          P(model)
    out_proj       (d_inner, d_model)     row-parallel     P(model, None)

Everything else (encoder/decoder convs, norms, heads) stays replicated.
The depthwise causal conv and the scan itself touch each channel
independently, so between the two matmul reductions no communication is
needed at all. Use the jnp scan cores (``scan_impl="chunked"``/"ref") under
TP — a Pallas kernel is a single-device program and would force XLA to
gather the sharded operands (correct, but defeats the sharding); combining
TP with the Pallas path requires shard_map, which is what the sequence-
parallel path (ops/scan_sharded.py) already demonstrates.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(name: str, model_axis: str):
    m = model_axis
    if name == "in_proj":
        return P(None, m)
    if name.startswith("conv1d"):
        return P(None, m) if name.endswith("_weight") else P(m)
    if name.startswith("x_proj"):
        return P(m, None)
    if name.startswith("dt_proj"):
        return P(m) if name.endswith("_bias") else P(None, m)
    if name.startswith("A") and name.endswith("_log"):
        return P(m, None)
    if name in ("D", "D_b", "D_s"):
        return P(m)
    if name == "out_proj":
        return P(m, None)
    return P()


def _path_leaf_name(path) -> str:
    """Last string key of a tree path (DictKey / GetAttrKey agnostic)."""
    for entry in reversed(path):
        for attr in ("key", "name"):
            v = getattr(entry, attr, None)
            if isinstance(v, str):
                return v
    return ""


def tp_specs(tree, model_axis: str = "model"):
    """PartitionSpec pytree for ``tree`` (params or a params-shaped opt-state
    subtree), keyed on MambaV3 leaf parameter names."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(_path_leaf_name(path), model_axis),
        tree)


def tp_shard(tree, mesh: Mesh, model_axis: str = "model"):
    """Place ``tree`` on ``mesh`` with Mamba-inner leaves sharded over
    ``model_axis`` and everything else replicated. Works on the params tree
    and on whole TrainStates (optimizer momentum mirrors the params
    structure, so the same name-keyed rules apply)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, _leaf_spec(
                _path_leaf_name(path), model_axis))),
        tree)
