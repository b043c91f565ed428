"""Checkpointing: orbax-backed full train-state save/restore with the
reference's keep-best-by-metric filename convention.

The reference saves model-only .pt files named ``best_model_{dice:.4f}.pt`` /
``final_model_{dice:.4f}.pt`` and deletes the previous one by symbol glob
(/root/reference/3_train.py:136-150,
light_training/utils/files_helper.py:6-22) — with **no optimizer/step state,
so no true resume**. Here each checkpoint is a full state (params + opt state
+ step + epoch + metric), which adds resume capability while keeping the
metric-named keep-one-best layout.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import orbax.checkpoint as ocp


def _state_to_tree(state, epoch, metric):
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "metric": np.asarray(metric if metric is not None else np.nan),
    }


def save_checkpoint(state, path, epoch=0, metric=None):
    """Write a full checkpoint directory at ``path``."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _state_to_tree(state, epoch, metric), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(state, path):
    """Restore into an existing (abstract) train state; returns
    (state, epoch). Unknown extra keys are ignored."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = _state_to_tree(state, 0, 0.0)
    restored = ckptr.restore(path, target=target)
    state = state.replace(params=restored["params"],
                          opt_state=restored["opt_state"],
                          step=int(restored["step"]))
    return state, int(restored["epoch"])


def restore_params(path, params_template=None):
    """Params-only restore (for inference, 4_predict-style)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if params_template is None:
        restored = ckptr.restore(path)
    else:
        restored = ckptr.restore(
            path, target={"params": params_template, "opt_state": None,
                          "step": None, "epoch": None, "metric": None})
    return restored["params"]


def save_new_and_delete_last(state, model_dir, symbol, metric, epoch):
    """Keep exactly one ``<symbol>_<metric:.4f>`` checkpoint per symbol
    (files_helper.py:13-22 semantics, directory-valued)."""
    os.makedirs(model_dir, exist_ok=True)
    new_path = os.path.join(model_dir, f"{symbol}_{metric:.4f}")
    old = [p for p in glob.glob(os.path.join(model_dir, f"{symbol}_*"))
           if os.path.abspath(p) != os.path.abspath(new_path)]
    save_checkpoint(state, new_path, epoch=epoch, metric=metric)
    for p in old:
        shutil.rmtree(p, ignore_errors=True)
    return new_path


def find_checkpoint(model_dir, symbol="best_model"):
    """Locate the (single) checkpoint for a symbol; falls back to any."""
    cands = sorted(glob.glob(os.path.join(model_dir, f"{symbol}_*")))
    if not cands:
        cands = sorted(glob.glob(os.path.join(model_dir, "*_*")))
    return cands[-1] if cands else None
