"""Parameter-count parity with the reference architecture.

Expected counts are derived analytically from the reference definitions
(mamba_simple.py:69-186 for the tri-oriented Mamba, segmamba.py:78-319 for
the CNN, dynunet_block/unetr_block for the UNETR pieces) and compared
against our flax parameter tree, exactly — a structural-parity check that
every weight of the reference exists here with the same size.

Note the only deliberate deltas: torch InstanceNorm3d is affine=False (no
params) in both; our LayerNorm matches torch nn.LayerNorm (affine)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.models import MambaV3, SegMamba


def mamba_v3_expected(d_model, d_state=16, d_conv=4, expand=2):
    d_inner = expand * d_model
    dt_rank = math.ceil(d_model / 16)
    per_direction = (
        d_conv * d_inner + d_inner                      # conv1d w + b
        + d_inner * (dt_rank + 2 * d_state)             # x_proj
        + dt_rank * d_inner + d_inner                   # dt_proj w + b
        + d_inner * d_state                             # A_log
        + d_inner                                       # D
    )
    return (d_model * 2 * d_inner                       # in_proj (no bias)
            + 3 * per_direction                         # fwd / bwd / slice
            + d_inner * d_model)                        # out_proj (no bias)


def count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def test_mamba_v3_param_count():
    m = MambaV3(d_model=48, nslices=8, scan_impl="ref")
    params = m.init(jax.random.key(0), jnp.zeros((1, 8, 48)))
    assert count(params) == mamba_v3_expected(48)


def conv3d_n(cin, cout, k, bias=True):
    return cin * cout * k ** 3 + (cout if bias else 0)


def unet_res_block(cin, cout, k=3, project=None):
    if project is None:
        project = cin != cout
    n = conv3d_n(cin, cout, k, False) + conv3d_n(cout, cout, k, False)
    if project:
        n += conv3d_n(cin, cout, 1, False)
    return n


def unetr_up_block(cin, cout, k=3):
    return cin * cout * 8 + unet_res_block(2 * cout, cout, k)  # transp k2 + res


def segmamba_expected(in_chans=4, out_chans=4, depths=(2, 2, 2, 2),
                      feats=(48, 96, 192, 384), hidden=768):
    n = 0
    # encoder (segmamba.py:134-174)
    n += conv3d_n(in_chans, feats[0], 7)                       # stem
    for i in range(3):                                         # downsamples
        n += conv3d_n(feats[i], feats[i + 1], 2)
    for i in range(4):                                         # GSC
        f = feats[i]
        n += (conv3d_n(f, f, 3) + conv3d_n(f, f, 3)
              + conv3d_n(f, f, 1) + conv3d_n(f, f, 1))
    for i in range(4):                                         # mamba layers
        per_layer = 2 * feats[i] + mamba_v3_expected(feats[i])  # LN(w,b) + mamba
        n += depths[i] * per_layer
    for i in range(4):                                         # mlp heads
        n += conv3d_n(feats[i], 2 * feats[i], 1) + conv3d_n(2 * feats[i],
                                                            feats[i], 1)
    # UNETR wrapper (segmamba.py:227-319)
    n += unet_res_block(in_chans, feats[0])                    # encoder1
    n += unet_res_block(feats[0], feats[1])                    # encoder2
    n += unet_res_block(feats[1], feats[2])                    # encoder3
    n += unet_res_block(feats[2], feats[3])                    # encoder4
    n += unet_res_block(feats[3], hidden)                      # encoder5
    n += unetr_up_block(hidden, feats[3])                      # decoder5
    n += unetr_up_block(feats[3], feats[2])                    # decoder4
    n += unetr_up_block(feats[2], feats[1])                    # decoder3
    n += unetr_up_block(feats[1], feats[0])                    # decoder2
    n += unet_res_block(feats[0], feats[0])                    # decoder1
    n += conv3d_n(feats[0], out_chans, 1)                      # out block
    return n


@pytest.mark.slow
def test_segmamba_param_count_flagship():
    model = SegMamba(in_chans=4, out_chans=4, scan_impl="ref")
    params = jax.eval_shape(model.init, jax.random.key(0),
                            jnp.zeros((1, 64, 64, 64, 4)))
    got = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert got == segmamba_expected()


def test_segmamba_param_count_tiny():
    model = SegMamba(in_chans=2, out_chans=3, depths=(1, 1, 1, 1),
                     feat_size=(4, 8, 16, 32), hidden_size=64,
                     num_slices_list=(8, 4, 2, 1), scan_impl="ref")
    params = jax.eval_shape(model.init, jax.random.key(0),
                            jnp.zeros((1, 16, 16, 16, 2)))
    got = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    want = segmamba_expected(2, 3, (1, 1, 1, 1), (4, 8, 16, 32), 64)
    assert got == want
