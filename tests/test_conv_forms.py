"""Exactness tests for Conv3d / ConvTranspose3d dispatch reformulations.

Every fast path in models/layers.py (1x1x1 matmul, k3s1 conv2d-form,
patchify space-to-depth, odd-k stride-2 depth-fold, transposed-conv
matmul+depth-to-space) must be algebraically identical to the plain XLA
conv emitter for the same parameters — these tests pin that at f32 on CPU
(tolerance ~1e-5; the paths differ only in summation order).

Reference semantics anchored: torch Conv3d/ConvTranspose3d defaults as used
by the reference model (model_segmamba/segmamba.py stem k7s2p3, k2s2
downsamples; monai dynunet_block get_conv_layer transposed k2s2 upsamples).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmamba_tpu.models.layers import Conv3d, ConvTranspose3d


def _conv_ref(x, kernel, strides, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, strides, [(padding, padding)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize(
    "shape,cout,k,s,p",
    [
        ((1, 8, 8, 8, 4), 6, 7, 2, 3),    # stem form (odd k, stride 2)
        ((2, 6, 6, 6, 3), 5, 3, 2, 1),    # odd k3 stride 2
        ((1, 8, 8, 8, 5), 7, 2, 2, 0),    # patchify k2s2 (downsample form)
        ((1, 6, 6, 6, 4), 5, 3, 3, 0),    # patchify k3s3
        ((1, 6, 6, 6, 4), 5, 1, 1, 0),    # 1x1x1 matmul
        ((1, 6, 6, 6, 4), 5, 3, 1, 1),    # k3s1 (emitter or conv2d-form)
    ],
)
def test_conv3d_paths_match_emitter(shape, cout, k, s, p):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    m = Conv3d(cout, k, s, p, use_bias=True)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    kern = params["params"]["kernel"]
    bias = params["params"]["bias"]
    ref = _conv_ref(x, kern, (s,) * 3, p) + bias
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,cout,k", [((1, 4, 4, 4, 6), 3, 2),
                                          ((2, 3, 5, 4, 4), 5, 2)])
def test_conv_transpose_matmul_matches_emitter(shape, cout, k):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    m = ConvTranspose3d(cout, kernel_size=k, stride=k)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    kern = params["params"]["kernel"]
    ref = jax.lax.conv_transpose(
        x, kern, (k,) * 3, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_k3s1_acc3_matches_emitter():
    """The accumulated-conv2d form (dispatched at >=64^3 on TPU, so never
    reached by the small-shape dispatch tests above) must match the plain
    conv3d emitter bit-for-tolerance at f32."""
    from segmamba_tpu.models.layers import _conv_k3s1_acc3

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 5, 6, 7, 4)), jnp.float32)
    kern = jnp.asarray(0.1 * rng.standard_normal((3, 3, 3, 4, 5)),
                       jnp.float32)
    ref = _conv_ref(x, kern, (1, 1, 1), 1)
    got = _conv_k3s1_acc3(x, kern)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_stride2_odd_spatial():
    """Odd h/w must fall back to the emitter (the depth-fold branch's
    reshape assumed even dims; regression for the (6,7,8) failure)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 6, 7, 8, 3)), jnp.float32)
    m = Conv3d(5, 3, 2, 1, use_bias=False)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    ref = _conv_ref(x, params["params"]["kernel"], (2, 2, 2), 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
