"""Sliding-window inference, TTA predictor, inverse pipeline, metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

from segmamba_tpu.infer import Predictor, SlidingWindowInferer, \
    sliding_window_inference
from segmamba_tpu.infer.sliding_window import (
    _scan_starts,
    gaussian_importance_map,
)
from segmamba_tpu.metrics import (
    dice,
    hausdorff_distance_95,
    avg_surface_distance_symmetric,
)
from segmamba_tpu.metrics.metrics import convert_labels_brats


def test_scan_starts_cover_volume():
    starts = _scan_starts((64, 48, 32), (32, 32, 32), overlap=0.5)
    # coverage: every voxel inside some window
    cov = np.zeros((64, 48, 32), bool)
    for s in starts:
        cov[s[0]:s[0] + 32, s[1]:s[1] + 32, s[2]:s[2] + 32] = True
    assert cov.all()
    # overlap 0.5 -> interval 16 on the 64-dim: starts 0,16,32
    zs = sorted({s[0] for s in starts})
    assert zs == [0, 16, 32]


def test_gaussian_importance_map():
    m = gaussian_importance_map((8, 8, 8))
    assert m.shape == (8, 8, 8)
    assert m.max() == pytest.approx(1.0)
    assert (m > 0).all()
    # peak near center
    assert m[3:5, 3:5, 3:5].max() == m.max()


def test_sliding_window_identity_predictor():
    """A predictor that echoes the input must reconstruct the volume exactly
    (weighted average of identical values)."""
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((1, 24, 24, 24, 3)), jnp.float32)

    def echo(wins):
        return wins  # K == C

    out = sliding_window_inference(vol, (16, 16, 16), echo, overlap=0.5,
                                   sw_batch_size=2, bucket=8)
    # Inside the original volume, blending identical overlapping values
    # must return the original values.
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vol[0]),
                               rtol=1e-4, atol=1e-5)


def test_sliding_window_matches_direct_forward():
    """For a volume exactly equal to one window, sliding window == direct."""
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 5)), jnp.float32)

    def linear(wins):
        return jnp.einsum("bzyxc,ck->bzyxk", wins, w)

    inferer = SlidingWindowInferer((16, 16, 16), sw_batch_size=1, bucket=16)
    out = inferer(vol, linear)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(linear(vol)[0]),
                               rtol=1e-4, atol=1e-5)


def test_fused_and_hostloop_paths_agree():
    """The single fused program and the per-group host-loop split must give
    identical blended logits — including odd window counts (padded group
    masked by wmask) and params passed via predictor_args."""
    rng = np.random.default_rng(7)
    vol = jnp.asarray(rng.standard_normal((1, 40, 24, 24, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)

    def linear(wgt, wins):
        return jnp.einsum("bzyxc,ck->bzyxk", wins, wgt) + 0.1

    # overlap .5 / roi 16 on the 40-dim -> 4 starts x 2 x 2 = 16 windows;
    # sw_batch 3 forces a padded final group (wmask path)
    kw = dict(overlap=0.5, sw_batch_size=3, bucket=8, predictor_args=(w,))
    fused = sliding_window_inference(vol, (16, 16, 16), linear,
                                     host_loop=False, **kw)
    hostl = sliding_window_inference(vol, (16, 16, 16), linear,
                                     host_loop=True, **kw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(hostl),
                               rtol=1e-5, atol=1e-5)


def test_mirror_tta_symmetric_predictor():
    """A flip-equivariant predictor makes TTA a no-op."""
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)

    def pointwise(wins):
        return wins * 2.0  # equivariant to flips

    inferer = SlidingWindowInferer((16, 16, 16), sw_batch_size=1, bucket=16)
    pred = Predictor(inferer, mirror_axes=(0, 1, 2))
    out = pred.maybe_mirror_and_predict(vol, pointwise)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vol[0]) * 2.0,
                               rtol=1e-4, atol=1e-5)


def test_inverse_pipeline_roundtrip(tmp_path):
    """resample-back + uncrop must invert the preprocessing geometry."""
    props = {
        "shape_before_cropping": (20, 22, 24),
        "bbox_used_for_cropping": [[2, 12], [3, 14], [4, 16]],
        "shape_after_cropping_before_resample": (10, 11, 12),
        "name": "case_x",
        "spacing": (1.0, 1.0, 1.0),
    }
    # model output at 2x resolution of the cropped region
    logits = np.zeros((1, 20, 22, 24, 2), np.float32)
    logits[..., 1] = 1.0  # class 1 everywhere
    raw = Predictor.predict_raw_probability(logits, props)
    assert raw.shape == (2, 10, 11, 12)
    seg = np.argmax(raw, axis=0)[None]
    full = Predictor.predict_noncrop_probability(seg, props)
    assert full.shape == (1, 20, 22, 24)
    assert full[0, 5, 5, 5] == 1      # inside bbox
    assert full[0, 0, 0, 0] == 0      # outside bbox

    path = Predictor.save_to_nii(full, props, str(tmp_path))
    from segmamba_tpu.data import read_nifti
    back = read_nifti(path)
    np.testing.assert_array_equal(back, full[0])


def test_largest_connected_component():
    seg = np.zeros((10, 10, 10), np.uint8)
    seg[1:5, 1:5, 1:5] = 1     # big
    seg[8:9, 8:9, 8:9] = 1     # small
    out = Predictor.largest_connected_component(seg)
    assert out[2, 2, 2] == 1 and out[8, 8, 8] == 0


def test_dice_and_hd95():
    a = np.zeros((12, 12, 12), bool)
    b = np.zeros((12, 12, 12), bool)
    a[2:8, 2:8, 2:8] = True
    b[2:8, 2:8, 2:8] = True
    assert dice(a, b) == pytest.approx(1.0)
    assert hausdorff_distance_95(a, b) == pytest.approx(0.0)
    # shift by 2: HD95 ~ 2
    c = np.zeros_like(a)
    c[4:10, 2:8, 2:8] = True
    assert 1.0 <= hausdorff_distance_95(a, c) <= 3.0
    d = dice(a, c)
    assert 0.5 < d < 0.8
    assert avg_surface_distance_symmetric(a, c) > 0.0
    # empty prediction -> nan
    assert np.isnan(dice(np.zeros_like(a), a) if False else
                    hausdorff_distance_95(np.zeros_like(a), a))


def test_convert_labels_brats():
    labels = np.array([[0, 1, 2, 3]])
    out = convert_labels_brats(labels)
    np.testing.assert_array_equal(out[0], [[0, 1, 0, 1]])  # TC
    np.testing.assert_array_equal(out[1], [[0, 1, 1, 1]])  # WT
    np.testing.assert_array_equal(out[2], [[0, 0, 0, 1]])  # ET


def test_window_tta_matches_volume_tta():
    """Window-level TTA (tta_flips inside the fused program) equals the
    volume-level 8-pass protocol (prediction.py:110-159 semantics) when the
    window grid is mirror-closed — here 24^3 / roi 16 / overlap .5 gives
    starts {0, 8} per dim, and mirror(0) = 24-16-0 = 8 is in the grid."""
    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.standard_normal((1, 24, 24, 24, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 3, 3)), jnp.float32)

    def conv_ish(wins):
        # flip-sensitive predictor: causal shift + channel mix
        shifted = jnp.pad(wins, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
                          )[:, :-1]
        return (jnp.einsum("bzyxc,ckj->bzyxkj", wins, w).sum(-1)
                + 0.3 * jnp.einsum("bzyxc,ckj->bzyxkj", shifted, w).sum(-2))

    kw = dict(overlap=0.5, sw_batch_size=1, bucket=8)
    axes = (0, 1, 2)
    import itertools
    acc = sliding_window_inference(vol, (16, 16, 16), conv_ish, **kw)
    n = 1
    for r in range(1, 4):
        for combo in itertools.combinations(axes, r):
            ax = tuple(a + 1 for a in combo)
            out = sliding_window_inference(jnp.flip(vol, ax), (16, 16, 16),
                                           conv_ish, **kw)
            acc = acc + jnp.flip(out, ax)
            n += 1
    volume_level = acc / n

    window_level = sliding_window_inference(vol, (16, 16, 16), conv_ish,
                                            tta_flips=axes, **kw)
    np.testing.assert_allclose(np.asarray(window_level),
                               np.asarray(volume_level), rtol=1e-5,
                               atol=1e-5)

    # hostloop TTA path agrees with the fused TTA path
    window_hl = sliding_window_inference(vol, (16, 16, 16), conv_ish,
                                         tta_flips=axes, host_loop=True,
                                         **kw)
    np.testing.assert_allclose(np.asarray(window_hl),
                               np.asarray(window_level), rtol=1e-5,
                               atol=1e-5)


def test_in_graph_pad_paths_agree():
    """auto (host-pad, bucket-keyed compile) vs in_graph_pad=True (case-
    shape-keyed, one dispatch) produce identical results."""
    rng = np.random.default_rng(12)
    vol = jnp.asarray(rng.standard_normal((1, 20, 24, 18, 2)), jnp.float32)

    def pointwise(wins):
        return wins * 1.5 + 0.25

    kw = dict(overlap=0.5, sw_batch_size=1, bucket=8)
    a = sliding_window_inference(vol, (16, 16, 16), pointwise,
                                 in_graph_pad=True, **kw)
    b = sliding_window_inference(vol, (16, 16, 16), pointwise,
                                 in_graph_pad=None, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)


def test_sliding_window_batch2_raises():
    vol = jnp.zeros((2, 16, 16, 16, 1), jnp.float32)
    with pytest.raises(ValueError, match="batch size 1"):
        sliding_window_inference(vol, (16, 16, 16), lambda w: w,
                                 in_graph_pad=True, bucket=16)
