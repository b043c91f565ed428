"""Whole-volume single-shot inference + distributed eval helpers."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

import jax
import jax.numpy as jnp

from segmamba_tpu.infer.whole_volume import (
    WholeVolumePredictor,
    nonzero_bbox,
    num_slices_for_shape,
    pad_to_multiple,
    whole_volume_inference,
)
from segmamba_tpu.models import SegMamba
from segmamba_tpu.parallel.eval import (
    distributed_concat,
    eval_map,
    sequential_shards,
)

TINY = dict(in_chans=2, out_chans=3, depths=(1, 1, 1, 1),
            feat_size=(4, 8, 16, 32), hidden_size=64,
            num_slices_list=(8, 4, 2, 1), scan_impl="ref")


def test_num_slices_for_shape():
    assert num_slices_for_shape((128, 128, 128)) == (64, 32, 16, 8)
    assert num_slices_for_shape((160, 240, 240)) == (80, 40, 20, 10)


def test_pad_to_multiple():
    v = jnp.zeros((1, 20, 22, 24, 2))
    p, orig = pad_to_multiple(v, 16)
    assert p.shape == (1, 32, 32, 32, 2)
    assert orig == (20, 22, 24)


def test_whole_volume_matches_direct_on_exact_shape():
    """On an already-divisible shape with the matching num_slices_list, the
    whole-volume path must equal a plain forward."""
    model = SegMamba(**TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    direct = model.apply(params, x)
    wv = whole_volume_inference(model, params, x, multiple=16)
    np.testing.assert_allclose(np.asarray(wv), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


def test_whole_volume_ragged_shape():
    """A non-divisible volume runs via padding and returns original size;
    weights are shared with the patch model (shape-agnostic params)."""
    model = SegMamba(**TINY)
    rng = np.random.default_rng(1)
    x16 = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    params = model.init(jax.random.key(0), x16)
    x = jnp.asarray(rng.standard_normal((1, 20, 22, 24, 2)), jnp.float32)
    out = whole_volume_inference(model, params, x, multiple=16)
    assert out.shape == (1, 20, 22, 24, 3)
    assert bool(jnp.isfinite(out).all())

    pred = WholeVolumePredictor(model, params, mirror_axes=(0,))
    tta = pred.maybe_mirror_and_predict(x)
    assert tta.shape == (1, 20, 22, 24, 3)


def test_nonzero_bbox():
    v = np.zeros((1, 40, 48, 40, 2), np.float32)
    v[0, 10:26, 7:30, 5:21] = 1.0
    box = nonzero_bbox(jnp.asarray(v), multiple=16)
    (z0, z1), (y0, y1), (x0, x1) = box
    # extents rounded up to 16 and the box covers the support
    assert (z1 - z0) % 16 == 0 and (y1 - y0) % 16 == 0 and (x1 - x0) % 16 == 0
    assert z0 <= 10 and z1 >= 26 and y0 <= 7 and y1 >= 30
    assert x0 <= 5 and x1 >= 21
    # extent never exceeds the volume
    full = nonzero_bbox(jnp.asarray(np.ones((1, 20, 20, 20, 1))), multiple=16)
    assert full == ((0, 20), (0, 20), (0, 20))
    # all-zero volume falls back to the full frame
    empty = nonzero_bbox(jnp.asarray(np.zeros((1, 20, 20, 20, 1))))
    assert empty == ((0, 20), (0, 20), (0, 20))


def test_whole_volume_crop_to_nonzero_matches_inside_and_bg_outside():
    """With a compact nonzero support, the cropped single shot must equal
    the uncropped forward inside the box region it computed, and argmax to
    background outside."""
    model = SegMamba(**TINY)
    rng = np.random.default_rng(2)
    x16 = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    params = model.init(jax.random.key(0), x16)
    vol = np.zeros((1, 32, 48, 32, 2), np.float32)
    vol[0, 8:24, 16:32, 8:24] = rng.standard_normal((16, 16, 16, 2))
    vol = jnp.asarray(vol)
    out = whole_volume_inference(model, params, vol, multiple=16,
                                 crop_to_nonzero=True)
    assert out.shape == (1, 32, 48, 32, 3)
    box = nonzero_bbox(vol, 16)
    (z0, z1), (y0, y1), (x0, x1) = box
    ref = whole_volume_inference(model, params,
                                 vol[:, z0:z1, y0:y1, x0:x1],
                                 multiple=16, crop_to_nonzero=False)
    np.testing.assert_allclose(
        np.asarray(out[:, z0:z1, y0:y1, x0:x1]), np.asarray(ref),
        rtol=1e-5, atol=1e-6)
    seg = np.argmax(np.asarray(out[0]), axis=-1)
    outside = np.ones(seg.shape, bool)
    outside[z0:z1, y0:y1, x0:x1] = False
    assert (seg[outside] == 0).all()


def test_whole_volume_tta_matches_host_flip_average():
    """The one-program fori_loop TTA must equal the explicit host loop:
    mean over all flip combos of flip(model(flip(x)))."""
    import itertools
    from segmamba_tpu.infer.whole_volume import whole_volume_tta

    model = SegMamba(**TINY)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    axes_cfgs = [(0,), (0, 2)]
    for mirror_axes in axes_cfgs:
        got = whole_volume_tta(model, params, x, mirror_axes=mirror_axes,
                               multiple=16, crop_to_nonzero=False)
        pred = model.apply(params, x)
        n = 1
        for r in range(1, len(mirror_axes) + 1):
            for combo in itertools.combinations(mirror_axes, r):
                ax = tuple(a + 1 for a in combo)
                pred = pred + jnp.flip(
                    model.apply(params, jnp.flip(x, ax)), ax)
                n += 1
        np.testing.assert_allclose(np.asarray(got), np.asarray(pred) / n,
                                   rtol=1e-4, atol=1e-5)


def test_whole_volume_tta_ragged_matches_host_protocol():
    """On a NON-divisible shape (real cases) the in-graph TTA must equal
    the host protocol flip(case) -> pad -> forward -> crop -> flip-back:
    padding must stay on the trailing side of the content for every flip
    (rev+roll composition), not get mirrored to the leading side."""
    import itertools
    from segmamba_tpu.infer.whole_volume import whole_volume_tta

    model = SegMamba(**TINY)
    rng = np.random.default_rng(5)
    x16 = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    params = model.init(jax.random.key(0), x16)
    x = jnp.asarray(rng.standard_normal((1, 20, 22, 24, 2)), jnp.float32)

    mirror_axes = (0, 2)
    got = whole_volume_tta(model, params, x, mirror_axes=mirror_axes,
                           multiple=16, crop_to_nonzero=False)
    pred = whole_volume_inference(model, params, x, multiple=16,
                                  crop_to_nonzero=False)
    n = 1
    for r in range(1, len(mirror_axes) + 1):
        for combo in itertools.combinations(mirror_axes, r):
            ax = tuple(a + 1 for a in combo)
            pred = pred + jnp.flip(whole_volume_inference(
                model, params, jnp.flip(x, ax), multiple=16,
                crop_to_nonzero=False), ax)
            n += 1
    np.testing.assert_allclose(np.asarray(got), np.asarray(pred) / n,
                               rtol=1e-4, atol=1e-5)


def test_whole_volume_tta_crop_paste():
    """Cropped TTA pastes background outside the box and keeps shape."""
    from segmamba_tpu.infer.whole_volume import whole_volume_tta

    model = SegMamba(**TINY)
    rng = np.random.default_rng(4)
    x16 = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 2)), jnp.float32)
    params = model.init(jax.random.key(0), x16)
    vol = np.zeros((1, 32, 32, 32, 2), np.float32)
    vol[0, 8:24, 8:24, 8:24] = rng.standard_normal((16, 16, 16, 2))
    out = whole_volume_tta(model, params, jnp.asarray(vol),
                           mirror_axes=(1,), multiple=16)
    assert out.shape == (1, 32, 32, 32, 3)
    seg = np.argmax(np.asarray(out[0]), axis=-1)
    assert (seg[:4, :4, :4] == 0).all()


def test_sequential_shards_and_concat():
    shards, mask = sequential_shards(10, 4)
    assert len(shards) == 4 and all(len(s) == 3 for s in shards)
    # wrap-around padding at the end
    flat_results = [np.asarray([i]) for s in shards for i in s]
    out = distributed_concat([np.concatenate([np.asarray([i]) for i in s])
                              for s in shards], 10)
    np.testing.assert_array_equal(out, np.arange(10))

    got = eval_map(lambda x: x * 2, list(range(7)), n_shards=3)
    assert got == [0, 2, 4, 6, 8, 10, 12]
