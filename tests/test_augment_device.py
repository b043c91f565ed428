"""On-device augmentation chain (data/augment_device.py): geometry vs scipy,
probability semantics, and train-step integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import ndimage

from segmamba_tpu.data.augment_device import (
    _affine_coords,
    _lu_shear_passes,
    _rotation_matrix,
    _tricubic,
    _trilinear,
    _warp_affine_shear,
    device_augment,
)


def test_trilinear_matches_scipy_affine():
    rng = np.random.default_rng(0)
    vol = np.zeros((16, 16, 16), np.float32)
    vol[4:8, 6:10, 2:12] = rng.standard_normal((4, 4, 10))
    a = 0.3
    c, s = np.cos(a), np.sin(a)
    mat = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64) * 1.1
    center = (np.asarray(vol.shape) - 1) / 2
    ref = ndimage.affine_transform(vol, mat, center - mat @ center, order=1,
                                   mode="constant", cval=0.0)
    coords = _affine_coords(jnp.asarray(mat, jnp.float32), vol.shape)
    ours = _trilinear(jnp.asarray(vol), coords, 0.0)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_interp_identity_exact():
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.standard_normal((12, 12, 12)), jnp.float32)
    coords = _affine_coords(jnp.eye(3), vol.shape)
    assert float(jnp.max(jnp.abs(_trilinear(vol, coords, 0.0) - vol))) == 0.0
    assert float(jnp.max(jnp.abs(_tricubic(vol, coords, 0.0) - vol))) == 0.0


def test_cubic_reproduces_linear_ramp():
    # Catmull-Rom interpolates degree-1 polynomials exactly (interior)
    z = jnp.arange(12, dtype=jnp.float32)
    vol = jnp.broadcast_to(z[:, None, None], (12, 12, 12))
    mat = jnp.eye(3) * 0.9
    coords = _affine_coords(mat, (12, 12, 12))
    out = np.asarray(_tricubic(vol, coords, 0.0))
    exp = np.asarray(coords[0])
    c = np.asarray(coords)
    # all 4-tap stencils must be in-bounds along every axis
    interior = np.all((c > 1.0) & (c < 10.0), axis=0)
    np.testing.assert_allclose(out[interior], exp[interior], atol=1e-4)


def test_lu_shear_passes_reproduce_matrix():
    rng = np.random.default_rng(4)
    for _ in range(5):
        mat = np.asarray(_rotation_matrix(
            jax.random.key(int(rng.integers(1 << 30))), 0.52)) \
            * rng.uniform(0.7, 1.4)
        M = np.eye(3)
        for (i, j, m, a) in _lu_shear_passes(jnp.asarray(mat)):
            P = np.eye(3)
            P[i, i] = float(m)
            if j is not None:
                P[i, j] = float(a)
            M = M @ P
        np.testing.assert_allclose(M, mat, atol=1e-6)


def test_shear_warp_identity_exact():
    rng = np.random.default_rng(5)
    vol = jnp.asarray(rng.standard_normal((14, 14, 14, 2)), jnp.float32)
    out = _warp_affine_shear(vol, jnp.eye(3), 3, 0.0)
    assert float(jnp.max(jnp.abs(out - vol))) == 0.0


def test_shear_warp_effective_matrix():
    """Warping coordinate ramps recovers src = mat @ (dst - c) + c exactly
    (order 1; linear interp is exact on degree-1 fields and composition
    preserves it)."""
    N = 17
    mat = np.array([[0.9, 0.2, -0.1],
                    [0.1, 1.1, 0.15],
                    [-0.05, 0.1, 0.95]], np.float32)
    c = (N - 1) / 2.0
    outs = []
    for ax in range(3):
        shape = [1, 1, 1]
        shape[ax] = -1
        ramp = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.float32).reshape(shape), (N, N, N))
        outs.append(np.asarray(_warp_affine_shear(
            ramp[..., None], jnp.asarray(mat), 1, 0.0))[..., 0])
    for p in [(8, 8, 8), (6, 9, 10), (10, 7, 6)]:
        want = mat @ (np.asarray(p, np.float64) - c) + c
        got = np.array([outs[0][p], outs[1][p], outs[2][p]])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_shear_warp_deep_interior_exact_on_ramp():
    """Cubic shear passes reproduce a linear ramp exactly away from the
    edge-fill band (the band is the documented delta vs one-shot warping)."""
    N = 20
    ramp = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[:, None, None], (N, N, N))
    mat = np.asarray(_rotation_matrix(jax.random.key(3), 0.4)) * 1.1
    coords = np.asarray(_affine_coords(jnp.asarray(mat, jnp.float32),
                                       (N, N, N)))
    out = np.asarray(_warp_affine_shear(
        ramp[..., None], jnp.asarray(mat, jnp.float32), 3, 0.0))[..., 0]
    interior = np.all((coords > 6) & (coords < N - 7), axis=0)
    assert interior.sum() > 100
    np.testing.assert_allclose(out[interior], coords[0][interior], atol=1e-4)


def test_shear_warp_close_to_oneshot_oracle_on_blob():
    zz, yy, xx = np.meshgrid(*[np.arange(24.0)] * 3, indexing="ij")
    blob = np.exp(-((zz - 12) ** 2 + (yy - 10) ** 2 + (xx - 13) ** 2)
                  / 30.0).astype(np.float32)
    mat = np.asarray(_rotation_matrix(jax.random.key(7), 0.5)) * 0.85
    coords = _affine_coords(jnp.asarray(mat, jnp.float32), (24, 24, 24))
    oracle = np.asarray(_tricubic(jnp.asarray(blob), coords, 0.0))
    got = np.asarray(_warp_affine_shear(
        jnp.asarray(blob)[..., None], jnp.asarray(mat, jnp.float32),
        3, 0.0))[..., 0]
    assert np.abs(got - oracle).max() < 0.1
    assert np.abs(got - oracle).mean() < 5e-3


def test_chain_shapes_labels_and_fire_rate():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((48, 8, 8, 8, 2)), jnp.float32)
    seg = jnp.asarray(rng.integers(-1, 3, (48, 8, 8, 8)), jnp.int32)
    oi, os_ = device_augment(img, seg, jax.random.key(0))
    assert oi.shape == img.shape and os_.shape == seg.shape
    assert bool(jnp.all(jnp.isfinite(oi)))
    assert int(os_.min()) >= 0                    # RemoveLabel(-1 -> 0)
    changed = jnp.any(jnp.abs(oi - img) > 1e-6, axis=(1, 2, 3, 4))
    # union of all per-sample probabilities is ~0.93 (mirror alone is .875)
    assert 0.7 < float(changed.mean()) <= 1.0
    # determinism: same key -> same output
    oi2, os2 = device_augment(img, seg, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(oi2))


def test_mirror_only_samples_are_exact_flips():
    """With a key where only the mirror coin fires, output must be an exact
    flip composition of the input (no interpolation damage)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((64, 6, 6, 6, 1)), jnp.float32)
    seg = jnp.zeros((64, 6, 6, 6), jnp.int32)
    oi, _ = device_augment(img, seg, jax.random.key(5))
    flips = []
    for b in range(img.shape[0]):
        x = np.asarray(img[b])
        y = np.asarray(oi[b])
        for axes in [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2)]:
            if np.array_equal(np.flip(x, axes) if axes else x, y):
                flips.append(axes)
                break
    # a decent share of samples get ONLY mirror applied (p_no_other ~ .4)
    assert len(flips) >= 10


def test_train_step_with_device_augment_descends():
    from flax import linen as nn

    from segmamba_tpu.models.layers import Conv3d
    from segmamba_tpu.train.train_state import create_train_state, train_step

    class Mini(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Conv3d(3, 3, 1, 1, name="c")(x)

    model = Mini()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 8, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, (4, 8, 8, 8)))
    state = create_train_state(model, jax.random.key(0), x[:1],
                               learning_rate=1e-2)
    key = jax.random.key(1)
    losses = []
    for i in range(4):
        state, m = train_step(state, {"image": x, "label": y}, num_classes=3,
                              augment_key=jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()


def test_trainer_device_augment_mode():
    """Trainer(augmentation='device'): loader passes raw patches through and
    the step consumes them (smoke, 2 steps)."""
    from segmamba_tpu.train.trainer import _pick_transform

    assert _pick_transform("device") is None


def test_prefetch_yields_device_arrays_and_propagates_errors():
    from segmamba_tpu.train.trainer import _prefetch

    batches = [{"image": np.ones((2, 4)), "label": np.zeros((2,)),
                "name": ["a", "b"]} for _ in range(3)]
    out = list(_prefetch(iter(batches)))
    assert len(out) == 3
    assert isinstance(out[0]["image"], jax.Array)
    assert out[0]["name"] == ["a", "b"]          # non-arrays pass through

    def bad():
        yield batches[0]
        raise RuntimeError("loader died")

    it = _prefetch(bad())
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)
