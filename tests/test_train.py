"""Losses, schedules, and the sharded train step (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

from segmamba_tpu.models import SegMamba
from segmamba_tpu.parallel import make_mesh
from segmamba_tpu.train import (
    create_train_state,
    cross_entropy_loss,
    dice_and_ce_loss,
    poly_schedule,
    soft_dice_loss,
    train_step,
)
from segmamba_tpu.train.losses import deep_supervision_loss, topk_loss
from segmamba_tpu.train.lr_schedules import (
    cosine_with_warmup_schedule,
    linear_warmup_cosine_annealing,
)


def test_cross_entropy_matches_manual():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 4, 4, 4, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, (2, 4, 4, 4)))
    got = cross_entropy_loss(logits, labels)
    p = jax.nn.log_softmax(logits, axis=-1)
    want = -jnp.mean(jnp.take_along_axis(p, labels[..., None], axis=-1))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_cross_entropy_ignore_index():
    logits = jnp.zeros((1, 2, 2, 2, 3))
    labels = jnp.full((1, 2, 2, 2), -1)
    labels = labels.at[0, 0, 0, 0].set(1)
    # only one valid voxel with uniform logits -> loss = log(3)
    np.testing.assert_allclose(float(cross_entropy_loss(logits, labels)),
                               np.log(3), rtol=1e-5)


def test_soft_dice_perfect_prediction():
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 3, (2, 6, 6, 6)))
    logits = jax.nn.one_hot(labels, 3) * 20.0  # near-delta softmax
    loss = soft_dice_loss(logits, labels)
    assert float(loss) < 1e-3
    # wrong prediction ~ 1
    wrong = jax.nn.one_hot((labels + 1) % 3, 3) * 20.0
    assert float(soft_dice_loss(wrong, labels)) > 0.95


def test_compound_and_topk_and_ds():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, (1, 4, 4, 4)))
    c = dice_and_ce_loss(logits, labels)
    assert np.isfinite(float(c))
    t = topk_loss(logits, labels, k_percent=50)
    assert float(t) >= float(cross_entropy_loss(logits, labels)) - 1e-6
    ds = deep_supervision_loss(cross_entropy_loss, [logits, logits],
                               [labels, labels])
    np.testing.assert_allclose(float(ds), float(cross_entropy_loss(logits, labels)),
                               rtol=1e-6)


def test_schedules():
    s = poly_schedule(1e-2, 1000)
    assert float(s(0)) == pytest.approx(1e-2)
    assert float(s(1000)) == pytest.approx(0.0)
    # nnU-Net poly at half: (0.5)^0.9
    assert float(s(500)) == pytest.approx(1e-2 * 0.5 ** 0.9, rel=1e-5)
    c = cosine_with_warmup_schedule(1e-3, 100, 10)
    assert float(c(5)) == pytest.approx(5e-4)
    assert float(c(100)) == pytest.approx(0.0, abs=1e-9)
    l = linear_warmup_cosine_annealing(1e-3, 100, 10, warmup_start_lr=1e-5)
    assert float(l(0)) == pytest.approx(1e-5)
    assert float(l(100)) == pytest.approx(0.0, abs=1e-9)


@pytest.fixture(scope="module")
def tiny_setup():
    from flax import linen as nn
    from segmamba_tpu.models import MambaLayer
    from segmamba_tpu.models.layers import Conv3d

    class Mini(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = Conv3d(8, 3, 1, 1, name="stem")(x)
            h = MambaLayer(dim=8, num_slices=4, scan_impl="ref",
                           name="mamba")(h)
            return Conv3d(3, 1, 1, 0, name="head")(h)

    model = Mini()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 8, 8, 8, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, (8, 8, 8, 8)))
    return model, x, y


def test_train_step_runs_and_descends(tiny_setup):
    model, x, y = tiny_setup
    state = create_train_state(model, jax.random.key(0), x[:1],
                               learning_rate=1e-2)
    losses = []
    for _ in range(3):
        state, m = train_step(state, {"image": x, "label": y}, num_classes=3)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # tiny model should overfit quickly
    assert int(state.step) == 3


@pytest.mark.smoke
def test_train_step_sharded_matches_single(tiny_setup):
    """DP over the 8-device CPU mesh must be numerically equivalent to
    single-device execution (same global batch)."""
    model, x, y = tiny_setup
    mesh = make_mesh(8)
    s0 = create_train_state(model, jax.random.key(0), x[:1], 1e-2)
    s1 = create_train_state(model, jax.random.key(0), x[:1], 1e-2, mesh=mesh)
    s0, m0 = train_step(s0, {"image": x, "label": y}, num_classes=3)
    s1, m1 = train_step(s1, {"image": x, "label": y}, mesh=mesh, num_classes=3)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    l0 = jax.tree_util.tree_leaves(s0.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_dryrun_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_multihost_helpers_single_host():
    """Single-host behavior of the multihost helpers (pods need real
    processes; here process_count==1 so make_global_batch is local)."""
    from segmamba_tpu.parallel.multihost import (
        global_data_mesh,
        is_main_process,
        make_global_batch,
    )
    assert is_main_process()
    mesh = global_data_mesh()
    assert mesh.devices.size == 8  # virtual CPU devices from conftest
    batch = {"image": np.ones((8, 4, 4, 4, 2), np.float32),
             "label": np.zeros((8, 4, 4, 4), np.int32)}
    g = make_global_batch(batch, mesh)
    assert g["image"].shape == (8, 4, 4, 4, 2)
    # sharded over the data axis
    assert len(g["image"].sharding.device_set) == 8


def test_trainer_validation_jit_cached():
    """validation_step must reuse one compiled forward (no per-call jit)."""
    from flax import linen as nn
    from segmamba_tpu.train.trainer import Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x.reshape(x.shape[0], -1)).reshape(
                x.shape[0], 1, 1, 1, 3) * jnp.ones((1, *x.shape[1:4], 1))

    model = M()
    t = Trainer(model, logdir="/tmp/_jit_cache_test", num_classes=3,
                num_workers=0)
    state = __import__("segmamba_tpu.train.train_state",
                       fromlist=["create_train_state"]).create_train_state(
        model, jax.random.key(0), jnp.ones((1, 2, 2, 2, 2)))
    batch = {"image": np.ones((1, 2, 2, 2, 2), np.float32),
             "label": np.zeros((1, 2, 2, 2), np.int64)}
    t.validation_step(state, batch)
    fn1 = t._jitted_apply
    t.validation_step(state, batch)
    assert t._jitted_apply is fn1  # same cached wrapper


def test_trainer_validate_fans_out_over_devices():
    """Trainer.validate must shard val batches over all 8 virtual devices
    (SequentialDistributedSampler semantics) and return metrics identical
    to — and ordered like — the sequential loop (VERDICT r2 item 6)."""
    from flax import linen as nn
    from segmamba_tpu.train.trainer import Trainer

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x.reshape(x.shape[0], -1)).reshape(
                x.shape[0], 1, 1, 1, 3) * jnp.ones((1, *x.shape[1:4], 1))

    model = M()
    t = Trainer(model, logdir="/tmp/_validate_fanout_test", num_classes=3,
                num_workers=0)
    state = create_train_state(model, jax.random.key(0),
                               jnp.ones((1, 2, 2, 2, 2)))
    rng = np.random.default_rng(0)
    batches = [{"image": rng.standard_normal((1, 2, 2, 2, 2)).astype(
                    np.float32),
                "label": rng.integers(0, 3, (1, 2, 2, 2))}
               for _ in range(11)]  # not a multiple of 8: tail shard path

    seen_devices = []
    orig_step = t.validation_step

    def spying_step(state, batch):
        seen_devices.append(jax.config.jax_default_device)
        return orig_step(state, batch)

    sequential = [orig_step(state, b) for b in batches]
    t.validation_step = spying_step
    fanned = t.validate(state, iter(batches))
    assert fanned == sequential                      # order + values
    devs = {str(d) for d in seen_devices if d is not None}
    assert len(devs) == 8                            # all devices used


def test_eval_map_assigns_contiguous_shards():
    from segmamba_tpu.parallel.eval import eval_map, sequential_shards

    shards, mask = sequential_shards(10, 4)
    assert shards == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 0, 1]]
    assert mask[3] == [True, False, False]
    by_dev = {}

    def fn(i):
        by_dev.setdefault(str(jax.config.jax_default_device), []).append(i)
        return i * i

    out = eval_map(fn, list(range(10)))
    assert out == [i * i for i in range(10)]
    # wrap-around padding indices must not be evaluated twice
    assert sorted(sum(by_dev.values(), [])) == list(range(10))


def test_dice_and_bce_loss():
    from segmamba_tpu.train.losses import dice_and_bce_loss
    rng = np.random.default_rng(9)
    labels = jnp.asarray(rng.integers(0, 2, (1, 4, 4, 4, 3)), jnp.float32)
    perfect = (labels * 2 - 1) * 20.0  # +-20 logits
    assert float(dice_and_bce_loss(perfect, labels)) < 1e-2
    wrong = -perfect
    assert float(dice_and_bce_loss(wrong, labels)) > 1.0
