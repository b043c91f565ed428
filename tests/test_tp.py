"""Tensor parallelism (channel sharding of the Mamba inner op).

Verifies parallel/tp.py + MambaV3(model_axis=...): sharded forward and a
full sharded train step must match the unsharded computation, and the
parameter shardings must actually split d_inner over the model axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)
from jax.sharding import PartitionSpec as P

from segmamba_tpu.models import SegMamba
from segmamba_tpu.models.mamba import MambaV3
from segmamba_tpu.parallel import make_mesh, tp_shard, tp_specs


@pytest.fixture(scope="module")
def tp_mesh():
    return make_mesh(8, axis_names=("model",))


def _mamba(mesh=None, **kw):
    return MambaV3(d_model=32, d_state=8, nslices=4, scan_impl="chunked",
                   mesh=mesh, model_axis="model" if mesh is not None else
                   None, **kw)


def test_tp_specs_shard_inner_dim():
    m = _mamba()
    x = jnp.zeros((1, 16, 32), jnp.float32)
    params = m.init(jax.random.key(0), x)
    specs = tp_specs(params)
    flat = {jax.tree_util.keystr(p): s for p, s in
            jax.tree_util.tree_flatten_with_path(specs)[0]}
    get = lambda name: next(v for k, v in flat.items() if k.endswith(name))
    assert get("in_proj']") == P(None, "model")
    assert get("out_proj']") == P("model", None)
    assert get("x_proj_b']") == P("model", None)
    assert get("dt_proj_s']") == P(None, "model")
    assert get("dt_proj_bias']") == P("model")
    assert get("conv1d_weight']") == P(None, "model")
    assert get("A_s_log']") == P("model", None)
    assert get("D_b']") == P("model")


def test_tp_forward_matches_unsharded(tp_mesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 32)), jnp.float32)
    ref_model = _mamba()
    params = ref_model.init(jax.random.key(1), x)
    want = ref_model.apply(params, x)

    tp_model = _mamba(mesh=tp_mesh)
    tp_params = tp_shard(params, tp_mesh)
    # d_inner = 64 split 8 ways
    conv_w = tp_params["params"]["conv1d_weight"]
    assert conv_w.sharding.spec == P(None, "model")
    got = jax.jit(tp_model.apply)(tp_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tp_segmamba_train_step_matches(tp_mesh):
    """Full SegMamba train step with TP-sharded state == unsharded step."""
    from segmamba_tpu.train.train_state import create_train_state, train_step

    model_kw = dict(in_chans=2, out_chans=3, depths=(1, 1, 1, 1),
                    feat_size=(8, 16, 32, 64), hidden_size=64,
                    num_slices_list=(8, 4, 2, 1), scan_impl="chunked")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 2)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, (2, 16, 16, 16)), jnp.int32)

    ref = SegMamba(**model_kw)
    ref_state = create_train_state(ref, jax.random.key(0), x[:1])
    ref_state, ref_metrics = train_step(ref_state, {"image": x, "label": y},
                                        num_classes=3)

    tp = SegMamba(**model_kw, mesh=tp_mesh, model_axis="model")
    tp_state = create_train_state(tp, jax.random.key(0), x[:1],
                                  mesh=tp_mesh, model_axis="model")
    tp_state, tp_metrics = train_step(tp_state, {"image": x, "label": y},
                                      num_classes=3)
    assert float(tp_metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-5)
    # updated params still match (same trajectory under sharding)
    ref_w = np.asarray(jax.tree_util.tree_leaves(ref_state.params)[0])
    tp_w = np.asarray(jax.tree_util.tree_leaves(tp_state.params)[0])
    np.testing.assert_allclose(tp_w, ref_w, rtol=2e-5, atol=2e-5)
