"""Pipeline parallelism (parallel/pp.py): GPipe schedule over a "pipe" mesh
axis must reproduce the sequential MambaLMHeadModel exactly — forward logits
and parameter gradients — on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

from segmamba_tpu.models.mamba_lm import MambaLMHeadModel
from segmamba_tpu.parallel.mesh import make_mesh
from segmamba_tpu.parallel.pp import pipeline_lm_logits, stack_block_params


def _model_and_data(n_layer=4, rms_norm=False, batch=8, seqlen=12,
                    vocab=50, d_model=16, seed=0):
    model = MambaLMHeadModel(vocab_size=vocab, d_model=d_model,
                             n_layer=n_layer, rms_norm=rms_norm,
                             scan_impl="ref")
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, vocab, (batch, seqlen)), jnp.int32)
    variables = model.init(jax.random.key(seed), ids)
    return model, variables, ids


def test_stack_block_params_shape():
    model, variables, _ = _model_and_data(n_layer=4)
    stacked = stack_block_params(variables["params"]["backbone"], 4)
    leaf = stacked["mixer"]["in_proj"]
    assert leaf.shape[0] == 4


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 8), (4, 2)])
def test_pipeline_forward_matches_sequential(n_stages, n_micro):
    model, variables, ids = _model_and_data(n_layer=4)
    mesh = make_mesh(n_stages, ("pipe",))
    ref = model.apply(variables, ids)
    out = pipeline_lm_logits(model, variables, ids, mesh,
                             n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_forward_rms_norm():
    model, variables, ids = _model_and_data(n_layer=2, rms_norm=True)
    mesh = make_mesh(2, ("pipe",))
    ref = model.apply(variables, ids)
    out = pipeline_lm_logits(model, variables, ids, mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match_sequential():
    model, variables, ids = _model_and_data(n_layer=4, batch=4, seqlen=8)
    mesh = make_mesh(4, ("pipe",))

    def loss_ref(v):
        lg = model.apply(v, ids)
        return jnp.mean(jax.nn.log_softmax(lg)[..., 0] ** 2)

    def loss_pp(v):
        lg = pipeline_lm_logits(model, v, ids, mesh, n_microbatches=4)
        return jnp.mean(jax.nn.log_softmax(lg)[..., 0] ** 2)

    g_ref = jax.grad(loss_ref)(variables)
    g_pp = jax.grad(loss_pp)(variables)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pp, treedef = jax.tree_util.tree_flatten(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_pipeline_under_jit():
    model, variables, ids = _model_and_data(n_layer=4, batch=8)
    mesh = make_mesh(4, ("pipe",))
    fn = jax.jit(lambda v, i: pipeline_lm_logits(model, v, i, mesh,
                                                 n_microbatches=4))
    out = fn(variables, ids)
    ref = model.apply(variables, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_validation_errors():
    model, variables, ids = _model_and_data(n_layer=4, batch=8)
    mesh3 = make_mesh(3, ("pipe",))
    with pytest.raises(ValueError, match="divisible"):
        pipeline_lm_logits(model, variables, ids, mesh3)
    mesh4 = make_mesh(4, ("pipe",))
    with pytest.raises(ValueError, match="divisible"):
        pipeline_lm_logits(model, variables, ids, mesh4, n_microbatches=3)


# ---------------------------------------------------------------------------
# SegMamba encoder pipeline
# ---------------------------------------------------------------------------

def _seg_model_and_data(batch=4, seed=0):
    from segmamba_tpu.models import SegMamba

    model = SegMamba(in_chans=2, out_chans=3, depths=(1, 1, 1, 1),
                     feat_size=(4, 8, 16, 32), hidden_size=64,
                     num_slices_list=(8, 4, 2, 1), scan_impl="ref")
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((batch, 16, 16, 16, 2)),
                    jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(seed), x[:1])
    return model, variables, x


def test_segmamba_encoder_pipeline_matches_sequential():
    from segmamba_tpu.models.segmamba import MambaEncoder
    from segmamba_tpu.parallel.pp import pipeline_segmamba_encoder

    model, variables, x = _seg_model_and_data()
    mesh = make_mesh(4, ("pipe",))
    enc = MambaEncoder(in_chans=model.in_chans, depths=model.depths,
                       dims=model.feat_size,
                       num_slices_list=model.num_slices_list,
                       scan_impl="ref")
    ref = enc.apply({"params": variables["params"]["vit"]}, x)
    outs = pipeline_segmamba_encoder(model, variables, x, mesh)
    assert len(outs) == 4
    for o, r in zip(outs, ref):
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_segmamba_full_pipeline_logits():
    from segmamba_tpu.parallel.pp import pipeline_segmamba_logits

    model, variables, x = _seg_model_and_data()
    mesh = make_mesh(4, ("pipe",))
    ref = model.apply(variables, x)
    out = jax.jit(lambda v, a: pipeline_segmamba_logits(model, v, a, mesh))(
        variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_segmamba_encoder_pipeline_grads():
    """Pipeline transpose correctness: encoder-only grads vs sequential
    (the decoder is a plain replicated apply; grad-of-full-model compiles
    for >10 min on a 1-core CPU host, so the pipelined region is what the
    grad test covers)."""
    from segmamba_tpu.models.segmamba import MambaEncoder
    from segmamba_tpu.parallel.pp import pipeline_segmamba_encoder

    model, variables, x = _seg_model_and_data(batch=4)
    mesh = make_mesh(4, ("pipe",))
    enc = MambaEncoder(in_chans=model.in_chans, depths=model.depths,
                       dims=model.feat_size,
                       num_slices_list=model.num_slices_list,
                       scan_impl="ref")

    def loss_pp(v):
        outs = pipeline_segmamba_encoder(model, v, x, mesh)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    def loss_ref(v):
        outs = enc.apply({"params": v["params"]["vit"]}, x)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    g_pp = jax.grad(loss_pp)(variables)["params"]["vit"]
    g_ref = jax.grad(loss_ref)(variables)["params"]["vit"]
    flat_pp, _ = jax.tree_util.tree_flatten_with_path(g_pp)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    assert len(flat_pp) == len(flat_ref)
    for (kp, a), (_, b) in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(kp))


def test_segmamba_encoder_pipeline_microbatch_2():
    from segmamba_tpu.models.segmamba import MambaEncoder
    from segmamba_tpu.parallel.pp import pipeline_segmamba_encoder

    model, variables, x = _seg_model_and_data(batch=4)
    mesh = make_mesh(4, ("pipe",))
    enc = MambaEncoder(in_chans=model.in_chans, depths=model.depths,
                       dims=model.feat_size,
                       num_slices_list=model.num_slices_list,
                       scan_impl="ref")
    ref = enc.apply({"params": variables["params"]["vit"]}, x)
    outs = pipeline_segmamba_encoder(model, variables, x, mesh,
                                     n_microbatches=2)
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# pipelined train step (PP and DP x PP)
# ---------------------------------------------------------------------------

def _labels(batch=4, seed=5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 3, (batch, 16, 16, 16)), jnp.int32)


def test_pp_train_step_matches_sequential():
    """One pp_train_step (encoder pipelined over a 4-stage pipe mesh, loss +
    grads + optax update inside the pipelined program) produces the same
    post-step parameters as the plain train_step — the capability the
    reference lacks entirely (trainer.py:352-357 is DP-only)."""
    from segmamba_tpu.parallel.pp import pp_train_step
    from segmamba_tpu.train.train_state import create_train_state, train_step

    model, variables, x = _seg_model_and_data()
    y = _labels()
    mesh = make_mesh(4, ("pipe",))
    fresh = lambda: jax.tree_util.tree_map(jnp.array, variables)
    s_seq = create_train_state(model, jax.random.key(0), x[:1],
                               params=fresh())
    s_pp = create_train_state(model, jax.random.key(0), x[:1],
                              params=fresh())
    s_seq, m_seq = train_step(s_seq, {"image": x, "label": y}, num_classes=3)
    s_pp, m_pp = pp_train_step(s_pp, {"image": x, "label": y}, model, mesh,
                               num_classes=3, n_microbatches=4)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_seq["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-6)


def test_pp_train_step_dp_x_pp():
    """DP x PP on a (2, 4) ('data', 'pipe') mesh: batch sharded over data,
    encoder pipelined per replica, gradient mean over data by GSPMD —
    numerically equal to the single-device step on the same global batch."""
    from segmamba_tpu.parallel.pp import pp_train_step
    from segmamba_tpu.train.train_state import create_train_state, train_step

    model, variables, x = _seg_model_and_data()
    y = _labels()
    mesh = make_mesh(8, ("data", "pipe"), shape=(2, 4))
    fresh = lambda: jax.tree_util.tree_map(jnp.array, variables)
    s_seq = create_train_state(model, jax.random.key(0), x[:1],
                               params=fresh())
    s_pp = create_train_state(model, jax.random.key(0), x[:1],
                              params=fresh())
    s_seq, m_seq = train_step(s_seq, {"image": x, "label": y}, num_classes=3)
    s_pp, m_pp = pp_train_step(s_pp, {"image": x, "label": y}, model, mesh,
                               data_axis="data", num_classes=3,
                               n_microbatches=2)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_seq["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_pp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=1e-6)


def test_pipelined_encoder_rejects_bad_spatial():
    from segmamba_tpu.parallel.pp import pipeline_segmamba_encoder

    model, variables, _ = _seg_model_and_data()
    mesh = make_mesh(4, ("pipe",))
    bad = jnp.zeros((4, 24, 16, 16, 2), jnp.float32)  # 24 % 16 != 0
    with pytest.raises(ValueError, match="divisible by 16"):
        pipeline_segmamba_encoder(model, variables, bad, mesh)
