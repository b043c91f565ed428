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
