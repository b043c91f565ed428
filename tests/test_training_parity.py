"""Training-dynamics parity: torch vs flax on identical weights + batches.

The converter proves forward parity (test_torch_convert); this proves the
TRAINING trajectory matches: starting from the SAME converted weights, the
reference recipe (SGD momentum 0.99 nesterov, grad-clip 12, CE —
3_train.py:51-54, light_training/trainer.py:464) produces the same loss
curve on the same synthetic batches in both frameworks, f32. This is the
evidence that a BraTS run here reproduces the reference's optimization,
which is what the +-0.1 Dice parity budget rests on.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute XLA:CPU compiles (see conftest)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from segmamba_tpu.models import SegMamba
from segmamba_tpu.utils.torch_convert import convert_segmamba_state_dict
from tests.test_torch_convert import CFG, TSegMamba

LR, MOM, CLIP = 1e-2, 0.99, 12.0
N_STEPS = 8
SHAPE = (2, 32, 32, 32)  # batch 2, 32^3 patches


def _batches(seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(N_STEPS):
        x = rng.standard_normal(SHAPE + (CFG["in_chans"],)).astype(
            np.float32)
        y = rng.integers(0, CFG["out_chans"], SHAPE).astype(np.int64)
        yield x, y


def _torch_losses(tm):
    opt = torch.optim.SGD(tm.parameters(), lr=LR, momentum=MOM,
                          nesterov=True)
    ce = torch.nn.CrossEntropyLoss()
    losses = []
    for x, y in _batches():
        opt.zero_grad()
        logits = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))
        loss = ce(logits, torch.from_numpy(y))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        opt.step()
        losses.append(float(loss))
    return losses


def _flax_losses(fm, params):
    tx = optax.chain(optax.clip_by_global_norm(CLIP),
                     optax.sgd(LR, momentum=MOM, nesterov=True))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = fm.apply(p, x)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y[..., None],
                                                 axis=-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for x, y in _batches():
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x),
                                       jnp.asarray(y, jnp.int32))
        losses.append(float(loss))
    return losses


def test_sgd_loss_trajectory_matches_torch():
    torch.manual_seed(0)
    tm = TSegMamba(CFG["in_chans"], CFG["out_chans"], CFG["depths"],
                   CFG["feat_size"], CFG["hidden_size"],
                   CFG["num_slices_list"]).train()
    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert_segmamba_state_dict(tm.state_dict(), depths=CFG["depths"]))
    fm = SegMamba(scan_impl="ref", **CFG)

    lt = _torch_losses(tm)
    lf = _flax_losses(fm, params)
    # identical weights + batches + recipe: trajectories track within small
    # f32 drift that compounds per step
    np.testing.assert_allclose(lf, lt, rtol=3e-2, atol=3e-3)
    assert lt[-1] < lt[0] and lf[-1] < lf[0]  # both actually learn
