"""remat=True must be numerically identical to remat=False (it only changes
what the backward pass recomputes)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.algos.steps import init_train_state, make_train_step
from pytorch_ddp_resnet_tpu.models import ResNet
from pytorch_ddp_resnet_tpu.utils.optim import sgd
import pytest

SPEC = "c3,8,3,1,1 n a r1 r1 ap4,1,0 fc16,10"


@pytest.mark.slow
def test_remat_matches_baseline():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8, 8, 3)),
                    jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 10, size=(16,)),
                    jnp.int32)
    results = []
    for remat in (False, True):
        model = ResNet(SPEC, preact=True, use_proj=True, dropout_prob=0.1,
                       compute_dtype=jnp.float32, remat=remat)
        opt = sgd(momentum=0.9)
        ts = init_train_state(model, opt, jax.random.key(0), (8, 8, 3))
        step = jax.jit(make_train_step(model, opt, 1))
        ts, metrics = step(ts, x[None], y[None], jnp.float32(0.1),
                           jax.random.key(2))
        results.append((ts, metrics))
    (ts_a, m_a), (ts_b, m_b) = results
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ts_a["params"]),
                    jax.tree_util.tree_leaves(ts_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)
