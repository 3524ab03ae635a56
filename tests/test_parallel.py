"""Data-parallel SPMD tests on the 8-virtual-device CPU mesh: sharded steps
must be numerically equivalent to single-device execution (the JAX analog of
the reference's gloo world_size=2 CPU testing, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_ddp_resnet_tpu.algos.steps import init_train_state, make_train_step, make_eval_step
from pytorch_ddp_resnet_tpu.models import ResNet
from pytorch_ddp_resnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from pytorch_ddp_resnet_tpu.utils.optim import sgd

SPEC = "c3,8,3,1,1 n a r1 r1 ap4,1,0 fc16,10"


def _system(compute_dtype=jnp.float32):
    model = ResNet(SPEC, preact=True, use_proj=True, dropout_prob=0.0,
                   compute_dtype=compute_dtype)
    opt = sgd(momentum=0.9, weight_decay=1e-4)
    ts = init_train_state(model, opt, jax.random.key(0), (8, 8, 3))
    return model, opt, ts


def _batch(n=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 8, 8, 3)).astype(np.float32)
    y = rng.integers(0, 10, size=(n,)).astype(np.int32)
    return x, y


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    model, opt, ts = _system()
    step = make_train_step(model, opt, num_microbatches=1)
    x, y = _batch()

    # single device (first of the 8)
    ts1, m1 = jax.jit(step)(ts, jnp.asarray(x)[None], jnp.asarray(y)[None],
                            jnp.float32(0.1), jax.random.key(1))

    # 8-way sharded
    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    data = NamedSharding(mesh, P(None, "data"))
    ts_sharded = jax.device_put(ts, rep)
    xs = jax.device_put(x[None], data)
    ys = jax.device_put(y[None], data)
    ts8, m8 = jax.jit(step)(ts_sharded, xs, ys, jnp.float32(0.1),
                            jax.random.key(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts1["params"]),
                    jax.tree_util.tree_leaves(ts8["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # BatchNorm saw *global* batch stats in both cases (sync BN under GSPMD)
    for a, b in zip(jax.tree_util.tree_leaves(ts1["model_state"]),
                    jax.tree_util.tree_leaves(ts8["model_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_gather_train_step():
    """The resident-pipeline pattern: replicated dataset + sharded index
    gather inside jit."""
    model, opt, ts = _system()
    base = make_train_step(model, opt, num_microbatches=2)

    def resident(ts, dx, dy, idx, lr, rng):
        return base(ts, dx[idx], dy[idx], lr, rng)

    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    x, y = _batch(n=256)
    dx = jax.device_put(jnp.asarray((x * 20 + 128).clip(0, 255).astype(np.uint8)), rep)
    dy = jax.device_put(jnp.asarray(y), rep)
    ts = jax.device_put(ts, rep)
    idx = jax.device_put(
        np.arange(64, dtype=np.int32).reshape(2, 32),
        NamedSharding(mesh, P(None, "data")))
    step = jax.jit(resident, donate_argnums=0)
    ts2, metrics = step(ts, dx, dy, idx, jnp.float32(0.1), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_eval_matches_single_device():
    model, opt, ts = _system()
    eval_step = make_eval_step(model)
    x, y = _batch(n=64, seed=3)
    mask = np.ones((64,), np.float32)
    mask[-10:] = 0.0

    s1 = jax.jit(eval_step)(ts["params"], ts["model_state"],
                            jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))

    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    s8 = jax.jit(eval_step)(
        jax.device_put(ts["params"], rep),
        jax.device_put(ts["model_state"], rep),
        jax.device_put(x, bsh), jax.device_put(y, bsh),
        jax.device_put(mask, bsh))
    for k in s1:
        np.testing.assert_allclose(float(s1[k]), float(s8[k]), rtol=1e-5)


def test_uneven_batch_rejected_cleanly():
    """Batch not divisible by mesh size: sharding should still work via XLA
    padding or raise a clear error — assert it does not silently corrupt."""
    mesh = make_mesh()
    x = np.ones((30, 4), np.float32)  # 30 % 8 != 0
    try:
        xs = jax.device_put(x, batch_sharding(mesh))
        s = jnp.sum(xs)
        np.testing.assert_allclose(float(s), 30 * 4)
    except ValueError:
        pass  # an explicit error is also acceptable


def test_put_global_matches_device_put_single_process():
    import numpy as np

    from pytorch_ddp_resnet_tpu.parallel.mesh import (
        batch_sharding, make_mesh, put_global, put_replicated,
        replicated_sharding)

    mesh = make_mesh(num_devices=4)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    a = put_global(x, batch_sharding(mesh))
    assert a.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(a), x)
    tree = put_replicated({"w": x}, mesh)
    assert tree["w"].sharding == replicated_sharding(mesh)


def test_process_local_extent_single_process_covers_all():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_ddp_resnet_tpu.parallel.mesh import (
        make_mesh, process_local_extent)

    mesh = make_mesh(num_devices=4)
    lo, hi = process_local_extent(
        NamedSharding(mesh, P("data")), (16, 3), axis=0)
    assert (lo, hi) == (0, 16)
    # axis 1 sharded on the microbatch layout
    lo, hi = process_local_extent(
        NamedSharding(mesh, P(None, "data")), (2, 8, 5), axis=1)
    assert (lo, hi) == (0, 8)


@pytest.mark.slow
def test_sharded_fused_block_matches_single_device():
    """The fused block-half path (interpret-mode Pallas on CPU) under the
    8-device mesh must reproduce the single-device result — sync-BN batch
    stats ride the kernels' epilogue sums, which must reduce globally."""
    spec = "c3,16,3,1,1 r1 ap8,1,0 fc16,10"
    model = ResNet(spec, preact=True, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.float32, fused_block=True)
    opt = sgd(momentum=0.9, weight_decay=1e-4)
    ts = init_train_state(model, opt, jax.random.key(0), (8, 8, 3))
    step = make_train_step(model, opt, num_microbatches=1)
    x, y = _batch()

    ts1, m1 = jax.jit(step)(ts, jnp.asarray(x)[None], jnp.asarray(y)[None],
                            jnp.float32(0.1), jax.random.key(1))

    mesh = make_mesh()
    rep = replicated_sharding(mesh)
    data = NamedSharding(mesh, P(None, "data"))
    ts8, m8 = jax.jit(step)(
        jax.device_put(ts, rep), jax.device_put(x[None], data),
        jax.device_put(y[None], data), jnp.float32(0.1), jax.random.key(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ts1),
                    jax.tree_util.tree_leaves(ts8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def _grad_and_state(model, params, state, x, y):
    def loss(p):
        logits, ns = model.apply(p, state, x, train=True,
                                 rng=jax.random.key(1))
        oh = jax.nn.one_hot(y, 10)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits) * oh, -1)), ns
    (l, ns), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(params)
    return float(l), g, ns


@pytest.mark.slow
def test_shard_mesh_fused_block_matches_single_device():
    """With `shard_mesh` threaded (pod mode), the bf16 fused path runs
    per-shard kernels under shard_map with psum'd sync-BN sums — and must
    match the single-device result near-exactly (f32 reduction-order
    noise only), INCLUDING the backward through the psum."""
    spec = "c3,32,3,1,1 r2 n a ap8,1,0 fc32,10"
    kw = dict(preact=True, use_proj=False, dropout_prob=0.0,
              compute_dtype=jnp.float32, fused_block=True)
    mesh = make_mesh()
    m1 = ResNet(spec, **kw)
    m8 = ResNet(spec, shard_mesh=mesh, **kw)
    params, state = m1.init(jax.random.PRNGKey(0), (8, 8, 3))
    x, y = _batch(16, seed=3)
    l1, g1, ns1 = _grad_and_state(m1, params, state, jnp.asarray(x),
                                  jnp.asarray(y))
    pd = jax.device_put(params, replicated_sharding(mesh))
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    l8, g8, ns8 = _grad_and_state(m8, pd, state, xd, jnp.asarray(y))
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g8),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ns8),
                    jax.tree_util.tree_leaves(ns1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_shard_mesh_int8_fqt_close_to_single_device():
    """The int8 FQT path under shard_mesh: per-TILE activation/gradient
    scales see a different tile decomposition per shard, so outputs and
    gradients are int8-grain CLOSE (not equal) to single-device — the
    full update direction must agree within a few percent, and BN EMA
    state must track."""
    spec = "c3,32,3,1,1 r2 n a ap8,1,0 fc32,10"
    kw = dict(preact=True, use_proj=False, dropout_prob=0.0,
              compute_dtype=jnp.float32, int8_train=True,
              int8_train_bwd=True)
    mesh = make_mesh()
    m1 = ResNet(spec, **kw)
    m8 = ResNet(spec, shard_mesh=mesh, **kw)
    params, state = m1.init(jax.random.PRNGKey(0), (8, 8, 3))
    x, y = _batch(16, seed=4)
    l1, g1, ns1 = _grad_and_state(m1, params, state, jnp.asarray(x),
                                  jnp.asarray(y))
    pd = jax.device_put(params, replicated_sharding(mesh))
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    l8, g8, ns8 = _grad_and_state(m8, pd, state, xd, jnp.asarray(y))
    assert abs(l1 - l8) < 0.02
    leaves1 = jax.tree_util.tree_leaves(g1)
    leaves8 = jax.tree_util.tree_leaves(g8)
    glob = np.sqrt(sum(float(np.square(np.asarray(b, np.float32)).sum())
                       for b in leaves1))
    dglob = np.sqrt(sum(
        float(np.square(np.asarray(a, np.float32)
                        - np.asarray(b, np.float32)).sum())
        for a, b in zip(leaves8, leaves1)))
    assert dglob / glob < 0.1, dglob / glob
    assert all(bool(jnp.isfinite(a).all())
               for a in leaves8)
    for a, b in zip(jax.tree_util.tree_leaves(ns8),
                    jax.tree_util.tree_leaves(ns1)):
        assert np.abs(np.asarray(a, np.float32)
                      - np.asarray(b, np.float32)).max() < 0.05
