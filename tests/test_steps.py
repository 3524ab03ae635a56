"""Train/eval step tests: loss decreases, microbatch accumulation semantics,
metric exactness, bf16 path health."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.algos import steps as steps_lib
from pytorch_ddp_resnet_tpu.models import ResNet
from pytorch_ddp_resnet_tpu.ops.metrics import compute_losses_and_metrics
from pytorch_ddp_resnet_tpu.utils.optim import sgd

SPEC = "c3,8,3,1,1 n a r1 r1 ap4,1,0 fc16,4"  # tiny 2-stack resnet, 8x8 in


def _make(compute_dtype=jnp.float32, dropout=0.0):
    model = ResNet(SPEC, preact=False, use_proj=False, dropout_prob=dropout,
                   compute_dtype=compute_dtype)
    opt = sgd(momentum=0.9, weight_decay=1e-4)
    ts = steps_lib.init_train_state(model, opt, jax.random.key(0), (8, 8, 3))
    return model, opt, ts


def _data(n=32, classes=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 8, 8, 3)).astype(np.float32)
    y = rng.integers(0, classes, size=(n,)).astype(np.int32)
    # make the task learnable: shift class mean into the input
    x += y[:, None, None, None] * 0.5
    return jnp.asarray(x), jnp.asarray(y)


def test_loss_decreases():
    model, opt, ts = _make()
    step = jax.jit(steps_lib.make_train_step(model, opt, num_microbatches=1))
    x, y = _data()
    xm, ym = x[None], y[None]
    losses = []
    for i in range(30):
        ts, metrics = step(ts, xm, ym, jnp.float32(0.05), jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
    assert np.isfinite(losses).all()


def test_metrics_match_direct_computation():
    model, opt, ts = _make()
    step = jax.jit(steps_lib.make_train_step(model, opt, num_microbatches=1))
    x, y = _data()
    _, metrics = step(ts, x[None], y[None], jnp.float32(0.0), jax.random.key(0))
    logits, _ = model.apply(ts["params"], ts["model_state"], x, train=True,
                            rng=jax.random.key(0))
    # train step folds the rng; recompute with the same fold for exactness
    logits, _ = model.apply(ts["params"], ts["model_state"], x, train=True,
                            rng=jax.random.fold_in(jax.random.key(0), 1))
    direct = compute_losses_and_metrics(logits, y)
    for k in ("loss", "top1_err", "top5_err"):
        np.testing.assert_allclose(float(metrics[k]), float(direct[k]),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_microbatch_sum_matches_manual_accumulation():
    """grad_reduction='sum' reproduces the reference's repeated
    loss.backward() before one optimizer step (training.py:99-113)."""
    model, opt, ts0 = _make()
    x, y = _data(n=32)

    # M=2 microbatches in one fused step
    step2 = jax.jit(steps_lib.make_train_step(model, opt, num_microbatches=2))
    xm = x.reshape(2, 16, 8, 8, 3)
    ym = y.reshape(2, 16)
    ts_a, _ = step2(ts0, xm, ym, jnp.float32(0.1), jax.random.key(5))

    # manual: accumulate grads of each microbatch (threading BN state), then
    # one optimizer update with the summed grads
    def loss_fn(p, ms, xb, yb, r):
        logits, ms2 = model.apply(p, ms, xb, train=True,
                                  rng=jax.random.fold_in(r, 1))
        m = compute_losses_and_metrics(logits, yb)
        return m["loss"], ms2

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    ms = ts0["model_state"]
    grads_total = None
    for i in range(2):
        r = jax.random.fold_in(jax.random.key(5), i)
        (_, ms), g = grad_fn(ts0["params"], ms, xm[i], ym[i], r)
        grads_total = g if grads_total is None else jax.tree_util.tree_map(
            jnp.add, grads_total, g)
    new_params, _ = opt.update(grads_total, ts0["opt_state"], ts0["params"],
                               jnp.float32(0.1))

    flat_a = jax.tree_util.tree_leaves(ts_a["params"])
    flat_b = jax.tree_util.tree_leaves(new_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)
    # BN state also threads sequentially through microbatches
    flat_sa = jax.tree_util.tree_leaves(ts_a["model_state"])
    flat_sb = jax.tree_util.tree_leaves(ms)
    for a, b in zip(flat_sa, flat_sb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)


@pytest.mark.slow
def test_microbatch_mean_reduction_scales_grads():
    model, opt, ts0 = _make()
    x, y = _data(n=32)
    xm, ym = x.reshape(2, 16, 8, 8, 3), y.reshape(2, 16)
    s_sum = jax.jit(steps_lib.make_train_step(model, opt, 2, grad_reduction="sum"))
    s_mean = jax.jit(steps_lib.make_train_step(model, opt, 2, grad_reduction="mean"))
    # With momentum-free SGD, sum-step at lr == mean-step at 2*lr.
    model2, opt2, _ = _make()
    from pytorch_ddp_resnet_tpu.utils.optim import sgd as sgd_fn
    opt_plain = sgd_fn()
    ts = dict(ts0, opt_state=opt_plain.init(ts0["params"]))
    s_sum = jax.jit(steps_lib.make_train_step(model, opt_plain, 2, grad_reduction="sum"))
    s_mean = jax.jit(steps_lib.make_train_step(model, opt_plain, 2, grad_reduction="mean"))
    a, _ = s_sum(ts, xm, ym, jnp.float32(0.05), jax.random.key(1))
    b, _ = s_mean(ts, xm, ym, jnp.float32(0.10), jax.random.key(1))
    for pa, pb in zip(jax.tree_util.tree_leaves(a["params"]),
                      jax.tree_util.tree_leaves(b["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_bf16_compute_path_trains():
    model, opt, ts = _make(compute_dtype=jnp.bfloat16, dropout=0.1)
    step = jax.jit(steps_lib.make_train_step(model, opt, num_microbatches=1))
    x, y = _data()
    losses = []
    for i in range(20):
        ts, metrics = step(ts, x[None], y[None], jnp.float32(0.05),
                           jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params remain fp32 master copies
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(ts["params"]))


def test_augment_fn_is_applied():
    model, opt, ts = _make()
    marker = {"called": False}

    def augment(x, rng):
        marker["called"] = True  # traced once at jit time
        return x * 0.0  # zero inputs -> logits independent of x

    step = jax.jit(steps_lib.make_train_step(model, opt, 1, augment_fn=augment))
    x, y = _data()
    _, m1 = step(ts, x[None], y[None], jnp.float32(0.0), jax.random.key(0))
    _, m2 = step(ts, (x * 5)[None], y[None], jnp.float32(0.0), jax.random.key(0))
    assert marker["called"]
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_eval_step_exact_weighted_metrics():
    model, opt, ts = _make()
    eval_step = jax.jit(steps_lib.make_eval_step(model))
    x, y = _data(n=24)
    # pad to 32 with garbage; mask marks the valid 24
    xp = jnp.concatenate([x, jnp.full((8, 8, 8, 3), 1e3)], axis=0)
    yp = jnp.concatenate([y, jnp.zeros((8,), jnp.int32)], axis=0)
    mask = jnp.concatenate([jnp.ones((24,)), jnp.zeros((8,))])
    sums = eval_step(ts["params"], ts["model_state"], xp, yp, mask)
    metrics = steps_lib.finalize_eval_metrics(sums)
    # reference computation on the unpadded data
    logits, _ = model.apply(ts["params"], ts["model_state"], x, train=False)
    direct = compute_losses_and_metrics(logits, y)
    np.testing.assert_allclose(metrics["loss"], float(direct["loss"]), rtol=1e-5)
    np.testing.assert_allclose(metrics["top1_err"], float(direct["top1_err"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(metrics["top5_err"], float(direct["top5_err"]),
                               rtol=1e-5, atol=1e-6)
    # padded-in garbage must not leak: flipping pad contents changes nothing
    xp2 = xp.at[30].set(-1e3)
    sums2 = eval_step(ts["params"], ts["model_state"], xp2, yp, mask)
    np.testing.assert_allclose(float(sums2["loss_sum"]), float(sums["loss_sum"]),
                               rtol=1e-6)


def test_eval_deterministic():
    model, opt, ts = _make()
    eval_step = jax.jit(steps_lib.make_eval_step(model))
    x, y = _data()
    mask = jnp.ones((32,))
    a = eval_step(ts["params"], ts["model_state"], x, y, mask)
    b = eval_step(ts["params"], ts["model_state"], x, y, mask)
    for k in a:
        assert float(a[k]) == float(b[k])  # bitwise-deterministic


@pytest.mark.slow
def test_train_step_differentiates_through_maxpool():
    """Regression: reduce_window-max AD requires a scalar init value; specs
    with 'mp' components (the ImageNet stem) must train."""
    model = ResNet("c3,8,7,2,3 n a mp3,2,1 b1 ap16,1,0 fc8,10",
                   preact=False, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.float32)
    from pytorch_ddp_resnet_tpu.utils.optim import sgd as sgd_fn
    opt = sgd_fn(momentum=0.9)
    ts = steps_lib.init_train_state(model, opt, jax.random.key(0), (64, 64, 3))
    step = jax.jit(steps_lib.make_train_step(model, opt, 1))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 64, 64, 3)),
                    jnp.float32)
    y = jnp.zeros((1, 4), jnp.int32)
    ts, m = step(ts, x, y, jnp.float32(0.1), jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_steps_per_dispatch_is_equivalent():
    """A training_loop run with steps_per_dispatch=4 must match the unchunked
    run: identical per-step rng/lr derivations inside the scanned dispatch.
    Equality is near-bitwise — XLA may reassociate fusions differently inside
    a scan body, so exact bit equality is not guaranteed."""
    import os
    import tempfile

    import numpy as np

    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
    from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh

    base = {
        "dataset_cls_name": "Synthetic",
        "data_aug_train": {"ToTensorTransform": {},
                           "FlipTransform": {"p": 0.5}},
        "data_aug_test": {"ToTensorTransform": {}},
        "architecture_spec": "c3,8,3,1,1 n a r1 ap32,1,0 fc8,10",
        "preact": False, "use_proj": False, "dropout_prob": 0.1,
        "compute_dtype": "float32",
        "max_steps": 10, "batch_size": 16, "num_microbatches": 1,
        "optimizer_cls_name": "SGD",
        "optimizer_args": {"lr": 0.1, "momentum": 0.9},
        "scheduler_cls_name": "MultiStepLR",
        "scheduler_step_unit": "batch",
        "scheduler_args": {"milestones": [6], "gamma": 0.1},
        "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
        "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
    }

    def run(chunk):
        with tempfile.TemporaryDirectory() as tmp:
            cfg = dict(base)
            cfg["checkpoint_dir"] = os.path.join(tmp, "ck")
            cfg["log_dir"] = os.path.join(tmp, "tb")
            cfg["data_dir"] = tmp
            cfg["steps_per_dispatch"] = chunk
            ls = setup(cfg, mesh=make_mesh(num_devices=2), verbose=False)
            out = training_loop(cfg, ls, verbose=False)
            assert out["global_step"] == 10
            return jax.device_get(ls["train_state"]["params"])

    p1, p4 = run(1), run(4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6),
        p1, p4)


def test_steps_per_dispatch_auto():
    """`steps_per_dispatch: auto` probes dispatch RTT, picks a valid K, and
    the training loop runs with it (ROADMAP #3: auto-K removes per-host
    hand tuning between PCIe-attached and tunneled TPU hosts)."""
    import os
    import tempfile

    from pytorch_ddp_resnet_tpu.algos.train import (
        _auto_steps_per_dispatch, setup, training_loop)
    from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh

    k = _auto_steps_per_dispatch(verbose=False)
    assert k in (1, 4, 8, 16)

    cfg = {
        "dataset_cls_name": "Synthetic",
        "data_aug_train": {"ToTensorTransform": {}},
        "data_aug_test": {"ToTensorTransform": {}},
        "architecture_spec": "c3,8,3,1,1 n a r1 ap32,1,0 fc8,10",
        "preact": False, "use_proj": False, "dropout_prob": 0.0,
        "compute_dtype": "float32",
        "max_steps": 6, "batch_size": 16, "num_microbatches": 1,
        "optimizer_cls_name": "SGD",
        "optimizer_args": {"lr": 0.1, "momentum": 0.9},
        "scheduler_cls_name": "MultiStepLR",
        "scheduler_step_unit": "batch",
        "scheduler_args": {"milestones": [4], "gamma": 0.1},
        "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
        "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
        "steps_per_dispatch": "auto",
    }
    with tempfile.TemporaryDirectory() as tmp:
        cfg["checkpoint_dir"] = os.path.join(tmp, "ck")
        cfg["log_dir"] = os.path.join(tmp, "tb")
        cfg["data_dir"] = tmp
        ls = setup(cfg, mesh=make_mesh(num_devices=2), verbose=False)
        out = training_loop(cfg, ls, verbose=False)
        assert out["global_step"] == 6
