"""Model-level integration of the NV int8 bottleneck TRAINING path:
Sequential lane-protocol routing, BN state threading, and the
closeness contract vs the XLA float path (FQT is its own numerics — we
assert int8-grain distances, not equality; the kernel-level bit
contract lives in tests/test_nv_train.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.models import ResNet

# mini post-act bottleneck net: stage 1 entry transition (16->32 channels,
# XLA path) + identity block (NV path); stage 2 stride-2 transition + one
# more identity block at 4x4
SPEC = ("c3,16,3,1,1 n a b2,32,16,1 b2,64,16,2 ap4,1,0 fc64,10")


def _build(int8_train, int8_train_bwd=True, h=8):
    model = ResNet(SPEC, preact=False, use_proj=True, dropout_prob=0.0,
                   compute_dtype=jnp.bfloat16, int8_train=int8_train,
                   int8_train_bwd=int8_train_bwd)
    params, state = model.init(jax.random.key(0), (h, h, 3))
    return model, params, state


def _data(h=8, n=32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, h, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, n), jnp.int32)
    return x, y


def _loss_fn(model, state, x, y):
    def f(params):
        logits, new_state = model.apply(params, state, x, train=True,
                                        rng=jax.random.key(1))
        one = jax.nn.one_hot(y, logits.shape[-1])
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one, -1))
        return loss, (logits, new_state)
    return f


def _flat_dist(a, b):
    fa = jnp.concatenate([v.ravel().astype(jnp.float32)
                          for v in jax.tree_util.tree_leaves(a)])
    fb = jnp.concatenate([v.ravel().astype(jnp.float32)
                          for v in jax.tree_util.tree_leaves(b)])
    return float(jnp.linalg.norm(fa - fb) / (jnp.linalg.norm(fb) + 1e-12))


def test_nv_train_runs_and_tracks_float():
    x, y = _data()
    model_q, params, state = _build(True)
    model_f, _, _ = _build(False)

    (lq, (logits_q, st_q)), gq = jax.value_and_grad(
        _loss_fn(model_q, state, x, y), has_aux=True)(params)
    (lf, (logits_f, st_f)), gf = jax.value_and_grad(
        _loss_fn(model_f, state, x, y), has_aux=True)(params)

    assert np.isfinite(lq) and np.isfinite(lf)
    # int8-grain forward distance (per-chunk dynamic scales)
    rel = float(jnp.linalg.norm(logits_q - logits_f)
                / (jnp.linalg.norm(logits_f) + 1e-12))
    assert rel < 0.15, rel
    # gradients: finite and correlated with the float path
    leaves = jax.tree_util.tree_leaves(gq)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    assert _flat_dist(gq, gf) < 0.6

    # BatchNorm state advanced on the NV path for every block
    def counts(st):
        return sorted(
            (str(path), int(leaf)) for path, leaf in
            jax.tree_util.tree_leaves_with_path(st)
            if "count" in str(path))
    assert counts(st_q) == counts(st_f)
    # NV-path batch stats track the float path's (int8-grain)
    for (pq, vq), (pf, vf) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(st_q),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(st_f),
                   key=lambda kv: str(kv[0]))):
        assert str(pq) == str(pf)
        if "count" in str(pq):
            continue
        d = float(jnp.linalg.norm(vq.astype(jnp.float32) - vf.astype(
            jnp.float32)) / (jnp.linalg.norm(vf.astype(jnp.float32))
                             + 1e-6))
        assert d < 0.2, (str(pq), d)


def test_fqt_grads_near_qat_exact():
    """FQT (int8 dgrad/wgrad) grads stay int8-grain close to the exact
    straight-through (QAT) backward — the CIFAR path's acceptance
    criterion (BASELINE.md int8 training)."""
    x, y = _data()
    model_fqt, params, state = _build(True, int8_train_bwd=True)
    model_qat, _, _ = _build(True, int8_train_bwd=False)
    _, g_fqt = jax.value_and_grad(
        _loss_fn(model_fqt, state, x, y), has_aux=True)(params)
    _, g_qat = jax.value_and_grad(
        _loss_fn(model_qat, state, x, y), has_aux=True)(params)
    assert _flat_dist(g_fqt, g_qat) < 0.25


def test_eval_mode_stays_on_float_path():
    """Eval never routes through the NV kernels: identical logits with
    int8_train on and off."""
    x, _ = _data()
    model_q, params, state = _build(True)
    model_f, _, _ = _build(False)
    lq, _ = model_q.apply(params, state, x, train=False)
    lf, _ = model_f.apply(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(lf))


def test_non_pow2_batch_falls_back():
    """b=48 fails the NV eligibility gate; the model must still train
    (XLA path) and match the float model exactly."""
    x, y = _data(n=48)
    model_q, params, state = _build(True)
    model_f, _, _ = _build(False)
    (lq, (logits_q, _)), _ = jax.value_and_grad(
        _loss_fn(model_q, state, x, y), has_aux=True)(params)
    (lf, (logits_f, _)), _ = jax.value_and_grad(
        _loss_fn(model_f, state, x, y), has_aux=True)(params)
    np.testing.assert_array_equal(np.asarray(logits_q),
                                  np.asarray(logits_f))
