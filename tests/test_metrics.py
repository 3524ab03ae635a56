"""Metric parity with the reference's torch implementations
(resnet/algos/metrics.py)."""

import numpy as np
import torch as tc

import jax.numpy as jnp

from pytorch_ddp_resnet_tpu.ops.metrics import (
    compute_losses_and_metrics,
    cross_entropy_loss,
    top_k_err,
)


def _data(n=64, classes=10, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, classes)).astype(np.float32)
    labels = rng.integers(0, classes, size=(n,)).astype(np.int64)
    return logits, labels


def test_cross_entropy_matches_torch():
    logits, labels = _data()
    ref = tc.nn.CrossEntropyLoss()(tc.tensor(logits), tc.tensor(labels))
    got = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_top_k_err_matches_torch():
    logits, labels = _data(seed=3)

    def torch_topk_err(k):
        preds = tc.topk(tc.tensor(logits), k=k, dim=-1).indices
        matches = tc.eq(preds, tc.tensor(labels).unsqueeze(-1)).float().sum(-1)
        return float(1.0 - matches.mean(0))

    for k in (1, 5):
        got = float(top_k_err(jnp.asarray(logits), jnp.asarray(labels), k=k))
        np.testing.assert_allclose(got, torch_topk_err(k), rtol=1e-6)


def test_metric_dict_names():
    logits, labels = _data()
    m = compute_losses_and_metrics(jnp.asarray(logits), jnp.asarray(labels))
    assert set(m) == {"loss", "top1_err", "top5_err"}


def test_weighted_metrics_ignore_masked():
    logits, labels = _data(n=32)
    w = np.ones((32,), np.float32)
    w[20:] = 0.0
    got = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                             weights=jnp.asarray(w))
    ref = tc.nn.CrossEntropyLoss()(tc.tensor(logits[:20]),
                                   tc.tensor(labels[:20]))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    e_full = top_k_err(jnp.asarray(logits), jnp.asarray(labels), 1,
                       weights=jnp.asarray(w))
    e_cut = top_k_err(jnp.asarray(logits[:20]), jnp.asarray(labels[:20]), 1)
    np.testing.assert_allclose(float(e_full), float(e_cut), rtol=1e-6)


def test_top_k_clamps_to_class_count():
    logits, labels = _data(classes=3)
    err = top_k_err(jnp.asarray(logits), jnp.asarray(labels), k=5)
    np.testing.assert_allclose(float(err), 0.0, atol=1e-7)  # k=3 -> all hit
