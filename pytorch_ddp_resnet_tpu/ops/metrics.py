"""Losses and classification metrics.

Semantics match the reference (resnet/algos/metrics.py):

- ``cross_entropy_loss``: mean softmax cross-entropy over the batch
  (metrics.py:10-11, torch CrossEntropyLoss default reduction='mean');
- ``top_k_err``: 1 - mean(any of the top-k predictions equals the label)
  (metrics.py:14-18), always reported for k=1 and k=5 (metrics.py:21-29).

Unlike the reference, metrics are pure jnp functions computed *inside* the
jitted step; the cross-rank mean that ``global_means`` performed with an
explicit all_reduce per microbatch (metrics.py:32-41) happens implicitly
because these reductions run over globally-sharded arrays under GSPMD.

Weighted variants support exact (sample-count-correct) evaluation, fixing the
reference's approximate mean-of-padded-batch-means eval (SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(logits, labels, weights: Optional[jnp.ndarray] = None):
    """Mean softmax cross-entropy; logits (B, C) float, labels (B,) int.

    The optimization barrier pins ONE materialization of the logits for
    both the logsumexp and the label pick. Without it, XLA:TPU duplicates
    the producing matmul into two fusions whose different accumulation
    orders can disagree by ~1e-3 at logit magnitude ~20, making the
    mathematically-nonnegative nll come out slightly negative for
    saturated models (observed -6e-3..0 on v5e; 28/64 steps negative on a
    converged ResNet-20, 0/64 with the barrier). Semantically the barrier
    is the identity, including under AD; cost is nil (logits are (B, C)).
    """
    logits = jax.lax.optimization_barrier(logits.astype(jnp.float32))
    logz = jax.scipy.special.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    nll = logz - ll
    if weights is None:
        return jnp.mean(nll)
    return jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def top_k_err(logits, labels, k: int, weights: Optional[jnp.ndarray] = None):
    """1 - top-k accuracy, matching torch.topk-based matching (metrics.py:14-18).

    k is clamped to the class count (the reference's unconditional top-5
    would raise on <5-class datasets)."""
    logits = logits.astype(jnp.float32)
    _, topk_idx = jax.lax.top_k(logits, min(k, logits.shape[-1]))
    matches = jnp.sum(topk_idx == labels[:, None], axis=-1).astype(jnp.float32)
    if weights is None:
        acc = jnp.mean(matches)
    else:
        acc = jnp.sum(matches * weights) / jnp.maximum(jnp.sum(weights), 1.0)
    return 1.0 - acc


def compute_losses_and_metrics(
    logits, labels, weights: Optional[jnp.ndarray] = None
) -> Dict[str, jnp.ndarray]:
    """The reference's standard metric dict (metrics.py:21-29)."""
    return {
        "loss": cross_entropy_loss(logits, labels, weights),
        "top1_err": top_k_err(logits, labels, k=1, weights=weights),
        "top5_err": top_k_err(logits, labels, k=5, weights=weights),
    }
