"""Jitted train/eval step factories.

The reference's hot loop (training.py:92-113) is an eager per-microbatch
sequence: host->device copy, forward, backward with DDP allreduce, a metric
allreduce + host sync, then an optimizer step. Here the *entire* optimizer
step — on-device augmentation, microbatch `lax.scan` accumulation,
forward/backward, cross-chip gradient reduction, parameter update, and metric
computation — is one compiled XLA program. Under GSPMD with batch-sharded
inputs the gradient reduction rides ICI and overlaps the backward pass; no
per-step host synchronization exists at all.

Train state is a plain dict pytree:
    {"params": ..., "model_state": ..., "opt_state": ...}
(the functional analog of the reference's DDP-module + optimizer handles,
script.py:96-108).

Microbatch semantics: the step takes ``x`` of shape (M, mb, H, W, C) — M
microbatches each a *global* batch slice sharded over the data axis. The
reference accumulates each microbatch's mean-loss gradients *without*
rescaling (training.py:99-102: repeated ``loss.backward()`` before one
``optimizer.step()``), so gradients are summed over microbatches; we
reproduce that (``grad_reduction='sum'``) and offer ``'mean'`` as the
saner-for-new-users option. Metrics are averaged over microbatches, matching
``global_metrics / num_microbatches`` (training.py:115).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from pytorch_ddp_resnet_tpu.ops.metrics import (
    compute_losses_and_metrics,
    cross_entropy_loss,
    top_k_err,
)


def init_train_state(model, optimizer, rng, input_shape) -> Dict[str, Any]:
    params, model_state = model.init(rng, input_shape)
    return {
        "params": params,
        "model_state": model_state,
        "opt_state": optimizer.init(params),
    }


def make_train_step(
    model,
    optimizer,
    num_microbatches: int = 1,
    augment_fn: Optional[Callable] = None,
    grad_reduction: str = "sum",
) -> Callable:
    """Build the pure train-step function.

    augment_fn: optional jit-traceable ``(x_raw, rng) -> x_float`` applied
    per microbatch on device (the fused replacement for the reference's
    per-sample CPU transform pipeline, transform_util.py).
    """
    if grad_reduction not in ("sum", "mean"):
        raise ValueError("grad_reduction must be 'sum' or 'mean'.")

    def loss_fn(params, model_state, x, y, rng):
        if augment_fn is not None:
            x = augment_fn(x, jax.random.fold_in(rng, 0))
        logits, new_model_state = model.apply(
            params, model_state, x, train=True,
            rng=jax.random.fold_in(rng, 1))
        metrics = compute_losses_and_metrics(logits, y)
        return metrics["loss"], (metrics, new_model_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(train_state, x, y, lr, rng):
        """x: (M, mb, H, W, C); y: (M, mb); lr: scalar f32; rng: key."""
        params = train_state["params"]
        model_state = train_state["model_state"]
        opt_state = train_state["opt_state"]

        if num_microbatches == 1:
            (_, (metrics, model_state)), grads = grad_fn(
                params, model_state, x[0], y[0], rng)
        else:
            def body(carry, mb):
                grads_acc, model_state = carry
                xm, ym, i = mb
                (_, (m, model_state)), g = grad_fn(
                    params, model_state, xm, ym, jax.random.fold_in(rng, i))
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                return (grads_acc, model_state), m

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p), params)
            idx = jnp.arange(num_microbatches)
            (grads, model_state), metrics_seq = jax.lax.scan(
                body, (zero_grads, model_state), (x, y, idx))
            metrics = jax.tree_util.tree_map(jnp.mean, metrics_seq)
            if grad_reduction == "mean":
                grads = jax.tree_util.tree_map(
                    lambda g: g / num_microbatches, grads)

        new_params, opt_state = optimizer.update(grads, opt_state, params, lr)
        new_state = {
            "params": new_params,
            "model_state": model_state,
            "opt_state": opt_state,
        }
        return new_state, metrics

    return train_step


def make_chunked_train_step(bound_step, root_rng) -> Callable:
    """Scan a pipeline-bound train step over K pre-staged feeds in ONE
    device dispatch (``steps_per_dispatch``).

    Each jit dispatch costs host->device round-trip latency (notably on
    remote/tunneled TPU runtimes, measured ~4ms/step on the bench host);
    scanning K steps per dispatch amortizes it K-fold. Per-step PRNG keys are
    derived inside as ``fold_in(root_rng, global_step)`` — the same
    derivation the unchunked loop uses — and the per-step learning rates
    arrive as a (K,) vector, so the training trajectory is independent
    of K (up to XLA's compilation-dependent float reassociation).

    bound_step: ``(ts, *feed, lr, rng) -> (ts, metrics)``.
    Returns ``chunk_step(ts, feeds, lrs, step0) -> (ts, stacked_metrics)``
    where ``feeds`` is a tuple of arrays with leading dim K.
    """

    def chunk_step(train_state, feeds, lrs, step0):
        # lrs: (K,) lr vector, or a {"lr", "momentum"} dict of (K,) vectors
        # when the scheduler cycles momentum — lax.scan slices the leading
        # axis of every leaf either way
        n = jax.tree_util.tree_leaves(lrs)[0].shape[0]
        steps = step0 + jnp.arange(n, dtype=jnp.int32)
        rngs = jax.vmap(lambda s: jax.random.fold_in(root_rng, s))(steps)

        def body(ts, xs):
            feed, lr, rng = xs[:-2], xs[-2], xs[-1]
            ts, m = bound_step(ts, *feed, lr, rng)
            return ts, m

        return jax.lax.scan(body, train_state, (*feeds, lrs, rngs))

    return chunk_step


def make_eval_step(
    model,
    preprocess_fn: Optional[Callable] = None,
) -> Callable:
    """Build the pure eval-step function.

    Returns *weighted metric sums* plus the valid-sample count so the caller
    computes exact sample-weighted means — fixing the reference's approximate
    mean-of-padded-batch-means evaluation (evaluation.py:35-42 over a
    shuffle+pad DistributedSampler, SURVEY.md §3.3) while remaining
    deterministic.
    """

    def eval_step(params, model_state, x, y, mask):
        """x: (B, H, W, C); y: (B,); mask: (B,) {0,1} validity weights."""
        if preprocess_fn is not None:
            x = preprocess_fn(x)
        logits, _ = model.apply(params, model_state, x, train=False)
        mask = mask.astype(jnp.float32)
        count = jnp.sum(mask)
        # Weighted *sums*; division happens on host over exact global counts.
        loss_sum = cross_entropy_loss(logits, y, weights=mask) * count
        top1_sum = (1.0 - top_k_err(logits, y, k=1, weights=mask)) * count
        top5_sum = (1.0 - top_k_err(logits, y, k=5, weights=mask)) * count
        return {
            "count": count,
            "loss_sum": loss_sum,
            "top1_correct": top1_sum,
            "top5_correct": top5_sum,
        }

    return eval_step


def finalize_eval_metrics(sums: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    """Host-side exact means in the reference's metric naming
    (metrics.py:21-29)."""
    count = float(sums["count"])
    if count == 0:
        raise ValueError("Evaluation saw zero valid samples.")
    return {
        "loss": float(sums["loss_sum"]) / count,
        "top1_err": 1.0 - float(sums["top1_correct"]) / count,
        "top5_err": 1.0 - float(sums["top5_correct"]) / count,
    }
