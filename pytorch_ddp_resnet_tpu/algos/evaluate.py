"""Evaluation loop (reference: resnet/algos/evaluation.py:15-42).

Differences by design: iteration is deterministic (no shuffled eval sampler)
and metrics are exact sample-weighted means over the true test-set count,
where the reference averaged padded batch means over a shuffled
DistributedSampler (SURVEY.md §3.3). Metric names/values match the
reference's (loss, top1_err, top5_err).
"""

from __future__ import annotations

import weakref
from typing import Dict

import jax

from pytorch_ddp_resnet_tpu.algos.steps import finalize_eval_metrics

# eval_step_fn -> its accumulating jit (one trace per bound step, not one
# per evaluation_loop call)
_ACC_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _accumulating(eval_step_fn):
    try:
        return _ACC_CACHE[eval_step_fn]
    except KeyError:
        pass

    @jax.jit
    def step_acc(params, model_state, totals, *feed):
        sums = eval_step_fn(params, model_state, *feed)
        return jax.tree_util.tree_map(lambda a, b: a + b, totals, sums)

    _ACC_CACHE[eval_step_fn] = step_acc
    return step_acc


def evaluation_loop(pipeline, eval_step_fn, params, model_state) -> Dict[str, float]:
    """Evaluate over the pipeline's test split; returns exact global means.

    ``eval_step_fn`` is the pipeline-bound jitted step: it takes
    (params, model_state, *feed) where ``feed`` comes from
    ``pipeline.eval_feed()`` — (idx, mask) for the resident pipeline,
    (x, y, mask) for the streaming one.

    The running metric totals are folded into the per-batch dispatch
    itself (a jitted step+add wrapper): one computation per batch, one
    4-scalar readback at the end. Two designs this replaced, both
    measured bad in round 3:

    - eager ``a + b`` device adds between dispatches — each is a tiny
      multi-controller XLA computation, and interleaving ~80 of them with
      the jitted steps deadlocked intermittently on the 2-process CPU
      runtime (both controllers parked inside the same eager add,
      tests/test_multiprocess.py);
    - host-side accumulation via per-batch device_get — ~10ms per readback
      over the tunneled TPU runtime, ~60s per 79-batch validation
      (resnet-v2-164 run); a single wide reduce call over all per-batch
      handles still marshals ~300 buffer handles per validation through
      the tunnel's dispatch path."""
    totals = None
    for feed in pipeline.eval_feed():
        if totals is None:
            totals = eval_step_fn(params, model_state, *feed)
        else:
            totals = _accumulating(eval_step_fn)(
                params, model_state, totals, *feed)
    if totals is None:
        raise ValueError("Evaluation saw zero batches.")
    return finalize_eval_metrics(jax.device_get(totals))
