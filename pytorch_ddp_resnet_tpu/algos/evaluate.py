"""Evaluation loop (reference: resnet/algos/evaluation.py:15-42).

Differences by design: iteration is deterministic (no shuffled eval sampler)
and metrics are exact sample-weighted means over the true test-set count,
where the reference averaged padded batch means over a shuffled
DistributedSampler (SURVEY.md §3.3). Metric names/values match the
reference's (loss, top1_err, top5_err).
"""

from __future__ import annotations

from typing import Dict

import jax

from pytorch_ddp_resnet_tpu.algos.steps import finalize_eval_metrics


def evaluation_loop(pipeline, eval_step_fn, params, model_state) -> Dict[str, float]:
    """Evaluate over the pipeline's test split; returns exact global means.

    ``eval_step_fn`` is the pipeline-bound jitted step: it takes
    (params, model_state, *feed) where ``feed`` comes from
    ``pipeline.eval_feed()`` — (idx, mask) for the resident pipeline,
    (x, y, mask) for the streaming one."""
    totals = None
    for feed in pipeline.eval_feed():
        sums = eval_step_fn(params, model_state, *feed)
        if totals is None:
            totals = sums
        else:
            totals = jax.tree_util.tree_map(lambda a, b: a + b, totals, sums)
    return finalize_eval_metrics(totals)
