"""Evaluation loop (reference: resnet/algos/evaluation.py:15-42).

Differences by design: iteration is deterministic (no shuffled eval sampler)
and metrics are exact sample-weighted means over the true test-set count,
where the reference averaged padded batch means over a shuffled
DistributedSampler (SURVEY.md §3.3). Metric names/values match the
reference's (loss, top1_err, top5_err).
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from pytorch_ddp_resnet_tpu.algos.steps import finalize_eval_metrics


def evaluation_loop(pipeline, eval_step_fn, params, model_state) -> Dict[str, float]:
    """Evaluate over the pipeline's test split; returns exact global means.

    ``eval_step_fn`` is the resident variant
    (params, model_state, data_x, data_y, idx, mask) -> metric sums, so the
    batch gather happens inside the compiled step."""
    data_x, data_y = pipeline.test_view()
    totals = None
    for idx, mask in pipeline.eval_batches():
        sums = eval_step_fn(params, model_state, data_x, data_y, idx, mask)
        if totals is None:
            totals = sums
        else:
            totals = jax.tree_util.tree_map(lambda a, b: a + b, totals, sums)
    return finalize_eval_metrics(totals)
