"""Inference-time BatchNorm folding (serving optimization, ROADMAP #6).

For post-activation (v1) networks every BatchNorm directly follows a
convolution (conv -> BN -> relu; reference residual_block.py:67-99 ordering),
so its eval-mode affine can be folded into the conv:

    BN(conv(x)) = (W x + b - mean) * inv + beta,   inv = rsqrt(var+eps)*gamma
                = (W * inv) x + [(b - mean) * inv + beta]

The fold rewrites the *pytrees only* — no model surgery: the conv kernel
becomes ``W * inv`` (and its bias zero), and the BatchNorm is neutralized
into a pure bias-add by setting ``scale=1, mean=0, var=1-eps`` and moving
the folded constant into ``bias``. Eval-mode BN then computes
``x * rsqrt((1-eps)+eps) * 1 + bias = x + bias`` exactly. Under a
constant-closure jit (the Predictor bakes params in), XLA fuses the residual
bias-add into the conv kernel, eliminating the separate normalize pass.

Pre-activation (v2) networks put BN *before* the conv with a ReLU between —
not foldable; such pairs are skipped (the fold is a no-op for them).
Folded pytrees are for inference only: train-mode BN statistics would be
wrong after folding.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from pytorch_ddp_resnet_tpu.models.blocks import (
    BottleneckResidualBlock,
    ResidualBlock,
)
from pytorch_ddp_resnet_tpu.models.layers import BatchNorm, Conv, Sequential


def _fold_pair(conv_layer: Conv, bn_layer: BatchNorm,
               conv_p: Dict[str, Any], bn_p: Dict[str, Any],
               bn_s: Dict[str, Any]):
    """Return folded (conv_params, bn_params, bn_state)."""
    inv = jnp.asarray(
        1.0 / jnp.sqrt(bn_s["var"] + bn_layer.eps) * bn_p["scale"],
        jnp.float32)
    new_conv = dict(conv_p)
    new_conv["w"] = (conv_p["w"].astype(jnp.float32) * inv).astype(
        conv_p["w"].dtype)
    shift = -bn_s["mean"] * inv + bn_p["bias"]
    if conv_layer.use_bias and "b" in conv_p:
        shift = shift + conv_p["b"].astype(jnp.float32) * inv
        new_conv["b"] = jnp.zeros_like(conv_p["b"])
    new_bn_p = {"scale": jnp.ones_like(bn_p["scale"]),
                "bias": shift.astype(bn_p["bias"].dtype)}
    new_bn_s = {"mean": jnp.zeros_like(bn_s["mean"]),
                "var": jnp.full_like(bn_s["var"], 1.0 - bn_layer.eps),
                "count": bn_s["count"]}
    return new_conv, new_bn_p, new_bn_s


_BLOCK_PAIRS = (("conv1", "norm1"), ("conv2", "norm2"), ("conv3", "norm3"))


def _fold_block(block, p: Dict[str, Any], s: Dict[str, Any]) -> int:
    """Fold conv->BN pairs inside a post-act block's pytrees in place
    (dict level); returns the number of folded pairs."""
    if block.preact:
        return 0  # BN precedes the conv with a ReLU between: not foldable
    sub = {name: layer for name, layer, _ in block._sublayers()}
    n = 0
    for cname, nname in _BLOCK_PAIRS:
        if cname in p and nname in p and nname in s:
            p[cname], p[nname], s[nname] = _fold_pair(
                sub[cname], sub[nname], p[cname], p[nname], s[nname])
            n += 1
    return n


def fold_batchnorm(model, params, state) -> Tuple[Dict, Dict, int]:
    """Fold every eval-foldable conv->BN pair of a spec-built ResNet.

    Returns (folded_params, folded_state, n_folded). The model object is
    untouched; apply the returned pytrees with ``train=False`` only.
    """
    # shallow-copy the dict levels we mutate; leaves are immutable arrays
    p = {k: dict(v) for k, v in params.items()}
    s = {k: dict(v) for k, v in state.items()}
    n = 0

    entries = list(model.spine.layers)
    for i, (name, layer) in enumerate(entries):
        if isinstance(layer, Sequential):  # a residual stack
            stack_p = {k: dict(v) for k, v in p.get(name, {}).items()}
            stack_s = {k: dict(v) for k, v in s.get(name, {}).items()}
            for bname, block in layer.layers:
                if not isinstance(block, (ResidualBlock,
                                          BottleneckResidualBlock)):
                    continue
                bp = dict(stack_p.get(bname, {}))
                bs = dict(stack_s.get(bname, {}))
                folded = _fold_block(block, bp, bs)
                if folded:
                    stack_p[bname] = bp
                    stack_s[bname] = bs
                    n += folded
            p[name] = stack_p
            s[name] = stack_s
        elif isinstance(layer, BatchNorm) and i > 0:
            prev_name, prev_layer = entries[i - 1]
            if isinstance(prev_layer, Conv):
                p[prev_name], p[name], s[name] = _fold_pair(
                    prev_layer, layer, p[prev_name], p[name], s[name])
                n += 1
    return p, s, n
