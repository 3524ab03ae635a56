"""Optimizers and learning-rate schedulers with torch-equivalent semantics.

The reference resolves ``optimizer_cls_name`` / ``scheduler_cls_name`` by
reflection over ``torch.optim`` / ``torch.optim.lr_scheduler``
(reference: resnet/utils/optim_util.py:11-30), so the YAML keys are torch
class names and kwargs. This module keeps that YAML surface but backs it with
pure-JAX implementations that reproduce torch's update rules exactly
(verified step-for-step against torch in tests/test_optim.py):

- optimizers: SGD (momentum/dampening/nesterov/coupled weight decay exactly
  as torch.optim.SGD, including the first-step ``buf = d_p`` special case),
  Adam, AdamW, RMSprop, Adagrad, NAdam, Adadelta, Adamax, RAdam, Rprop,
  ASGD — the full torch.optim namespace the reference's reflection exposes
  (optim_util.py:11-18) minus the deliberately-out-of-scope SparseAdam/LBFGS
  (sparse gradients / line-search closures have no place in a jitted SPMD
  step; the reference never ran them either);
- schedulers: MultiStepLR, StepLR, ExponentialLR, CosineAnnealingLR,
  LinearLR, ConstantLR, ReduceLROnPlateau, LambdaLR, OneCycleLR, CyclicLR,
  CosineAnnealingWarmRestarts, and ``'None'`` to disable (optim_util.py:26-27).

Documented divergence from torch: LambdaLR takes the lambda as a YAML-
expressible arithmetic expression string in ``epoch`` (a Python callable is
not YAML-encodable — the reference could not configure LambdaLR from YAML
either).

OneCycleLR/CyclicLR cycle momentum like torch does (``cycle_momentum``,
default on, torch semantics): the cycled value is fed into the jitted step
as a traced per-step scalar next to the lr (see ``split_hyperparams``), so
no recompilation happens. It applies to optimizers that expose a momentum
hyperparameter (SGD/RMSprop, constructed with momentum != 0 so the buffer
exists); pairing a momentum-cycling scheduler with any other optimizer
raises at setup — mirroring torch's "optimizer must support momentum"
ValueError — with ``cycle_momentum: false`` as the opt-out.

Design: an optimizer is a pair of pure functions over pytrees so the update
runs *inside* the jitted train step; the learning rate is a traced scalar
argument (schedulers run on host between steps — they are cheap, stateful,
and checkpointable, like the reference's).
"""

from __future__ import annotations

import math
from bisect import bisect_right
from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


def _tree_map(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


class Optimizer(NamedTuple):
    """init(params) -> opt_state; update(grads, opt_state, params, lr) ->
    (new_params, new_opt_state). lr may be a traced scalar, or — when the
    scheduler cycles momentum (OneCycleLR/CyclicLR, torch semantics) — a
    dict ``{"lr": scalar, "momentum": scalar}`` of traced hyperparameters
    (see ``split_hyperparams``). ``supports_momentum`` marks optimizers
    whose update consumes the cycled momentum (SGD/RMSprop with a nonzero
    constructed momentum, mirroring torch's 'momentum'-group check)."""

    init: Callable
    update: Callable
    supports_momentum: bool = False


def split_hyperparams(lr):
    """Normalize the train step's traced hyperparameter slot: plain scalar
    (the common case — unchanged signature) or a {"lr", "momentum"} dict
    when a scheduler cycles momentum. The isinstance check is resolved at
    trace time, so non-cycling runs compile exactly as before."""
    if isinstance(lr, dict):
        return lr["lr"], lr.get("momentum")
    return lr, None


def sgd(
    lr: float = None,  # accepted for YAML compat; the live lr is fed per step
    momentum: float = 0.0,
    dampening: float = 0.0,
    nesterov: bool = False,
    weight_decay: float = 0.0,
    **_ignored,
) -> Optimizer:
    """torch.optim.SGD semantics:

        d_p = g + wd * p
        buf = d_p                      (first step)
            | mu * buf + (1-damp)*d_p  (later steps)
        d_p = d_p + mu * buf  (nesterov)  |  buf
        p  -= lr * d_p
    """
    if nesterov and (momentum <= 0 or dampening != 0):
        raise ValueError("Nesterov momentum requires momentum > 0 and zero dampening.")

    def init(params):
        state = {"step": jnp.zeros((), jnp.int32)}
        if momentum != 0.0:
            state["buf"] = _tree_map(jnp.zeros_like, params)
        return state

    def update(grads, state, params, lr):
        lr, cycled_mu = split_hyperparams(lr)
        # the traced per-step momentum (OneCycle/Cyclic momentum cycling,
        # like torch's in-place param_group['momentum'] writes) overrides
        # the constructed constant; buf allocation stays gated on the
        # static constructed value
        mu = momentum if cycled_mu is None else cycled_mu
        step = state["step"]
        d_p = grads
        if weight_decay != 0.0:
            d_p = _tree_map(lambda g, p: g + weight_decay * p, d_p, params)
        new_state = {"step": step + 1}
        if momentum != 0.0:
            first = step == 0
            buf = _tree_map(
                lambda b, d: jnp.where(first, d, mu * b + (1.0 - dampening) * d),
                state["buf"], d_p)
            new_state["buf"] = buf
            if nesterov:
                d_p = _tree_map(lambda d, b: d + mu * b, d_p, buf)
            else:
                d_p = buf
        new_params = _tree_map(lambda p, d: p - lr * d, params, d_p)
        return new_params, new_state

    return Optimizer(init, update, supports_momentum=momentum != 0.0)


def adam(
    lr: float = None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decoupled: bool = False,
    **_ignored,
) -> Optimizer:
    """torch.optim.Adam (coupled wd) / AdamW (decoupled wd) semantics."""
    b1, b2 = betas

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": _tree_map(jnp.zeros_like, params),
            "v": _tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params, lr):
        lr, _ = split_hyperparams(lr)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        if weight_decay != 0.0 and not decoupled:
            grads = _tree_map(lambda g, p: g + weight_decay * p, grads, params)
        m = _tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = _tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
        bc1 = 1 - b1 ** tf
        bc2 = 1 - b2 ** tf

        def upd(p, m_, v_):
            # torch's exact op order: denom = sqrt(v)/sqrt(bc2) + eps,
            # p -= (lr/bc1) * m / denom  (torch/optim/adam.py single-tensor path)
            denom = jnp.sqrt(v_) / jnp.sqrt(bc2) + eps
            step_val = (lr / bc1) * m_ / denom
            if weight_decay != 0.0 and decoupled:
                # torch AdamW decays the param *before* the Adam step:
                # p *= (1 - lr*wd); then p -= step
                p = p * (1 - lr * weight_decay)
            return p - step_val

        new_params = _tree_map(upd, params, m, v)
        return new_params, {"step": t, "m": m, "v": v}

    return Optimizer(init, update)


def rmsprop(
    lr: float = None,
    alpha: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    momentum: float = 0.0,
    centered: bool = False,
    **_ignored,
) -> Optimizer:
    """torch.optim.RMSprop semantics."""

    def init(params):
        state = {
            "step": jnp.zeros((), jnp.int32),
            "sq": _tree_map(jnp.zeros_like, params),
        }
        if momentum > 0:
            state["buf"] = _tree_map(jnp.zeros_like, params)
        if centered:
            state["avg"] = _tree_map(jnp.zeros_like, params)
        return state

    def update(grads, state, params, lr):
        lr, cycled_mu = split_hyperparams(lr)
        mu = momentum if cycled_mu is None else cycled_mu
        if weight_decay != 0.0:
            grads = _tree_map(lambda g, p: g + weight_decay * p, grads, params)
        sq = _tree_map(lambda s, g: alpha * s + (1 - alpha) * g * g,
                       state["sq"], grads)
        new_state = {"step": state["step"] + 1, "sq": sq}
        if centered:
            avg = _tree_map(lambda a, g: alpha * a + (1 - alpha) * g,
                            state["avg"], grads)
            new_state["avg"] = avg
            denom = _tree_map(lambda s, a: jnp.sqrt(s - a * a) + eps, sq, avg)
        else:
            denom = _tree_map(lambda s: jnp.sqrt(s) + eps, sq)
        if momentum > 0:
            buf = _tree_map(lambda b, g, d: mu * b + g / d,
                            state["buf"], grads, denom)
            new_state["buf"] = buf
            new_params = _tree_map(lambda p, b: p - lr * b, params, buf)
        else:
            new_params = _tree_map(lambda p, g, d: p - lr * g / d,
                                   params, grads, denom)
        return new_params, new_state

    return Optimizer(init, update, supports_momentum=momentum > 0)


def adagrad(
    lr: float = None,
    lr_decay: float = 0.0,
    weight_decay: float = 0.0,
    initial_accumulator_value: float = 0.0,
    eps: float = 1e-10,
    **_ignored,
) -> Optimizer:
    """torch.optim.Adagrad semantics:

        t += 1
        clr = lr / (1 + (t - 1) * lr_decay)
        g = g + wd * p
        sum += g^2
        p -= clr * g / (sqrt(sum) + eps)
    """

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "sum": _tree_map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params),
        }

    def update(grads, state, params, lr):
        lr, _ = split_hyperparams(lr)
        t = state["step"] + 1
        clr = lr / (1 + (t.astype(jnp.float32) - 1) * lr_decay)
        if weight_decay != 0.0:
            grads = _tree_map(lambda g, p: g + weight_decay * p, grads, params)
        sq = _tree_map(lambda s, g: s + g * g, state["sum"], grads)
        new_params = _tree_map(
            lambda p, g, s: p - clr * g / (jnp.sqrt(s) + eps),
            params, grads, sq)
        return new_params, {"step": t, "sum": sq}

    return Optimizer(init, update)


def nadam(
    lr: float = None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    momentum_decay: float = 4e-3,
    decoupled_weight_decay: bool = False,
    **_ignored,
) -> Optimizer:
    """torch.optim.NAdam semantics (Dozat'16 with mu-product warm schedule):

        mu_t    = b1 * (1 - 0.5 * 0.96^(t * psi))
        mu_{t+1}= b1 * (1 - 0.5 * 0.96^((t+1) * psi))
        mu_prod *= mu_t
        m, v Adam EMAs; denom = sqrt(v / (1 - b2^t)) + eps
        p -= lr * (1 - mu_t) / (1 - mu_prod) * g / denom
        p -= lr * mu_{t+1} / (1 - mu_prod * mu_{t+1}) * m / denom
    """
    b1, b2 = betas

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "mu_product": jnp.ones((), jnp.float32),
            "m": _tree_map(jnp.zeros_like, params),
            "v": _tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params, lr):
        lr, _ = split_hyperparams(lr)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        if weight_decay != 0.0:
            if decoupled_weight_decay:
                params = _tree_map(lambda p: p * (1 - lr * weight_decay), params)
            else:
                grads = _tree_map(lambda g, p: g + weight_decay * p,
                                  grads, params)
        mu = b1 * (1 - 0.5 * 0.96 ** (tf * momentum_decay))
        mu_next = b1 * (1 - 0.5 * 0.96 ** ((tf + 1) * momentum_decay))
        mu_product = state["mu_product"] * mu
        m = _tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = _tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                      state["v"], grads)
        bc2 = 1 - b2 ** tf

        def upd(p, g, m_, v_):
            denom = jnp.sqrt(v_) / jnp.sqrt(bc2) + eps
            p = p - lr * (1 - mu) / (1 - mu_product) * g / denom
            return p - lr * mu_next / (1 - mu_product * mu_next) * m_ / denom

        new_params = _tree_map(upd, params, grads, m, v)
        return new_params, {"step": t, "mu_product": mu_product, "m": m, "v": v}

    return Optimizer(init, update)


def adadelta(
    lr: float = None,
    rho: float = 0.9,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    **_ignored,
) -> Optimizer:
    """torch.optim.Adadelta semantics (torch/optim/adadelta.py single-tensor
    path — exact op order matters):

        g = g + wd * p
        sq  = rho * sq + (1 - rho) * g^2       (updated FIRST)
        delta = sqrt(acc + eps) / sqrt(sq + eps) * g   (acc from LAST step)
        acc = rho * acc + (1 - rho) * delta^2
        p -= lr * delta
    """

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "sq": _tree_map(jnp.zeros_like, params),
            "acc": _tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params, lr):
        lr, _ = split_hyperparams(lr)
        if weight_decay != 0.0:
            grads = _tree_map(lambda g, p: g + weight_decay * p, grads, params)
        sq = _tree_map(lambda s, g: rho * s + (1 - rho) * g * g,
                       state["sq"], grads)
        delta = _tree_map(
            lambda a, s, g: jnp.sqrt(a + eps) / jnp.sqrt(s + eps) * g,
            state["acc"], sq, grads)
        acc = _tree_map(lambda a, d: rho * a + (1 - rho) * d * d,
                        state["acc"], delta)
        new_params = _tree_map(lambda p, d: p - lr * d, params, delta)
        return new_params, {"step": state["step"] + 1, "sq": sq, "acc": acc}

    return Optimizer(init, update)


def adamax(
    lr: float = None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    **_ignored,
) -> Optimizer:
    """torch.optim.Adamax semantics (infinity-norm Adam):

        g = g + wd * p
        m = b1 * m + (1 - b1) * g
        u = max(b2 * u, |g| + eps)    (eps inside the max, as torch does)
        p -= lr / (1 - b1^t) * m / u
    """
    b1, b2 = betas

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": _tree_map(jnp.zeros_like, params),
            "u": _tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params, lr):
        lr, _ = split_hyperparams(lr)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        if weight_decay != 0.0:
            grads = _tree_map(lambda g, p: g + weight_decay * p, grads, params)
        m = _tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        u = _tree_map(lambda u_, g: jnp.maximum(b2 * u_, jnp.abs(g) + eps),
                      state["u"], grads)
        clr = lr / (1 - b1 ** tf)
        new_params = _tree_map(lambda p, m_, u_: p - clr * m_ / u_,
                               params, m, u)
        return new_params, {"step": t, "m": m, "u": u}

    return Optimizer(init, update)


def radam(
    lr: float = None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decoupled_weight_decay: bool = False,
    **_ignored,
) -> Optimizer:
    """torch.optim.RAdam semantics (rectified Adam, Liu et al. 2020):

        rho_inf = 2 / (1 - b2) - 1
        rho_t   = rho_inf - 2 t b2^t / (1 - b2^t)
        m_hat   = m / (1 - b1^t)
        if rho_t > 5:  p -= lr * m_hat * rect(rho_t) * sqrt(1-b2^t)/(sqrt(v)+eps)
        else:          p -= lr * m_hat                 (un-adapted warmup)

    The rho_t > 5 branch depends only on the (traced) step counter, so it
    compiles to a jnp.where over the two update forms.
    """
    b1, b2 = betas
    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "m": _tree_map(jnp.zeros_like, params),
            "v": _tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params, lr):
        lr, _ = split_hyperparams(lr)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        if weight_decay != 0.0:
            if decoupled_weight_decay:
                params = _tree_map(lambda p: p * (1 - lr * weight_decay),
                                   params)
            else:
                grads = _tree_map(lambda g, p: g + weight_decay * p,
                                  grads, params)
        m = _tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = _tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                      state["v"], grads)
        bc1 = 1 - b1 ** tf
        bc2 = 1 - b2 ** tf
        rho_t = rho_inf - 2.0 * tf * (b2 ** tf) / bc2
        rect = jnp.sqrt(jnp.clip(
            ((rho_t - 4.0) * (rho_t - 2.0) * rho_inf)
            / ((rho_inf - 4.0) * (rho_inf - 2.0) * rho_t), min=0.0))
        rectified = rho_t > 5.0

        def upd(p, m_, v_):
            m_hat = m_ / bc1
            adaptive = jnp.sqrt(bc2) / (jnp.sqrt(v_) + eps)
            return p - jnp.where(rectified,
                                 lr * m_hat * rect * adaptive,
                                 lr * m_hat)

        new_params = _tree_map(upd, params, m, v)
        return new_params, {"step": t, "m": m, "v": v}

    return Optimizer(init, update)


def rprop(
    lr: float = 1e-2,
    etas=(0.5, 1.2),
    step_sizes=(1e-6, 50.0),
    **_ignored,
) -> Optimizer:
    """torch.optim.Rprop semantics (sign-based, per-weight adaptive steps):

        mult = etaplus  where g * prev > 0
             | etaminus where g * prev < 0
             | 1        otherwise
        step_size = clamp(step_size * mult, step_min, step_max)
        g = 0 where mult == etaminus        (skip reversal steps)
        p -= sign(g) * step_size
        prev = g

    lr only seeds the per-weight step sizes: torch fills the state buffer
    lazily with the group lr at the FIRST step() call, so we seed from the
    first *traced* lr the update sees (a scheduler's step-0 lr, matching
    torch under a scheduler); later traced lrs are deliberately ignored,
    exactly like torch, where changing group['lr'] after step 1 has no
    effect on Rprop.
    """
    if lr is None:
        lr = 1e-2
    etaminus, etaplus = float(etas[0]), float(etas[1])
    if not 0.0 < etaminus < 1.0 < etaplus:
        raise ValueError("etas must satisfy 0 < etaminus < 1 < etaplus.")
    step_min, step_max = float(step_sizes[0]), float(step_sizes[1])

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "prev": _tree_map(jnp.zeros_like, params),
            "step_size": _tree_map(lambda p: jnp.full_like(p, lr), params),
        }

    def update(grads, state, params, lr_traced):
        lr_t, _ = split_hyperparams(lr_traced)
        # lazy seed, torch-style: the first update's lr fills step_size
        first = state["step"] == 0
        seeded = _tree_map(
            lambda s: jnp.where(first, jnp.asarray(lr_t, s.dtype), s),
            state["step_size"])

        def mult_of(g, prev):
            sign = jnp.sign(g * prev)
            return jnp.where(sign > 0, etaplus,
                             jnp.where(sign < 0, etaminus, 1.0))

        # three maps sharing mult_of — XLA CSEs the repeated subexpression
        size = _tree_map(
            lambda g, pv, s: jnp.clip(s * mult_of(g, pv), step_min, step_max),
            grads, state["prev"], seeded)
        zeroed = _tree_map(
            lambda g, pv: jnp.where(mult_of(g, pv) == etaminus, 0.0, g),
            grads, state["prev"])
        new_params = _tree_map(lambda p, g, s: p - jnp.sign(g) * s,
                               params, zeroed, size)
        return new_params, {"step": state["step"] + 1, "prev": zeroed,
                            "step_size": size}

    return Optimizer(init, update)


def asgd(
    lr: float = 1e-2,
    lambd: float = 1e-4,
    alpha: float = 0.75,
    t0: float = 1e6,
    weight_decay: float = 0.0,
    **_ignored,
) -> Optimizer:
    """torch.optim.ASGD semantics (averaged SGD, Polyak-Ruppert):

        g = g + wd * p
        p = p * (1 - lambd * eta) - eta * g     (eta from the PREVIOUS step)
        ax += (p - ax) * mu                     (mu from the PREVIOUS step)
        eta = lr / (1 + lambd * lr * t)^alpha
        mu  = 1 / max(1, t - t0)

    ``eta`` is seeded lazily from the first traced lr the update sees
    (torch fills it with the group lr at the first step() call — a
    scheduler's step-0 lr, not the constructor's); later steps use the
    traced per-step lr in the eta recurrence, matching torch under a
    scheduler. The averaged iterate ``ax`` lives in the optimizer state
    (torch exposes it the same way); the live params are returned, as
    torch's step does.
    """
    if lr is None:
        lr = 1e-2

    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "eta": jnp.asarray(lr, jnp.float32),
            "mu": jnp.ones((), jnp.float32),
            "ax": _tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params, lr_traced):
        lr_traced, _ = split_hyperparams(lr_traced)
        t = state["step"] + 1
        tf = t.astype(jnp.float32)
        # lazy seed, torch-style: the first update's lr becomes eta_0
        eta = jnp.where(state["step"] == 0,
                        jnp.asarray(lr_traced, jnp.float32), state["eta"])
        mu = state["mu"]
        if weight_decay != 0.0:
            grads = _tree_map(lambda g, p: g + weight_decay * p,
                              grads, params)
        new_params = _tree_map(
            lambda p, g: p * (1 - lambd * eta) - eta * g, params, grads)
        # mu == 1 makes ax + (p - ax) * mu == p, so one form covers torch's
        # copy_ and add_ branches
        ax = _tree_map(lambda a, p: a + (p - a) * mu, state["ax"], new_params)
        new_eta = lr_traced / (1 + lambd * lr_traced * tf) ** alpha
        new_mu = 1.0 / jnp.maximum(1.0, tf - t0)
        return new_params, {"step": t, "eta": new_eta, "mu": new_mu, "ax": ax}

    return Optimizer(init, update)


_OPTIMIZERS: Dict[str, Callable[..., Optimizer]] = {
    "SGD": sgd,
    "Adam": lambda **kw: adam(decoupled=False, **kw),
    "AdamW": lambda **kw: adam(
        decoupled=True,
        **{**{"weight_decay": 0.01}, **kw}),  # torch AdamW default wd
    "RMSprop": rmsprop,
    "Adagrad": adagrad,
    "NAdam": nadam,
    "Adadelta": adadelta,
    "Adamax": adamax,
    "RAdam": radam,
    "Rprop": rprop,
    "ASGD": asgd,
}


def get_optimizer(
    optimizer_cls_name: str,
    optimizer_args: Optional[Dict[str, Any]] = None,
    **_ignored,
) -> Optimizer:
    """Name+kwargs factory (reference: optim_util.py:11-18). The ``lr`` kwarg
    sets the scheduler base rate; retrieve it with ``base_lr_of``."""
    args = dict(optimizer_args or {})
    if optimizer_cls_name not in _OPTIMIZERS:
        raise ValueError(
            f"Unknown optimizer {optimizer_cls_name!r}; "
            f"available: {sorted(_OPTIMIZERS)}")
    return _OPTIMIZERS[optimizer_cls_name](**args)


def base_lr_of(optimizer_args: Optional[Dict[str, Any]]) -> float:
    if not optimizer_args or "lr" not in optimizer_args:
        raise ValueError("optimizer_args must carry an 'lr' key.")
    return float(optimizer_args["lr"])


# ---------------------------------------------------------------------------
# Schedulers: host-side, stateful, checkpointable.
# ---------------------------------------------------------------------------


class LRScheduler:
    """Base: counts ``step()`` calls like torch's ``last_epoch``. ``get_lr()``
    returns the rate for the *next* optimizer step. The unit (batch vs epoch)
    is the caller's business (``scheduler_step_unit``, training.py:118-119,
    150-151)."""

    requires_loss = False  # ReduceLROnPlateau overrides (training.py:20-28)
    cycles_momentum = False  # OneCycleLR/CyclicLR set per-instance

    def __init__(self, base_lr: float):
        self.base_lr = float(base_lr)
        self.last_epoch = 0

    def step(self, loss: Optional[float] = None) -> None:
        del loss
        self.last_epoch += 1

    def get_lr(self) -> float:
        raise NotImplementedError

    def get_momentum(self) -> Optional[float]:
        """The cycled momentum for the *next* optimizer step, or None when
        this scheduler does not cycle momentum (the common case)."""
        return None

    def state_dict(self) -> Dict[str, Any]:
        return {"last_epoch": self.last_epoch}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.last_epoch = int(d["last_epoch"])


class MultiStepLR(LRScheduler):
    def __init__(self, base_lr, milestones, gamma=0.1, **_ignored):
        super().__init__(base_lr)
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = float(gamma)

    def get_lr(self) -> float:
        return self.base_lr * self.gamma ** bisect_right(self.milestones, self.last_epoch)


class StepLR(LRScheduler):
    def __init__(self, base_lr, step_size, gamma=0.1, **_ignored):
        super().__init__(base_lr)
        self.step_size = int(step_size)
        self.gamma = float(gamma)

    def get_lr(self) -> float:
        return self.base_lr * self.gamma ** (self.last_epoch // self.step_size)


class ExponentialLR(LRScheduler):
    def __init__(self, base_lr, gamma, **_ignored):
        super().__init__(base_lr)
        self.gamma = float(gamma)

    def get_lr(self) -> float:
        return self.base_lr * self.gamma ** self.last_epoch


class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr, T_max, eta_min=0.0, **_ignored):
        super().__init__(base_lr)
        self.T_max = int(T_max)
        self.eta_min = float(eta_min)

    def get_lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.last_epoch / self.T_max)) / 2


class LinearLR(LRScheduler):
    def __init__(self, base_lr, start_factor=1.0 / 3, end_factor=1.0,
                 total_iters=5, **_ignored):
        super().__init__(base_lr)
        self.start_factor = float(start_factor)
        self.end_factor = float(end_factor)
        self.total_iters = int(total_iters)

    def get_lr(self) -> float:
        t = min(self.last_epoch, self.total_iters)
        factor = self.start_factor + (self.end_factor - self.start_factor) * (
            t / self.total_iters)
        return self.base_lr * factor


class ConstantLR(LRScheduler):
    def __init__(self, base_lr, factor=1.0 / 3, total_iters=5, **_ignored):
        super().__init__(base_lr)
        self.factor = float(factor)
        self.total_iters = int(total_iters)

    def get_lr(self) -> float:
        return self.base_lr * (self.factor if self.last_epoch < self.total_iters else 1.0)


class ReduceLROnPlateau(LRScheduler):
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (min/max modes,
    rel/abs threshold, patience, cooldown, min_lr). The reference passes the
    loss through ``step_scheduler`` (training.py:24-28)."""

    requires_loss = True

    def __init__(self, base_lr, mode="min", factor=0.1, patience=10,
                 threshold=1e-4, threshold_mode="rel", cooldown=0,
                 min_lr=0.0, **_ignored):
        super().__init__(base_lr)
        if mode not in ("min", "max") or threshold_mode not in ("rel", "abs"):
            raise ValueError("Bad mode/threshold_mode.")
        self.mode = mode
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.threshold_mode = threshold_mode
        self.cooldown = int(cooldown)
        self.min_lr = float(min_lr)
        self.current_lr = float(base_lr)
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, value: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return value < self.best * (1 - self.threshold)
            return value < self.best - self.threshold
        if self.threshold_mode == "rel":
            return value > self.best * (1 + self.threshold)
        return value > self.best + self.threshold

    def step(self, loss: Optional[float] = None) -> None:
        if loss is None:
            raise ValueError("ReduceLROnPlateau.step requires the loss.")
        value = float(loss)
        self.last_epoch += 1
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.current_lr = max(self.current_lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0

    def get_lr(self) -> float:
        return self.current_lr

    def state_dict(self):
        return {
            "last_epoch": self.last_epoch,
            "current_lr": self.current_lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d):
        self.last_epoch = int(d["last_epoch"])
        self.current_lr = float(d["current_lr"])
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])
        self.cooldown_counter = int(d["cooldown_counter"])


class LambdaLR(LRScheduler):
    """torch.optim.lr_scheduler.LambdaLR: ``lr = base_lr * f(epoch)``.

    ``lr_lambda`` may be a Python callable (library use) or a YAML-friendly
    arithmetic expression string in the variable ``epoch`` with ``math``
    available, e.g. ``"0.95 ** epoch"`` (a callable is not YAML-encodable; the
    reference's reflection over torch could not configure LambdaLR from YAML
    either, so the string form is this framework's config surface for it)."""

    def __init__(self, base_lr, lr_lambda, **_ignored):
        super().__init__(base_lr)
        if callable(lr_lambda):
            self._fn = lr_lambda
        else:
            code = compile(str(lr_lambda), "<lr_lambda>", "eval")

            # Validate EVERY nested code object (lambdas/comprehensions in
            # the expression carry their own co_names — checking only the
            # top level lets `(lambda: ().__class__...)()` style payloads
            # reach attribute chains the whitelist is meant to block), and
            # reject attribute access on anything but the math module.
            import types as _types

            allowed = {"epoch", "math", "min", "max", "abs"} | {
                n for n in dir(math) if not n.startswith("_")}

            def check(c):
                for name in c.co_names:
                    if name not in allowed:
                        raise ValueError(
                            f"lr_lambda expression uses disallowed name "
                            f"{name!r}; allowed: epoch, math.*, min, max, "
                            f"abs.")
                for const in c.co_consts:
                    if isinstance(const, _types.CodeType):
                        check(const)

            check(code)
            # co_names can't distinguish a bare name from a math attribute,
            # so 'sqrt(epoch)' passes the whitelist but would NameError at
            # the first get_lr() mid-training. A trial evaluation surfaces
            # the mistake at construction with a fix hint.
            try:
                eval(code, {"__builtins__": {}},  # noqa: S307
                     {"epoch": 0, "math": math, "min": min, "max": max,
                      "abs": abs})
            except NameError as e:
                raise ValueError(
                    f"lr_lambda expression references an undefined name "
                    f"({e}); math functions need the math. prefix, e.g. "
                    f"'math.sqrt(epoch + 1)'.") from None
            except Exception as e:  # noqa: BLE001
                # ANY epoch-0 failure is a construction error: get_lr() is
                # evaluated at epoch 0 at the first training step, so even
                # value-domain failures like '1/epoch' crash immediately —
                # torch.optim.lr_scheduler.LambdaLR likewise evaluates the
                # lambda at epoch 0 inside __init__ (its initial step())
                # and raises at construction. TypeError/AttributeError
                # (e.g. 'min(epoch)', '(1.0).hypot(epoch)' — names that
                # pass the whitelist but can never evaluate) fail at EVERY
                # epoch, all the more reason to surface them here.
                raise ValueError(
                    f"lr_lambda expression fails to evaluate at epoch 0 "
                    f"({type(e).__name__}: {e}); get_lr() would crash at "
                    f"the first training step — guard the expression, "
                    f"e.g. use (epoch + 1).") from None
            self._fn = lambda epoch: eval(  # noqa: S307 — names whitelisted
                code, {"__builtins__": {}},
                {"epoch": epoch, "math": math, "min": min, "max": max,
                 "abs": abs})

    def get_lr(self) -> float:
        return self.base_lr * float(self._fn(self.last_epoch))


class OneCycleLR(LRScheduler):
    """torch.optim.lr_scheduler.OneCycleLR, including torch's momentum
    cycling (``cycle_momentum``, default on): momentum anneals inversely to
    the lr — max_momentum -> base_momentum on the way up, back to
    max_momentum on the way down (three_phase: max->base, base->max,
    max->max). The cycled value reaches the optimizer as a traced per-step
    scalar (split_hyperparams) instead of torch's in-place param_group
    writes."""

    def __init__(self, base_lr, max_lr, total_steps, pct_start=0.3,
                 anneal_strategy="cos", div_factor=25.0,
                 final_div_factor=1e4, three_phase=False,
                 cycle_momentum=True, base_momentum=0.85, max_momentum=0.95,
                 **_ignored):
        super().__init__(base_lr)
        if anneal_strategy not in ("cos", "linear"):
            raise ValueError("anneal_strategy must be 'cos' or 'linear'.")
        if not 0 < pct_start < 1:
            raise ValueError("pct_start must be in (0, 1).")
        self.total_steps = int(total_steps)
        self.anneal_strategy = anneal_strategy
        self.cycles_momentum = bool(cycle_momentum)
        base_m, max_m = float(base_momentum), float(max_momentum)
        initial_lr = float(max_lr) / float(div_factor)
        min_lr = initial_lr / float(final_div_factor)
        up = float(pct_start) * self.total_steps - 1
        # (end_step, start_lr, end_lr, start_momentum, end_momentum) —
        # torch's _schedule_phases with the same phase boundaries
        if three_phase:
            self._phases = [
                (up, initial_lr, float(max_lr), max_m, base_m),
                (2 * up, float(max_lr), initial_lr, base_m, max_m),
                (self.total_steps - 1, initial_lr, min_lr, max_m, max_m),
            ]
        else:
            self._phases = [
                (up, initial_lr, float(max_lr), max_m, base_m),
                (self.total_steps - 1, float(max_lr), min_lr, base_m, max_m),
            ]

    def _anneal(self, start: float, end: float, pct: float) -> float:
        if self.anneal_strategy == "cos":
            return end + (start - end) / 2.0 * (1 + math.cos(math.pi * pct))
        return (end - start) * pct + start

    def _interp(self, lr_slot: bool) -> float:
        step_num = self.last_epoch
        if step_num > self.total_steps:
            raise ValueError(
                f"Tried to step {step_num} times; total_steps is "
                f"{self.total_steps}.")
        start_step = 0.0
        for i, (end_step, start_lr, end_lr, start_m, end_m) in enumerate(
                self._phases):
            if step_num <= end_step or i == len(self._phases) - 1:
                pct = (step_num - start_step) / (end_step - start_step)
                return (self._anneal(start_lr, end_lr, pct) if lr_slot
                        else self._anneal(start_m, end_m, pct))
            start_step = end_step
        raise AssertionError  # pragma: no cover

    def get_lr(self) -> float:
        return self._interp(lr_slot=True)

    def get_momentum(self) -> Optional[float]:
        return self._interp(lr_slot=False) if self.cycles_momentum else None


class CyclicLR(LRScheduler):
    """torch.optim.lr_scheduler.CyclicLR triangular/triangular2/exp_range,
    including torch's momentum cycling (``cycle_momentum``, default on):
    momentum moves inversely to the lr between max_momentum (at cycle
    start) and base_momentum (at peak lr), scaled by the same mode rule."""

    def __init__(self, base_lr, max_lr, step_size_up=2000,
                 step_size_down=None, mode="triangular", gamma=1.0,
                 cycle_momentum=True, base_momentum=0.8, max_momentum=0.9,
                 **_ignored):
        super().__init__(base_lr)
        if mode not in ("triangular", "triangular2", "exp_range"):
            raise ValueError(f"Unknown CyclicLR mode {mode!r}.")
        self.max_lr = float(max_lr)
        up = float(step_size_up)
        down = float(step_size_down) if step_size_down is not None else up
        self.total_size = up + down
        self.step_ratio = up / self.total_size
        self.mode = mode
        self.gamma = float(gamma)
        self.cycles_momentum = bool(cycle_momentum)
        self.base_momentum = float(base_momentum)
        self.max_momentum = float(max_momentum)

    def _cycle_scale(self):
        cycle = math.floor(1 + self.last_epoch / self.total_size)
        x = 1.0 + self.last_epoch / self.total_size - cycle
        if x <= self.step_ratio:
            scale_factor = x / self.step_ratio
        else:
            scale_factor = (x - 1) / (self.step_ratio - 1)
        if self.mode == "triangular":
            mode_scale = 1.0
        elif self.mode == "triangular2":
            mode_scale = 1.0 / (2.0 ** (cycle - 1))
        else:
            mode_scale = self.gamma ** self.last_epoch
        return scale_factor, mode_scale

    def get_lr(self) -> float:
        scale_factor, mode_scale = self._cycle_scale()
        height = (self.max_lr - self.base_lr) * scale_factor
        return self.base_lr + height * mode_scale

    def get_momentum(self) -> Optional[float]:
        if not self.cycles_momentum:
            return None
        scale_factor, mode_scale = self._cycle_scale()
        height = (self.max_momentum - self.base_momentum) * scale_factor
        return self.max_momentum - height * mode_scale


class CosineAnnealingWarmRestarts(LRScheduler):
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts (SGDR)."""

    def __init__(self, base_lr, T_0, T_mult=1, eta_min=0.0, **_ignored):
        super().__init__(base_lr)
        if T_0 <= 0 or int(T_0) != T_0:
            raise ValueError("T_0 must be a positive integer.")
        if T_mult < 1 or int(T_mult) != T_mult:
            raise ValueError("T_mult must be an integer >= 1.")
        self.T_0 = int(T_0)
        self.T_mult = int(T_mult)
        self.eta_min = float(eta_min)
        self.T_cur = 0
        self.T_i = self.T_0

    def step(self, loss: Optional[float] = None) -> None:
        del loss
        self.last_epoch += 1
        self.T_cur += 1
        if self.T_cur >= self.T_i:
            self.T_cur -= self.T_i
            self.T_i *= self.T_mult

    def get_lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.T_cur / self.T_i)) / 2

    def state_dict(self):
        return {"last_epoch": self.last_epoch, "T_cur": self.T_cur,
                "T_i": self.T_i}

    def load_state_dict(self, d):
        self.last_epoch = int(d["last_epoch"])
        self.T_cur = int(d["T_cur"])
        self.T_i = int(d["T_i"])


_SCHEDULERS = {
    "MultiStepLR": MultiStepLR,
    "StepLR": StepLR,
    "ExponentialLR": ExponentialLR,
    "CosineAnnealingLR": CosineAnnealingLR,
    "LinearLR": LinearLR,
    "ConstantLR": ConstantLR,
    "ReduceLROnPlateau": ReduceLROnPlateau,
    "LambdaLR": LambdaLR,
    "OneCycleLR": OneCycleLR,
    "CyclicLR": CyclicLR,
    "CosineAnnealingWarmRestarts": CosineAnnealingWarmRestarts,
}


def get_scheduler(
    scheduler_cls_name: str,
    scheduler_args: Optional[Dict[str, Any]],
    base_lr: float,
    **_ignored,
) -> Optional[LRScheduler]:
    """Name+kwargs factory; 'None' disables (reference: optim_util.py:21-30).

    ``base_lr`` defaults to the optimizer's lr; a ``base_lr`` key inside
    ``scheduler_args`` overrides it (CyclicLR configs carry their own)."""
    if scheduler_cls_name in (None, "None"):
        return None
    if scheduler_cls_name not in _SCHEDULERS:
        raise ValueError(
            f"Unknown scheduler {scheduler_cls_name!r}; "
            f"available: {sorted(_SCHEDULERS)} or 'None'")
    args = dict(scheduler_args or {})
    base_lr = float(args.pop("base_lr", base_lr))
    return _SCHEDULERS[scheduler_cls_name](base_lr, **args)
