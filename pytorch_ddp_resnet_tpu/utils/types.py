"""Shared type aliases (reference: resnet/utils/types_util.py:10-18).

The reference aliases torch classes; the JAX-native equivalents are pytrees
and callables, so these aliases are primarily documentation for signatures.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Protocol, Tuple, Union

import jax

Array = jax.Array
PyTree = Any                       # nested dict/tuple/list of Arrays
Params = Dict[str, Any]            # trainable pytree (Module analog)
ModelState = Dict[str, Any]        # non-trainable pytree (BN stats)
OptState = Dict[str, Any]          # optimizer state pytree
TrainState = Dict[str, Any]        # {"params", "model_state", "opt_state"}
Device = jax.Device
Metrics = Dict[str, Union[float, Array]]
StepFn = Callable[..., Tuple[TrainState, Metrics]]


class Checkpointable(Protocol):
    """Anything with torch-style state_dict round-tripping
    (reference Checkpointable union, types_util.py:14-16)."""

    def state_dict(self) -> Dict[str, Any]: ...

    def load_state_dict(self, d: Dict[str, Any]) -> None: ...
