"""Inference / serving surface.

The reference stops at train/eval loops; production deployment needs a
standalone predict path: load the latest classifier checkpoint, apply the
deterministic test-time pipeline, and run batched jitted inference (bf16,
padded static shapes) over the mesh.

``load_predictor(config)`` -> ``Predictor`` with:
- ``logits(images_u8_nhwc)`` / ``predict(images)`` (top-1 labels)
- arbitrary input batch sizes (internally padded to the compiled batch)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    def __init__(self, model, params, model_state, preprocess_fn,
                 batch_size: int = 256):
        self._model = model
        self._params = params
        self._state = model_state
        self._batch = batch_size

        def fwd(params, state, x):
            xp = preprocess_fn(x) if preprocess_fn else x
            logits, _ = model.apply(params, state, xp, train=False)
            return logits

        self._fwd = jax.jit(fwd)

    def logits(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W, C) uint8 (raw) — any N; returns (N, classes)."""
        n = len(images)
        out = []
        for start in range(0, n, self._batch):
            chunk = images[start:start + self._batch]
            pad = self._batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            lg = self._fwd(self._params, self._state, jnp.asarray(chunk))
            out.append(np.asarray(lg[: len(images[start:start + self._batch])]))
        return np.concatenate(out)

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Top-1 class labels."""
        return np.argmax(self.logits(images), axis=-1)


def load_predictor(config, mesh=None, batch_size: Optional[int] = None,
                   verbose: bool = False) -> Predictor:
    """Build a Predictor from a run directory's latest checkpoint."""
    from pytorch_ddp_resnet_tpu.algos.train import setup

    ls = setup(config, mesh=mesh, verbose=verbose)
    if ls["global_step"] == 0 and verbose:
        print("Warning: no checkpoint found; predicting with fresh init.")
    return Predictor(
        ls["model"], ls["train_state"]["params"],
        ls["train_state"]["model_state"], ls["preprocess_fn"],
        batch_size=batch_size or config.get("batch_size", 256))
