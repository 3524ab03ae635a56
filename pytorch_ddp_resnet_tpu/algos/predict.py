"""Inference / serving surface.

The reference stops at train/eval loops; production deployment needs a
standalone predict path: load the latest classifier checkpoint, apply the
deterministic test-time pipeline, and run batched jitted inference (bf16,
padded static shapes) over the mesh.

``load_predictor(config)`` -> ``Predictor`` with:
- ``logits(images_u8_nhwc)`` / ``predict(images)`` (top-1 labels)
- arbitrary input batch sizes (internally padded to the compiled batch)
- ``fold_bn=True`` (default): eval-time BatchNorm folding for post-act
  models (models/fold.py) — weights are baked into the compiled program as
  constants so XLA fuses the residual bias-add away entirely
- ``export_bytes()`` / ``export_predictor(path)`` — AOT compile +
  serialization via ``jax.export`` (StableHLO); ``load_exported(path)``
  reloads and runs without the model/checkpoint code (ROADMAP #6 serving)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    def __init__(self, model, params, model_state, preprocess_fn,
                 batch_size: int = 256, fold_bn: bool = True):
        self._model = model
        self._batch = batch_size
        if fold_bn:
            from pytorch_ddp_resnet_tpu.models.fold import fold_batchnorm

            params, model_state, self.n_folded = fold_batchnorm(
                model, params, model_state)
        else:
            self.n_folded = 0
        self._params = params
        self._state = model_state

        def fwd(x):
            # params/state are closure constants: XLA constant-folds the
            # (neutralized) BN affines and specializes the whole program
            xp = preprocess_fn(x) if preprocess_fn else x
            logits, _ = model.apply(params, model_state, xp, train=False)
            return logits

        self._fwd_fn = fwd
        self._fwd = jax.jit(fwd)

    def logits(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W, C) uint8 (raw) — any N; returns (N, classes)."""
        n = len(images)
        out = []
        for start in range(0, n, self._batch):
            chunk = images[start:start + self._batch]
            take = len(chunk)
            pad = self._batch - take
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            lg = self._fwd(jnp.asarray(chunk))
            out.append(np.asarray(lg[:take]))
        return np.concatenate(out)

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Top-1 class labels."""
        return np.argmax(self.logits(images), axis=-1)

    # --- AOT serving ---------------------------------------------------

    def export_bytes(self) -> bytes:
        """AOT-lower the batched forward and serialize it (StableHLO via
        jax.export). The artifact embeds the folded weights as constants and
        runs on a compatible runtime without this package's model code."""
        from jax import export as jexport

        sample = self._sample_spec()
        exported = jexport.export(jax.jit(self._fwd_fn))(sample)
        return exported.serialize()

    def _sample_spec(self):
        shape = (self._batch,) + tuple(
            int(d) for d in self._input_shape())
        return jax.ShapeDtypeStruct(shape, jnp.uint8)

    def _input_shape(self):
        # the raw-uint8 per-sample input shape the preprocess pipeline expects
        if hasattr(self, "_raw_shape"):
            return self._raw_shape
        raise ValueError(
            "Predictor input shape is unknown: call set_input_shape() "
            "before export/serve (load_predictor does this from the run's "
            "data pipeline). Refusing to guess — AOT-compiling a default "
            "shape would bake the wrong input signature into the artifact.")

    def set_input_shape(self, shape):
        self._raw_shape = tuple(shape)


def export_predictor(predictor: Predictor, path: str) -> str:
    """Serialize the predictor's AOT-exported forward to ``path``."""
    data = predictor.export_bytes()
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    import os

    os.replace(tmp, path)
    return path


def load_exported(path: str):
    """Load a serialized predictor; returns ``fn(images_u8) -> logits``
    accepting exactly the exported batch shape."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda x: exported.call(jnp.asarray(x))


def load_predictor(config, mesh=None, batch_size: Optional[int] = None,
                   verbose: bool = False, fold_bn: bool = True) -> Predictor:
    """Build a Predictor from a run directory's latest checkpoint."""
    from pytorch_ddp_resnet_tpu.algos.train import setup

    ls = setup(config, mesh=mesh, verbose=verbose)
    if ls["global_step"] == 0 and verbose:
        print("Warning: no checkpoint found; predicting with fresh init.")
    pred = Predictor(
        ls["model"], ls["train_state"]["params"],
        ls["train_state"]["model_state"], ls["preprocess_fn"],
        batch_size=batch_size or config.get("batch_size", 256),
        fold_bn=fold_bn)
    # raw input shape = the test pipeline's per-sample shape (for export)
    pipe = ls["pipeline"]
    if hasattr(pipe, "test_x"):
        pred.set_input_shape(tuple(pipe.test_x.shape[1:]))
    elif hasattr(pipe, "crop_size"):
        pred.set_input_shape((pipe.crop_size, pipe.crop_size, 3))
    return pred
