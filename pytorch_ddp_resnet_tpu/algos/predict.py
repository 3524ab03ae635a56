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
        self._preprocess = preprocess_fn
        # pre-fold pytrees: quantize_int8 computes BN eval affines itself
        # (folding them into the dequant scales), so it starts from these
        self._orig = (params, model_state)
        self.n_quantized = 0
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
            # (neutralized) BN affines and specializes the whole program.
            # Used for export (local lowering — no compile-size limit).
            xp = preprocess_fn(x) if preprocess_fn else x
            logits, _ = model.apply(params, model_state, xp, train=False)
            return logits

        self._fwd_fn = fwd

        # The SERVING jit passes the weights as device-buffer ARGUMENTS:
        # closure-jitting an ImageNet-scale program exceeds the tunnel's
        # compile-request size (HTTP 413 at WRN-50-2 @224 — 68.9M params
        # of program text; see models/quantize.py serve_args_fn).
        def fwd_args(p, st, x):
            xp = preprocess_fn(x) if preprocess_fn else x
            logits, _ = model.apply(p, st, xp, train=False)
            return logits

        fwd_jit = jax.jit(fwd_args)
        self._fwd = lambda x: fwd_jit(self._params, self._state, x)

    def quantize_int8(self, calib_images: np.ndarray,
                      fused_bneck="nv") -> int:
        """Switch the serving forward to the w8a8 post-training-quantized
        path (models/quantize.py): eligible 3x3 convs run int8 x int8 on
        the MXU's 2x-rate mode via the lane-packed Pallas kernel.

        calib_images: raw uint8 NHWC images (ideally >= one serving batch,
        e.g. a slice of the training set) used to calibrate per-conv
        activation scales through the float path. Calibration runs at the
        serving batch geometry, so scale placement and int8 eligibility
        match the compiled program exactly. fused_bneck: "nv" (the
        DEFAULT since round 5) routes eligible bottleneck blocks
        (identity AND transition) through the fused NV-layout int8
        trunk (ops/pallas/bneck_nv.py); False selects plain XLA int8
        dots. The default flip is accuracy-gated on trained post-act
        checkpoints of both README ImageNet configs (tools/
        eval_nv_gate.py: r50 1.051x / wrn-50-2 1.175x vs float, top-1
        agreement 0.9997, err_delta <= -0.0003 i.e. no worse than
        float — ACCURACY.md round 5). Models with no NV-eligible
        blocks (all CIFAR basic trunks) are unaffected.

        Returns the number of quantized convs; raises ValueError when the
        model has no int8-eligible blocks (channel counts not divisible by
        32, e.g. v1 CIFAR nets) — callers should keep the float path then.
        """
        from pytorch_ddp_resnet_tpu.models.quantize import (
            Int8Inference, calibrate)

        params, state = self._orig
        inf = Int8Inference(self._model, params, state,
                            fused_bneck=fused_bneck)
        pre = self._preprocess
        pre_jit = jax.jit(pre) if pre else (lambda x: x)
        batches = [pre_jit(jnp.asarray(chunk))
                   for chunk in self._padded_chunks(calib_images)]
        scales = calibrate(inf, batches)
        if not scales:
            raise ValueError(
                "int8 quantization: no eligible convs in this model "
                "(needs basic residual blocks with identity shortcuts and "
                "channel counts divisible by 32).")
        # serve_args_fn (weights as device-buffer ARGUMENTS): closure-jitting
        # an ImageNet-scale program exceeds the tunnel's compile-request
        # size (HTTP 413 at ResNet-50 @224; quantize.py serve_fn docstring).
        # It is already jitted — the preprocess rides a separate small jit.
        serve = inf.serve_args_fn(scales)

        def fwd(x):
            return serve(pre_jit(x) if pre else x)

        self._fwd_fn = fwd
        self._fwd = fwd
        self.n_quantized = len(scales)
        return len(scales)

    def _padded_chunks(self, images: np.ndarray):
        """Yield images in serving-batch-sized chunks, last one padded by
        repeating its final sample (the same padding logits() applies)."""
        for start in range(0, len(images), self._batch):
            chunk = images[start:start + self._batch]
            pad = self._batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            yield chunk

    def logits(self, images: np.ndarray) -> np.ndarray:
        """images: (N, H, W, C) uint8 (raw) — any N; returns (N, classes)."""
        n = len(images)
        out = [np.asarray(self._fwd(jnp.asarray(chunk)))
               for chunk in self._padded_chunks(images)]
        return np.concatenate(out)[:n]

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
                   verbose: bool = False, fold_bn: bool = True,
                   quantize: Optional[str] = None,
                   calib_samples: int = 512) -> Predictor:
    """Build a Predictor from a run directory's latest checkpoint.

    quantize='int8' additionally calibrates and switches to the w8a8
    post-training-quantized serving path, drawing ``calib_samples`` raw
    training images from the run's own (resident) data pipeline.
    """
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
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"Unknown quantize mode {quantize!r}.")
        if not hasattr(pipe, "train_x"):
            raise ValueError(
                "quantize='int8' needs a resident pipeline to draw "
                "calibration images from; pass calibration data to "
                "Predictor.quantize_int8() directly for streaming runs.")
        calib = np.asarray(pipe.train_x[:max(calib_samples, 1)])
        n = pred.quantize_int8(calib)
        if verbose:
            print(f"int8-quantized {n} convs "
                  f"({len(calib)} calibration images).")
    return pred
