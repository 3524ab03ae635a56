"""Data transforms: fitted statistics + batched on-device augmentation.

The reference applies nine composable transforms *per sample on the CPU* via
PIL/torch inside DataLoader workers (reference: resnet/utils/
transform_util.py), and fits dataset-statistic ("fittable") transforms by
streaming the dataset one image at a time (e.g. transform_util.py:58-68).
That design is exactly what SURVEY.md §7 marks for redesign: here every
transform is a *batched, jit-traceable* function on NHWC arrays, so the whole
augmentation pipeline fuses into the training step and runs on the VPU with
batched per-sample PRNG — zero per-step host work. Fitting is vectorized over
the entire dataset in a few XLA reductions instead of a Python loop.

Parity notes per transform (class names are the YAML API, data_util.py:69-77):

- ToTensorTransform: uint8 [0,255] -> float32 [0,1]. The reference also
  permutes HWC->CHW (transform_util.py:42-44); this framework is natively
  NHWC so the layout step vanishes. Shape threading stays (H, W, C)
  throughout.
- ZeroMeanWhiteningTransform / StandardizeWhiteningTransform: per-pixel
  mean (/stddev) over the train set (transform_util.py:50-109); population
  (biased) stddev like the reference's streaming formula.
- ZCAWhiteningTransform: W = U diag(1/sqrt(s+1e-2)) U^T from the SVD of the
  (biased, mean-centered) covariance; applied to the *uncentered* input,
  reproducing the reference's quirk of not subtracting the mean at apply
  time (transform_util.py:149-153). Flatten ordering is HWC (vs the
  reference's CHW); W is fit and applied in the same basis so outputs are
  identical up to that internal permutation.
- FlipTransform(p): per-sample Bernoulli(p) horizontal (width-axis) flip.
- PaddingTransform(pad_size, zero|mirror): constant-zero or reflect padding
  on H and W.
- RandomCropTransform(crop_size): per-sample uniform top-left corner, like
  torch.randint over [0, dim-crop] (transform_util.py:200-205).
- RandomScaleTransform(target_short_side): aspect-preserving bilinear resize
  of the short side. Output dims depend on the input's aspect ratio, so this
  transform is host-side only (``device_compatible=False``) and is applied
  per-sample by the streaming (ImageNet) pipeline.
- ColorTransform: AlexNet-style PCA color jitter. The reference's version
  contains two latent bugs that make it unrunnable/ill-shaped
  (``x.mean(dims=...)`` raises TypeError, transform_util.py:245; the jitter
  is broadcast over the *width* axis via reshape(1,1,3) on a CHW tensor,
  transform_util.py:265). This implementation provides the intended
  semantics: per-channel jitter eigvecs @ (alpha * eigvals), alpha ~
  N(0, 0.1^2) per sample.

Fittables carry their state as numpy arrays with the standard
state_dict/load_state_dict protocol, checkpointed under the lowercased class
name at step 1 exactly like the reference (data_util.py:79-92).
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Shape = Tuple[Optional[int], ...]


class Transform(abc.ABC):
    """A batched transform. ``data_shape`` is the per-sample input shape
    (H, W, C) threaded through the pipeline (reference data_util.py:104-105).
    """

    stochastic = False        # consumes per-sample randomness?
    device_compatible = True  # static shapes -> can fuse into the jitted step

    def __init__(self, data_shape: Shape):
        self._data_shape = tuple(data_shape)

    @property
    def data_shape(self) -> Shape:
        return self._data_shape

    @property
    def output_shape(self) -> Shape:
        return tuple(self._data_shape)

    @abc.abstractmethod
    def apply_batch(self, x, rng=None):
        """x: (B, H, W, C) jnp array; rng: key (stochastic transforms only)."""


class FittableTransform(Transform, abc.ABC):
    """A dataset-statistic transform (transform_util.py:30-33)."""

    def __init__(self, data_shape: Shape):
        super().__init__(data_shape)
        self._fitted = False

    @property
    def fitted(self) -> bool:
        return self._fitted

    @abc.abstractmethod
    def fit(self, x) -> None:
        """x: the full (or sampled) train set as one (N, H, W, C) array,
        already passed through the upstream pipeline."""

    @abc.abstractmethod
    def state_dict(self) -> Dict[str, Any]:
        ...

    @abc.abstractmethod
    def load_state_dict(self, d: Dict[str, Any]) -> None:
        ...

    def _require_fitted(self):
        if not self._fitted:
            raise RuntimeError(
                f"{type(self).__name__} must be fitted before use.")


class ToTensorTransform(Transform):
    def apply_batch(self, x, rng=None):
        return x.astype(jnp.float32) / 255.0


class ZeroMeanWhiteningTransform(FittableTransform):
    def __init__(self, data_shape):
        super().__init__(data_shape)
        self.mean = np.zeros(data_shape, np.float32)

    def fit(self, x):
        self.mean = np.asarray(jnp.mean(x, axis=0), np.float32)
        self._fitted = True

    def apply_batch(self, x, rng=None):
        self._require_fitted()
        return x - jnp.asarray(self.mean)

    def state_dict(self):
        return {"mean": self.mean, "fitted": np.asarray(self._fitted)}

    def load_state_dict(self, d):
        self.mean = np.asarray(d["mean"], np.float32)
        self._fitted = bool(d["fitted"])


class StandardizeWhiteningTransform(FittableTransform):
    def __init__(self, data_shape):
        super().__init__(data_shape)
        self.mean = np.zeros(data_shape, np.float32)
        self.stddev = np.ones(data_shape, np.float32)

    def fit(self, x):
        mean = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mean), axis=0)  # population variance
        self.mean = np.asarray(mean, np.float32)
        self.stddev = np.asarray(jnp.sqrt(var), np.float32)
        self._fitted = True

    def apply_batch(self, x, rng=None):
        self._require_fitted()
        return (x - jnp.asarray(self.mean)) / jnp.asarray(self.stddev)

    def state_dict(self):
        return {"mean": self.mean, "stddev": self.stddev,
                "fitted": np.asarray(self._fitted)}

    def load_state_dict(self, d):
        self.mean = np.asarray(d["mean"], np.float32)
        self.stddev = np.asarray(d["stddev"], np.float32)
        self._fitted = bool(d["fitted"])


class ZCAWhiteningTransform(FittableTransform):
    def __init__(self, data_shape, eps: float = 1e-2):
        super().__init__(data_shape)
        self._eps = eps
        d = int(np.prod(data_shape))
        self._dim = d
        self.zca_matrix = np.zeros((d, d), np.float32)

    def fit(self, x):
        n = x.shape[0]
        flat = jnp.reshape(x, (n, -1)).astype(jnp.float32)
        mean = jnp.mean(flat, axis=0)
        centered = flat - mean
        cov = (centered.T @ centered) / n  # biased, matching the reference
        u, s, _ = jnp.linalg.svd(cov, hermitian=True)
        w = (u * jax.lax.rsqrt(s + self._eps)) @ u.T
        self.zca_matrix = np.asarray(w, np.float32)
        self._fitted = True

    def apply_batch(self, x, rng=None):
        self._require_fitted()
        b = x.shape[0]
        flat = jnp.reshape(x, (b, -1))
        # reference applies W @ x to the *uncentered* sample (quirk preserved)
        white = flat @ jnp.asarray(self.zca_matrix).T
        return jnp.reshape(white, (b,) + tuple(self._data_shape))

    def state_dict(self):
        return {"zca_matrix": self.zca_matrix, "fitted": np.asarray(self._fitted)}

    def load_state_dict(self, d):
        self.zca_matrix = np.asarray(d["zca_matrix"], np.float32)
        self._fitted = bool(d["fitted"])


class FlipTransform(Transform):
    stochastic = True

    def __init__(self, data_shape, p: float):
        super().__init__(data_shape)
        self._p = float(p)

    def apply_batch(self, x, rng=None):
        flip = jax.random.bernoulli(rng, self._p, (x.shape[0],))
        return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


class PaddingTransform(Transform):
    def __init__(self, data_shape, pad_size: int, pad_type: str):
        if pad_type not in ("zero", "mirror"):
            raise ValueError("pad_type must be 'zero' or 'mirror'.")
        super().__init__(data_shape)
        self._pad_size = int(pad_size)
        self._pad_type = pad_type

    @property
    def output_shape(self):
        h, w, c = self._data_shape
        p = self._pad_size
        return (h + 2 * p, w + 2 * p, c)

    def apply_batch(self, x, rng=None):
        p = self._pad_size
        widths = ((0, 0), (p, p), (p, p), (0, 0))
        if self._pad_type == "mirror":
            return jnp.pad(x, widths, mode="reflect")
        return jnp.pad(x, widths, mode="constant")


class RandomCropTransform(Transform):
    stochastic = True

    def __init__(self, data_shape, crop_size: int):
        super().__init__(data_shape)
        self._crop_size = int(crop_size)

    @property
    def output_shape(self):
        c = self._data_shape[-1]
        return (self._crop_size, self._crop_size, c)

    def apply_batch(self, x, rng=None):
        b, h, w, c = x.shape
        cs = self._crop_size
        t_rng, l_rng = jax.random.split(rng)
        tops = jax.random.randint(t_rng, (b,), 0, h - cs + 1)
        lefts = jax.random.randint(l_rng, (b,), 0, w - cs + 1)

        def crop_one(img, t, l):
            return jax.lax.dynamic_slice(img, (t, l, 0), (cs, cs, c))

        return jax.vmap(crop_one)(x, tops, lefts)


class RandomScaleTransform(Transform):
    """Aspect-preserving short-side resize; host-side (dynamic output dims)."""

    stochastic = False
    device_compatible = False

    def __init__(self, data_shape, target_short_side: int):
        super().__init__(data_shape)
        self._target = int(target_short_side)

    @property
    def output_shape(self):
        c = self._data_shape[-1]
        return (None, None, c)

    def apply_batch(self, x, rng=None):
        raise RuntimeError(
            "RandomScaleTransform produces per-sample dynamic shapes and "
            "must be applied by the host-side streaming pipeline "
            "(apply_single).")

    def apply_single(self, img: np.ndarray) -> np.ndarray:
        """img: (H, W, C) float; bilinear resize so min(H', W') == target."""
        h, w, c = img.shape
        if h <= w:
            nh, nw = self._target, int(round(self._target / h * w))
        else:
            nh, nw = int(round(self._target / w * h)), self._target
        out = jax.image.resize(jnp.asarray(img), (nh, nw, c), method="bilinear")
        return np.asarray(out)


class CenterCropTransform(Transform):
    """Deterministic center crop. Extension beyond the reference: its
    transform library has no center crop, so its ImageNet eval would have
    used a *random* crop (transform_util.py has only RandomCropTransform);
    standard top-1/top-5 protocol needs scale + center crop."""

    def __init__(self, data_shape, crop_size: int):
        super().__init__(data_shape)
        self._crop_size = int(crop_size)

    @property
    def output_shape(self):
        c = self._data_shape[-1]
        return (self._crop_size, self._crop_size, c)

    def apply_batch(self, x, rng=None):
        b, h, w, c = x.shape
        cs = self._crop_size
        t, l = (h - cs) // 2, (w - cs) // 2
        return x[:, t:t + cs, l:l + cs, :]


class ColorTransform(FittableTransform):
    stochastic = True

    def __init__(self, data_shape, alpha_std: float = 0.1):
        super().__init__(data_shape)
        self._alpha_std = float(alpha_std)
        self.eigenvals = np.zeros((3,), np.float32)
        self.eigenvecs = np.zeros((3, 3), np.float32)

    def fit(self, x):
        # per-image channel means -> covariance over the dataset
        chan = jnp.mean(x, axis=(1, 2))  # (N, 3)
        mean = jnp.mean(chan, axis=0)
        centered = chan - mean
        cov = (centered.T @ centered) / chan.shape[0]
        vals, vecs = jnp.linalg.eigh(cov)
        self.eigenvals = np.asarray(vals, np.float32)
        self.eigenvecs = np.asarray(vecs, np.float32)
        self._fitted = True

    def apply_batch(self, x, rng=None):
        self._require_fitted()
        b = x.shape[0]
        alphas = self._alpha_std * jax.random.normal(rng, (b, 3))
        jitter = (alphas * jnp.asarray(self.eigenvals)) @ jnp.asarray(
            self.eigenvecs).T  # (B, 3)
        return x + jitter[:, None, None, :]

    def state_dict(self):
        return {"eigenvals": self.eigenvals, "eigenvecs": self.eigenvecs,
                "fitted": np.asarray(self._fitted)}

    def load_state_dict(self, d):
        self.eigenvals = np.asarray(d["eigenvals"], np.float32)
        self.eigenvecs = np.asarray(d["eigenvecs"], np.float32)
        self._fitted = bool(d["fitted"])


TRANSFORM_REGISTRY = {
    "ToTensorTransform": ToTensorTransform,
    "ZeroMeanWhiteningTransform": ZeroMeanWhiteningTransform,
    "StandardizeWhiteningTransform": StandardizeWhiteningTransform,
    "ZCAWhiteningTransform": ZCAWhiteningTransform,
    "FlipTransform": FlipTransform,
    "PaddingTransform": PaddingTransform,
    "RandomCropTransform": RandomCropTransform,
    "RandomScaleTransform": RandomScaleTransform,
    "CenterCropTransform": CenterCropTransform,
    "ColorTransform": ColorTransform,
}


def get_transform_cls(transform_cls_name: str):
    if transform_cls_name not in TRANSFORM_REGISTRY:
        raise ValueError(
            f"Unknown transform {transform_cls_name!r}; "
            f"available: {sorted(TRANSFORM_REGISTRY)}")
    return TRANSFORM_REGISTRY[transform_cls_name]


def make_batch_augment_fn(transforms: Sequence[Transform]):
    """Compose a transform list into one jit-traceable (x, rng) -> x function
    — the fused on-device pipeline that replaces torchvision Compose
    (data_util.py:141-147). All transforms must be device-compatible."""
    for t in transforms:
        if not t.device_compatible:
            raise ValueError(
                f"{type(t).__name__} cannot run on device; use the streaming "
                f"pipeline for it.")
        if isinstance(t, FittableTransform):
            t._require_fitted()
    ts = list(transforms)

    def augment(x, rng):
        for i, t in enumerate(ts):
            x = t.apply_batch(x, jax.random.fold_in(rng, i) if t.stochastic
                              else None)
        return x

    return augment
