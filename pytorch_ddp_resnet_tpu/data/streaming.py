"""Streaming input pipeline for datasets that don't fit in HBM (ImageNet).

The reference feeds ImageNet through torchvision's ImageFolder + DataLoader
workers doing per-sample PIL decode and torch transforms (reference:
data_util.py:27-38 ImageNet special case, transform_util.py RandomScale).
TPU-natively the pipeline splits at the first shape-dynamic transform:

- host side (worker threads): JPEG decode, aspect-preserving short-side
  resize (``RandomScaleTransform``), and the crop that restores a static
  shape — all in uint8 numpy;
- device side: the remaining batched transforms (ToTensor scaling, flip,
  PCA color, whitening) fused into the jitted train step, exactly like the
  resident pipeline.

Batches are assembled by a thread pool and pushed to the device with a
double-buffered prefetch queue so the step never waits on input
(SURVEY.md §7 "input-pipeline overlap"). Eval uses deterministic center
crops and masked padding for exact metrics.

Fittable statistics stream over a bounded sample of the train set with
chunked accumulation (the reference's one-image-at-a-time Python loop over
1.28M images is its own denial of service; ``fit_sample_limit`` documents
the deliberate divergence).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from pytorch_ddp_resnet_tpu.data.datasets import ImageFolderDataset
from pytorch_ddp_resnet_tpu.data.transforms import (
    RandomScaleTransform,
    Transform,
)
from pytorch_ddp_resnet_tpu.parallel.mesh import (
    batch_sharding,
    process_local_extent,
    put_process_local,
)


def _native():
    """The C++ fast path (JPEG decode + bilinear resize), or None.

    Bit-identical to the PIL path (tests/test_native.py), so which path runs
    never affects fitted statistics, crops, or eval numbers.
    """
    from pytorch_ddp_resnet_tpu import native

    return native.load()


def _decode_pil(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _decode_image(path: str) -> np.ndarray:
    fi = _native()
    ext = path.lower()
    if fi is not None and ext.endswith((".jpg", ".jpeg", ".png")):
        decode = fi.decode_png if ext.endswith(".png") else fi.decode_jpeg
        try:
            with open(path, "rb") as f:
                pix, h, w = decode(f.read())
            return np.frombuffer(pix, np.uint8).reshape(h, w, 3)
        except ValueError:
            pass  # exotic color space (CMYK jpeg, alpha png) -> PIL
    return _decode_pil(path)


def _resize_short_side(img: np.ndarray, target: int) -> np.ndarray:
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = target, max(1, int(round(target / h * w)))
    else:
        nh, nw = max(1, int(round(target / w * h))), target
    fi = _native()
    if fi is not None:
        # a C-contiguous ndarray satisfies the y* buffer protocol directly
        # (no .tobytes() copy on this per-sample hot path)
        return np.frombuffer(
            fi.resize_bilinear(np.ascontiguousarray(img), h, w, nh, nw),
            np.uint8).reshape(nh, nw, 3)
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR), dtype=np.uint8)


def _random_crop(img: np.ndarray, size: int, rng: np.random.Generator):
    h, w = img.shape[:2]
    t = int(rng.integers(0, h - size + 1))
    l = int(rng.integers(0, w - size + 1))
    return img[t:t + size, l:l + size]


def _center_crop(img: np.ndarray, size: int):
    h, w = img.shape[:2]
    t, l = (h - size) // 2, (w - size) // 2
    return img[t:t + size, l:l + size]


def split_host_device_transforms(
    transforms: Sequence[Transform],
) -> Tuple[List[Transform], List[Transform], Optional[int]]:
    """Partition an ordered pipeline into (host, device, crop_size).

    Host side = the shape-dynamic resizes (RandomScaleTransform) plus the
    first crop after the last resize (it restores a static shape). Every
    other transform keeps its original relative order on the device side.
    Moving e.g. a leading ToTensor after the host crop only reorders /255
    against a uint8 bilinear resize — equal up to rounding.
    """
    from pytorch_ddp_resnet_tpu.data.transforms import (
        CenterCropTransform,
        RandomCropTransform,
    )

    ts = list(transforms)
    scale_idx = [i for i, t in enumerate(ts)
                 if isinstance(t, RandomScaleTransform)]
    if not scale_idx:
        return [], ts, None
    crop_i = next(
        (i for i in range(scale_idx[-1] + 1, len(ts))
         if isinstance(ts[i], (RandomCropTransform, CenterCropTransform))),
        None)
    if crop_i is None:
        raise ValueError(
            "A RandomScaleTransform pipeline needs a crop after the resize "
            "to restore a static shape for batching.")
    host_is = set(scale_idx) | {crop_i}
    host = [t for i, t in enumerate(ts) if i in host_is]
    device = [t for i, t in enumerate(ts) if i not in host_is]
    return host, device, int(ts[crop_i]._crop_size)


class HostSampleProcessor:
    """Per-sample uint8 host path: decode -> (scale...) -> crop."""

    def __init__(self, host_transforms: Sequence[Transform],
                 crop_size: Optional[int], random_crop: bool, seed: int = 0,
                 dct_scale: bool = False):
        self.scale_targets = [t._target for t in host_transforms
                              if isinstance(t, RandomScaleTransform)]
        self.crop_size = crop_size
        self.random_crop = random_crop
        self.seed = seed
        # DCT-domain downscale (native path only): decode big JPEGs at the
        # smallest M/8 IDCT scale whose short side still covers the first
        # resize target; the exact bilinear then runs on ~(M/8)^2 of the
        # pixels. Alters delivered pixels (high frequencies above the
        # target Nyquist) — accuracy-gated per ACCURACY.md's streaming
        # gate rule before any default flip.
        self.dct_scale = dct_scale

    def _decode_and_scale(self, path: str) -> np.ndarray:
        fi = _native()
        if fi is not None and path.lower().endswith((".jpg", ".jpeg")):
            # fused native call: decode + every short-side resize under one
            # GIL release, so decode workers scale across cores
            try:
                min_short = (self.scale_targets[0]
                             if self.dct_scale and self.scale_targets else 0)
                with open(path, "rb") as f:
                    pix, h, w = fi.decode_resize_jpeg(
                        f.read(), tuple(self.scale_targets), min_short)
                return np.frombuffer(pix, np.uint8).reshape(h, w, 3)
            except ValueError:
                # exotic color space: go straight to PIL — _decode_image
                # would retry the native decode that just failed
                img = _decode_pil(path)
        else:
            img = _decode_image(path)
        for target in self.scale_targets:
            img = _resize_short_side(img, target)
        return img

    def __call__(self, path: str, epoch: int, index: int) -> np.ndarray:
        img = self._decode_and_scale(path)
        rng = np.random.default_rng([self.seed, int(epoch), int(index)])
        if self.crop_size is not None:
            # guard: upscale if any side is still smaller than the crop
            if min(img.shape[:2]) < self.crop_size:
                img = _resize_short_side(img, self.crop_size)
            if self.random_crop:
                img = _random_crop(img, self.crop_size, rng)
            else:
                img = _center_crop(img, self.crop_size)
        return img


class StreamingPipeline:
    """Folder dataset -> prefetched device batches.

    API mirrors ResidentPipeline where it matters to the loops:
    ``steps_per_epoch``, ``train_batches(epoch)`` yielding device (x, y),
    ``eval_batches()`` yielding device (x, y, mask).
    """

    def __init__(
        self,
        dataset_train: ImageFolderDataset,
        dataset_test: ImageFolderDataset,
        mesh,
        batch_size: int,
        crop_size: int,
        host_transforms_train: Sequence[Transform],
        host_transforms_test: Sequence[Transform],
        random_crop_train: bool = True,
        random_crop_test: bool = False,
        num_microbatches: int = 1,
        num_workers: int = 8,
        prefetch_depth: int = 2,
        shuffle_seed: int = 0,
        dct_scale: bool = False,
    ):
        if batch_size % num_microbatches != 0:
            raise ValueError("batch_size must divide by num_microbatches.")
        if (batch_size // num_microbatches) % mesh.size != 0:
            raise ValueError(
                f"Per-microbatch size {batch_size // num_microbatches} must "
                f"divide across the {mesh.size}-device mesh.")
        self.mesh = mesh
        self.batch_size = batch_size
        self.num_microbatches = num_microbatches
        self.crop_size = crop_size
        self.train_ds = dataset_train
        self.test_ds = dataset_test
        self.shuffle_seed = shuffle_seed
        self.prefetch_depth = prefetch_depth
        self._sharding = batch_sharding(mesh)
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._proc_train = HostSampleProcessor(
            host_transforms_train, crop_size=crop_size,
            random_crop=random_crop_train, seed=shuffle_seed,
            dct_scale=dct_scale)
        self._proc_test = HostSampleProcessor(
            host_transforms_test, crop_size=crop_size,
            random_crop=random_crop_test, seed=shuffle_seed,
            dct_scale=dct_scale)

    @property
    def steps_per_epoch(self) -> int:
        return -(-len(self.train_ds) // self.batch_size)

    def _assemble(self, paths, labels, proc, epoch, indices):
        # The per-sample RNG identity is the *dataset* index, so two samples
        # sharing a batch slot across batches never share crop randomness
        # (each sample appears once per epoch, so (epoch, index) is unique).
        imgs = list(self._pool.map(
            lambda di: proc(paths[di], epoch, di), indices))
        x = np.stack(imgs)
        y = labels[list(indices)].astype(np.int32)
        return x, y

    def _prefetch(self, batch_iter) -> Iterator:
        """Run batch assembly ahead of consumption; device_put eagerly so the
        H2D copy overlaps the running step. Producer exceptions re-raise in
        the consumer (no silent truncation). If the consumer abandons the
        generator mid-epoch (e.g. training stops at max_steps), the finally
        block signals the producer, whose bounded-queue puts poll the signal —
        no thread or prefetched-batch leak."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        stop = object()
        abandoned = threading.Event()

        def put(item) -> bool:
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in batch_iter:
                    if not put(item):
                        return
                put(stop)
            except BaseException as e:  # noqa: BLE001 — relayed, not dropped
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            abandoned.set()

    def train_batches(self, epoch: int):
        """Yields device-put (x (M, mb, H, W, C) uint8, y (M, mb)) batches.

        Multi-host: every host computes the identical epoch permutation (same
        seed), but each host decodes only the slice of every microbatch its
        own devices consume — no redundant full-batch decode on pods
        (SURVEY.md §5.8: the DistributedSampler replacement)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = len(self.train_ds)
        rng = np.random.default_rng([self.shuffle_seed, int(epoch)])
        perm = rng.permutation(n)
        total = self.steps_per_epoch * self.batch_size
        if total > n:
            perm = np.resize(perm, total)  # wrap/tile to whole batches
        mb = self.batch_size // self.num_microbatches
        M = self.num_microbatches
        sharding = NamedSharding(self.mesh, P(None, "data"))
        hwc = (self.crop_size, self.crop_size, 3)
        # the microbatch dim (axis 1) is the sharded one
        lo, hi = process_local_extent(sharding, (M, mb) + hwc, axis=1)

        def produce():
            for b in range(self.steps_per_epoch):
                sel = perm[b * self.batch_size:(b + 1) * self.batch_size]
                sel = sel.reshape(M, mb)[:, lo:hi].reshape(-1)
                x, y = self._assemble(self.train_ds.paths,
                                      self.train_ds.labels,
                                      self._proc_train, epoch, sel)
                x = x.reshape(M, hi - lo, *x.shape[1:])
                y = y.reshape(M, hi - lo)
                yield (put_process_local(x, sharding, (M, mb) + hwc),
                       put_process_local(y, sharding, (M, mb)))

        yield from self._prefetch(produce())

    def eval_batches(self):
        """Yields device-put (x, y, mask) covering the test set exactly."""
        n = len(self.test_ds)
        bs = self.batch_size
        hwc = (self.crop_size, self.crop_size, 3)
        lo, hi = process_local_extent(self._sharding, (bs,) + hwc, axis=0)

        def produce():
            for start in range(0, n, bs):
                idx = np.arange(start, min(start + bs, n))
                pad = bs - len(idx)
                mask = np.ones((bs,), np.float32)
                if pad:
                    mask[len(idx):] = 0.0
                    idx = np.concatenate(
                        [idx, np.full((pad,), idx[-1], idx.dtype)])
                sel = idx[lo:hi]
                # pad slots all duplicate one sample: decode it once and
                # tile, instead of bs-1 redundant decodes on the final batch
                n_real = int(np.sum(mask[lo:hi] > 0))
                if n_real == len(sel):
                    x, y = self._assemble(self.test_ds.paths,
                                          self.test_ds.labels,
                                          self._proc_test, 0, sel)
                else:
                    parts = []
                    if n_real:
                        parts.append(self._assemble(
                            self.test_ds.paths, self.test_ds.labels,
                            self._proc_test, 0, sel[:n_real]))
                    pad1 = self._assemble(
                        self.test_ds.paths, self.test_ds.labels,
                        self._proc_test, 0, sel[n_real:n_real + 1])
                    reps = len(sel) - n_real
                    parts.append((np.repeat(pad1[0], reps, axis=0),
                                  np.repeat(pad1[1], reps, axis=0)))
                    x = np.concatenate([p[0] for p in parts])
                    y = np.concatenate([p[1] for p in parts])
                y = np.where(mask[lo:hi] > 0, y, 0).astype(np.int32)
                yield (put_process_local(x, self._sharding, (bs,) + hwc),
                       put_process_local(y, self._sharding, (bs,)),
                       put_process_local(mask[lo:hi], self._sharding, (bs,)))

        yield from self._prefetch(produce())

    def fit_sample(self, limit: int = 65536) -> np.ndarray:
        """A decoded, cropped uint8 sample of the train set for fitting
        downstream statistics transforms."""
        n = min(len(self.train_ds), limit)
        rng = np.random.default_rng(self.shuffle_seed)
        sel = rng.choice(len(self.train_ds), size=n, replace=False)
        x, _ = self._assemble(self.train_ds.paths, self.train_ds.labels,
                              self._proc_train, 0, sel)
        return x

    # --- uniform pipeline interface (shared with ResidentPipeline) ---------

    def bind_train_step(self, base_step, pass_indices: bool = False):
        if pass_indices:
            raise ValueError(
                "pass_indices (Pallas fused gather) requires a resident "
                "dataset; the streaming pipeline feeds images directly.")
        return base_step  # feed is (x, y) directly

    def bind_eval_step(self, base_eval):
        return base_eval

    # streaming feeds carry NO chunk dim: training_loop must not route them
    # through the chunked scan (decode-bound anyway)
    supports_chunking = False

    def train_feed(self, epoch: int, chunk: int = 1,
                   budget: Optional[int] = None):
        """Yields (1, (x, y)) — the streaming path is decode-bound, not
        dispatch-bound, so steps_per_dispatch chunking is a no-op here.
        ``budget`` stops the feed (and its prefetch decoding) once the
        loop's remaining step count is exhausted."""
        for i, batch in enumerate(self.train_batches(epoch)):
            if budget is not None and i >= budget:
                return
            yield 1, batch

    def eval_feed(self):
        yield from self.eval_batches()


def build_streaming_data(
    dataset_train: ImageFolderDataset,
    dataset_test: ImageFolderDataset,
    data_aug_train: Dict[str, Dict[str, Any]],
    data_aug_test: Dict[str, Dict[str, Any]],
    checkpoint_dir: str,
    mesh,
    batch_size: int,
    num_microbatches: int = 1,
    num_workers: int = 8,
    shuffle_seed: int = 0,
    fit_sample_limit: int = 65536,
    dct_scale: bool = False,
    verbose: bool = False,
):
    """Construct the streaming pipeline + fitted device transform functions
    for a folder dataset.

    Mirrors build_transforms' fit-then-checkpoint contract
    (data_util.py:79-92): device-side fittables restore from
    ``{name.lower()}_1.ckpt`` when present, else fit on a bounded
    host-processed sample of the train set and checkpoint.

    Returns (pipeline, augment_fn, preprocess_fn, sample_shape).
    """
    from collections import OrderedDict

    from pytorch_ddp_resnet_tpu.data.transforms import (
        FittableTransform,
        RandomCropTransform,
        get_transform_cls,
        make_batch_augment_fn,
    )
    from pytorch_ddp_resnet_tpu.utils.checkpoint import (
        maybe_load_checkpoint,
        save_checkpoint,
    )

    import jax.numpy as jnp

    def instantiate(data_aug, initial_shape):
        out = OrderedDict()
        shape = initial_shape
        for name, kwargs in (data_aug or {}).items():
            t = get_transform_cls(name)(shape, **(kwargs or {}))
            out[name] = t
            shape = t.output_shape
        return out, shape

    # decoded ImageNet images have per-sample dynamic (H, W); C is 3
    initial_shape = (None, None, 3)
    train_ts, sample_shape = instantiate(data_aug_train, initial_shape)
    test_ts, test_shape = instantiate(data_aug_test, initial_shape)
    if None in tuple(sample_shape):
        raise ValueError(
            f"Train pipeline must end with a static shape; got {sample_shape}.")

    host_train, device_train, crop_train = split_host_device_transforms(
        list(train_ts.values()))
    host_test, device_test, crop_test = split_host_device_transforms(
        list(test_ts.values()))
    if crop_train != crop_test and crop_test is not None and crop_train is not None:
        raise ValueError("Train and test crops must agree in size for a "
                         "shared model input shape.")

    def is_random(host):
        return any(isinstance(t, RandomCropTransform) for t in host)

    pipeline = StreamingPipeline(
        dataset_train, dataset_test, mesh,
        batch_size=batch_size, crop_size=crop_train,
        host_transforms_train=host_train, host_transforms_test=host_test,
        random_crop_train=is_random(host_train),
        random_crop_test=is_random(host_test),
        num_microbatches=num_microbatches, num_workers=num_workers,
        shuffle_seed=shuffle_seed, dct_scale=dct_scale)

    # fit device-side fittables on a host-processed sample
    fit_x = None
    train_by_name = {name: t for name, t in train_ts.items()}
    for name, t in train_ts.items():
        if not isinstance(t, FittableTransform):
            continue
        step = maybe_load_checkpoint(checkpoint_dir, name.lower(), t,
                                     verbose=verbose)
        if step == 0:
            if fit_x is None:
                fit_x = jnp.asarray(pipeline.fit_sample(fit_sample_limit))
            prefix = []
            for dt in device_train:
                if dt is t:
                    break
                prefix.append(dt)
            x = fit_x
            import jax as _jax

            for i, pt in enumerate(prefix):
                x = pt.apply_batch(
                    x, _jax.random.fold_in(_jax.random.key(0), i)
                    if pt.stochastic else None)
            t.fit(x)
            save_checkpoint(checkpoint_dir, name.lower(), t, steps=1)

    # test pipeline reuses fitted train instances (data_util.py:93-102)
    for name in list(test_ts):
        if isinstance(test_ts[name], FittableTransform):
            if name not in train_by_name or not isinstance(
                    train_by_name[name], FittableTransform):
                raise ValueError(
                    "Fittable test transform not in reusable_transforms.")
            test_ts[name] = train_by_name[name]
    _, device_test, _ = split_host_device_transforms(list(test_ts.values()))

    augment_fn = make_batch_augment_fn(device_train)
    test_fn = make_batch_augment_fn(device_test)

    import jax as _jax

    def preprocess_fn(x):
        return test_fn(x, _jax.random.key(0))

    return pipeline, augment_fn, preprocess_fn, tuple(sample_shape)
