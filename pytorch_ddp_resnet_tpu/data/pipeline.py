"""Input pipelines: transform building/fitting + batching/sharding.

Replaces three reference components at once (SURVEY.md §2.1 row 6):

- ``_get_transforms`` (data_util.py:48-106): ordered YAML-driven transform
  construction with shape threading, fit-then-checkpoint of fittable
  transforms on the train set, and train-instance reuse at test time;
- ``DistributedSampler`` (data_util.py:155-190): per-epoch seeded shuffling
  and padding to a whole number of global batches;
- ``DataLoader`` (data_util.py:193-232): batch assembly.

TPU-native difference: for array datasets (CIFAR-sized), the raw uint8
dataset lives *resident in device HBM*, replicated across the mesh; a train
step consumes only a small index array, gathers its batch on device, and runs
the fused augmentation inside the same XLA program. Host->device image
traffic per step: zero (the reference copies every microbatch,
training.py:94).

Batching semantics vs the reference: the reference's DataLoader yields a
short final batch (drop_last=False); XLA needs static shapes, so the train
sampler pads the final batch by wrapping around the epoch's permutation
(every sample still seen once, a few seen twice — same scheme
DistributedSampler itself uses to pad to world_size). Evaluation pads with
explicitly *masked* samples instead, giving exact sample-weighted metrics
(fixing the reference's padded-mean approximation, SURVEY.md §3.3).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.data.datasets import ArrayDataset
from pytorch_ddp_resnet_tpu.data.transforms import (
    FittableTransform,
    Transform,
    get_transform_cls,
    make_batch_augment_fn,
)
from pytorch_ddp_resnet_tpu.parallel.mesh import (
    batch_sharding,
    put_global,
    replicated_sharding,
)
from pytorch_ddp_resnet_tpu.utils.checkpoint import (
    maybe_load_checkpoint,
    save_checkpoint,
)


# --- transform building / fitting ------------------------------------------


def _apply_prefix(transforms: Sequence[Transform], x: jnp.ndarray) -> jnp.ndarray:
    """Run the upstream pipeline over a whole dataset array, the vectorized
    analog of the reference rebuilding the dataset with transforms-so-far
    before each fit (data_util.py:70-74). A stochastic transform ahead of a
    fittable one (e.g. flip before PCA color fitting in an AlexNet-style
    recipe) is applied with a FIXED key: the fitted statistics stay
    deterministic across hosts/restarts, unlike the reference, which would
    re-sample augmentation randomness inside fit."""
    import jax

    for i, t in enumerate(transforms):
        x = t.apply_batch(
            x, jax.random.fold_in(jax.random.key(0), i) if t.stochastic
            else None)
    return x


def build_transforms(
    dataset: ArrayDataset,
    data_aug: Dict[str, Dict[str, Any]],
    checkpoint_dir: str,
    is_train: bool,
    reusable_transforms: Optional["OrderedDict[str, Transform]"] = None,
    fit_chunk: int = 65536,
    verbose: bool = False,
) -> "OrderedDict[str, Transform]":
    """Build the ordered transform pipeline for one split
    (reference: data_util.py:48-106).

    Train split: fittables are restored from ``{name.lower()}_1.ckpt`` if
    present, else fitted on the train set (through the upstream deterministic
    pipeline) and checkpointed at step 1 (data_util.py:79-92).
    Test split: fittables must come from ``reusable_transforms`` (the train
    pipeline) with a matching input shape (data_util.py:93-102).
    """
    transforms: "OrderedDict[str, Transform]" = OrderedDict()
    data_shape = dataset.data_shape
    reusable = reusable_transforms or OrderedDict()

    for name, kwargs in (data_aug or {}).items():
        cls = get_transform_cls(name)
        transform = cls(data_shape, **(kwargs or {}))
        if isinstance(transform, FittableTransform):
            if is_train:
                step = maybe_load_checkpoint(
                    checkpoint_dir, name.lower(), transform, verbose=verbose)
                if step == 0:
                    x = _fit_input(dataset, list(transforms.values()), fit_chunk)
                    transform.fit(x)
                    save_checkpoint(checkpoint_dir, name.lower(), transform,
                                    steps=1)
            else:
                if name not in reusable:
                    raise ValueError(
                        "Fittable test transform not in reusable_transforms.")
                transform = reusable[name]
                if tuple(transform.data_shape) != tuple(data_shape):
                    raise ValueError(
                        "Input shape mismatch on reusable transform.")
        transforms[name] = transform
        data_shape = transform.output_shape
    return transforms


def _fit_input(dataset: ArrayDataset, prefix: List[Transform], chunk: int):
    """Dataset through the upstream pipeline, chunked to bound memory."""
    n = len(dataset)
    if n <= chunk:
        return _apply_prefix(prefix, jnp.asarray(dataset.x))
    outs = []
    for start in range(0, n, chunk):
        outs.append(_apply_prefix(prefix, jnp.asarray(dataset.x[start:start + chunk])))
    return jnp.concatenate(outs, axis=0)


# --- samplers ---------------------------------------------------------------


class EpochSampler:
    """Per-epoch seeded global shuffle + padding to whole global batches.

    Single-process SPMD analog of ``DistributedSampler(shuffle=True, seed=0)``
    (data_util.py:172-178): one *global* permutation per epoch, seeded by
    (seed, epoch), padded by wrapping to a multiple of the global batch.
    """

    def __init__(self, n: int, global_batch: int, num_microbatches: int = 1,
                 seed: int = 0):
        if global_batch % num_microbatches != 0:
            raise ValueError("batch_size must divide by num_microbatches.")
        if n < 1:
            raise ValueError("Empty dataset.")
        self.n = n
        self.global_batch = global_batch
        self.num_microbatches = num_microbatches
        self.seed = seed
        self.batches_per_epoch = -(-n // global_batch)  # ceil

    def epoch_indices(self, epoch: int) -> np.ndarray:
        """(batches, M, mb) int32 index array for one epoch."""
        rng = np.random.default_rng([self.seed, int(epoch)])
        perm = rng.permutation(self.n)
        total = self.batches_per_epoch * self.global_batch
        if total > self.n:
            # wrap (tiling if the batch exceeds the dataset) to a whole
            # number of global batches, like DistributedSampler's padding
            perm = np.resize(perm, total)
        mb = self.global_batch // self.num_microbatches
        return perm.reshape(
            self.batches_per_epoch, self.num_microbatches, mb
        ).astype(np.int32)


class SequentialEvalSampler:
    """Deterministic order, final batch padded with masked-out duplicates."""

    def __init__(self, n: int, global_batch: int):
        self.n = n
        self.global_batch = global_batch
        self.batches_per_epoch = -(-n // global_batch)

    def batches(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for b in range(self.batches_per_epoch):
            start = b * self.global_batch
            idx = np.arange(start, start + self.global_batch)
            mask = (idx < self.n).astype(np.float32)
            yield np.minimum(idx, self.n - 1).astype(np.int32), mask


# --- resident pipeline ------------------------------------------------------


class ResidentPipeline:
    """Device-resident array dataset + index-driven batching over a mesh.

    ``train_view()`` returns (data_x, data_y) device arrays to pass into the
    jitted step; per-step work is placing a tiny (M, mb) int32 index array.
    """

    def __init__(
        self,
        dataset_train: ArrayDataset,
        dataset_test: ArrayDataset,
        mesh,
        batch_size: int,
        num_microbatches: int = 1,
        shuffle_seed: int = 0,
        eval_batch_size: Optional[int] = None,
    ):
        if (batch_size // max(num_microbatches, 1)) % mesh.size != 0:
            raise ValueError(
                f"Per-microbatch size {batch_size // max(num_microbatches, 1)}"
                f" must divide across the {mesh.size}-device mesh.")
        self.mesh = mesh
        self.batch_size = batch_size
        self.num_microbatches = num_microbatches
        rep = replicated_sharding(mesh)
        self._data_sharding = batch_sharding(mesh)
        # every host loads the identical (small) dataset; put_global places
        # it on pods where device_put cannot address remote chips
        self.train_x = put_global(dataset_train.x, rep)
        self.train_y = put_global(dataset_train.y.astype(np.int32), rep)
        self.test_x = put_global(dataset_test.x, rep)
        self.test_y = put_global(dataset_test.y.astype(np.int32), rep)
        self.sampler_train = EpochSampler(
            len(dataset_train), batch_size, num_microbatches, seed=shuffle_seed)
        eval_bs = eval_batch_size or batch_size
        self.sampler_test = SequentialEvalSampler(len(dataset_test), eval_bs)

    @property
    def steps_per_epoch(self) -> int:
        return self.sampler_train.batches_per_epoch

    def train_view(self):
        return self.train_x, self.train_y

    def test_view(self):
        return self.test_x, self.test_y

    def train_batches(self, epoch: int) -> Iterator[jnp.ndarray]:
        """Yields sharded (M, mb) index arrays for one epoch."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        idx_sharding = NamedSharding(self.mesh, P(None, "data"))
        for idx in self.sampler_train.epoch_indices(epoch):
            yield put_global(idx, idx_sharding)

    def eval_batches(self) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Yields sharded (idx, mask) pairs covering the test set exactly."""
        for idx, mask in self.sampler_test.batches():
            yield (put_global(idx, self._data_sharding),
                   put_global(mask, self._data_sharding))

    # --- uniform pipeline interface (shared with StreamingPipeline) --------

    def bind_train_step(self, base_step, pass_indices: bool = False):
        """base_step(ts, x, y, lr, rng) -> step(ts, *train_feed, lr, rng):
        the per-step input is an index vector; the gather from the
        HBM-resident dataset happens inside the compiled step.

        pass_indices=True feeds the index vector itself as ``x`` — used when
        the augment function does its own gather (the Pallas fused kernel
        DMAs rows straight out of the resident dataset)."""
        data_x, data_y = self.train_x, self.train_y

        def resident_step(ts, idx, lr, rng):
            x = idx if pass_indices else data_x[idx]
            return base_step(ts, x, data_y[idx], lr, rng)

        return resident_step

    def bind_eval_step(self, base_eval):
        data_x, data_y = self.test_x, self.test_y

        def resident_eval(params, model_state, idx, mask):
            return base_eval(params, model_state, data_x[idx], data_y[idx],
                             mask)

        return resident_eval

    # feeds carry a leading chunk dim when chunk > 1 (training_loop gates
    # steps_per_dispatch on this; the streaming pipeline sets False)
    supports_chunking = True

    def train_feed(self, epoch: int, chunk: int = 1,
                   budget: Optional[int] = None):
        """Yields ``(n_steps, feed_tuple)``. With ``chunk > 1`` feeds carry a
        leading chunk dim of up to ``chunk`` steps (one device dispatch each,
        see steps.make_chunked_train_step); the final chunk may be shorter.

        ``budget`` caps the total steps yielded this epoch (the loop's
        remaining max_steps). The cap is applied HOST-side, before
        device_put: slicing a device array in the loop instead would fail
        on multi-host non-fully-addressable arrays and add a surprise
        recompile at a new chunk length mid-run."""
        if chunk <= 1:
            for i, idx in enumerate(self.train_batches(epoch)):
                if budget is not None and i >= budget:
                    return
                yield 1, (idx,)
            return
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P(None, None, "data"))
        all_idx = self.sampler_train.epoch_indices(epoch)  # (B, M, mb)
        if budget is not None:
            all_idx = all_idx[:budget]
        for start in range(0, len(all_idx), chunk):
            blk = all_idx[start:start + chunk]
            yield len(blk), (put_global(blk, sharding),)

    def eval_feed(self):
        yield from self.eval_batches()
