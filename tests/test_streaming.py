"""Streaming (folder) pipeline tests with tiny generated image trees:
host/device transform split, prefetch batching, exact eval coverage, and a
short end-to-end training run through the ImageNet code path."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pytorch_ddp_resnet_tpu.data.datasets import load_imagenet_folder  # noqa: E402
from pytorch_ddp_resnet_tpu.data.streaming import (  # noqa: E402
    HostSampleProcessor,
    build_streaming_data,
    split_host_device_transforms,
)
from pytorch_ddp_resnet_tpu.data.transforms import (  # noqa: E402
    CenterCropTransform,
    ColorTransform,
    FlipTransform,
    RandomCropTransform,
    RandomScaleTransform,
    StandardizeWhiteningTransform,
    ToTensorTransform,
)
from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh  # noqa: E402


def _make_folder(root, split, n_per_class=6, classes=("n01", "n02"), size0=24):
    rng = np.random.default_rng(0)
    for ci, cls in enumerate(classes):
        d = os.path.join(root, "imagenet", split, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            # varied sizes/aspects to exercise the dynamic-shape path
            h = size0 + (i % 3) * 8
            w = size0 + ((i + 1) % 3) * 10
            arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            arr[:, :, ci] = 255  # plant a channel signal per class
            Image.fromarray(arr).save(os.path.join(d, f"img_{i}.jpeg"))


AUG_TRAIN = {
    "ToTensorTransform": {},
    "RandomScaleTransform": {"target_short_side": 20},
    "RandomCropTransform": {"crop_size": 16},
    "FlipTransform": {"p": 0.5},
    "StandardizeWhiteningTransform": {},
}
AUG_TEST = {
    "ToTensorTransform": {},
    "RandomScaleTransform": {"target_short_side": 20},
    "CenterCropTransform": {"crop_size": 16},
    "StandardizeWhiteningTransform": {},
}


def test_split_host_device():
    shape = (None, None, 3)
    tt = ToTensorTransform(shape)
    sc = RandomScaleTransform(shape, 20)
    rc = RandomCropTransform((None, None, 3), 16)
    fl = FlipTransform((16, 16, 3), 0.5)
    st = StandardizeWhiteningTransform((16, 16, 3))
    host, device, crop = split_host_device_transforms([tt, sc, rc, fl, st])
    assert host == [sc, rc]
    assert device == [tt, fl, st]
    assert crop == 16
    # no scale -> everything on device
    host2, device2, crop2 = split_host_device_transforms([tt, fl])
    assert host2 == [] and device2 == [tt, fl] and crop2 is None
    # scale without a following crop is an error
    with pytest.raises(ValueError, match="crop"):
        split_host_device_transforms([tt, sc, fl])


def test_host_sample_processor(tmp_path):
    _make_folder(str(tmp_path), "train")
    ds = load_imagenet_folder(str(tmp_path), train=True)
    assert ds.num_classes == 2 and len(ds) == 12
    shape = (None, None, 3)
    proc = HostSampleProcessor(
        [RandomScaleTransform(shape, 20)], crop_size=16, random_crop=True)
    img = proc(ds.paths[0], epoch=0, index=0)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # deterministic per (seed, epoch, index); differs across indices
    img2 = proc(ds.paths[0], epoch=0, index=0)
    np.testing.assert_array_equal(img, img2)
    img3 = proc(ds.paths[0], epoch=1, index=0)
    assert img.shape == img3.shape


@pytest.mark.slow
def test_build_streaming_data_and_train(tmp_path):
    _make_folder(str(tmp_path), "train")
    _make_folder(str(tmp_path), "val", n_per_class=5)
    ds_tr = load_imagenet_folder(str(tmp_path), train=True)
    ds_te = load_imagenet_folder(str(tmp_path), train=False)
    mesh = make_mesh()
    ckpt_dir = str(tmp_path / "ckpt")

    pipeline, augment_fn, preprocess_fn, sample_shape = build_streaming_data(
        ds_tr, ds_te, AUG_TRAIN, AUG_TEST, ckpt_dir, mesh,
        batch_size=16, num_microbatches=2, num_workers=2,
        fit_sample_limit=12)
    assert sample_shape == (16, 16, 3)
    assert pipeline.steps_per_epoch == 1  # ceil(12/16)
    # fitted stats were checkpointed
    assert any(f.startswith("standardizewhiteningtransform")
               for f in os.listdir(ckpt_dir))

    # train batches: (M, mb, H, W, C) uint8 on device
    batches = list(pipeline.train_feed(epoch=0))
    assert len(batches) == 1
    n_steps, (x, y) = batches[0]
    assert n_steps == 1
    assert x.shape == (2, 8, 16, 16, 3) and x.dtype == jnp.uint8
    assert y.shape == (2, 8)

    # eval covers the 10 val samples exactly with masking
    evals = list(pipeline.eval_feed())
    assert sum(float(jnp.sum(m)) for _, _, m in evals) == 10.0

    # a real train step through the streaming path learns the channel signal
    from pytorch_ddp_resnet_tpu.algos.steps import (
        init_train_state, make_train_step)
    from pytorch_ddp_resnet_tpu.models import ResNet
    from pytorch_ddp_resnet_tpu.utils.optim import sgd

    model = ResNet("c3,8,3,1,1 n a r1 ap16,1,0 fc8,2", False, False, 0.0,
                   compute_dtype=jnp.float32)
    opt = sgd(momentum=0.9)
    ts = init_train_state(model, opt, jax.random.key(0), sample_shape)
    base = make_train_step(model, opt, 2, augment_fn=augment_fn)
    step = jax.jit(pipeline.bind_train_step(base), donate_argnums=0)
    losses = []
    for ep in range(8):
        for _, (x, y) in pipeline.train_feed(ep):
            ts, m = step(ts, x, y, jnp.float32(0.1), jax.random.key(ep))
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    # second build restores the fitted transform instead of refitting
    pipeline2, _, _, _ = build_streaming_data(
        ds_tr, ds_te, AUG_TRAIN, AUG_TEST, ckpt_dir, mesh,
        batch_size=16, num_microbatches=2, num_workers=2,
        fit_sample_limit=12)
    assert pipeline2.steps_per_epoch == 1


def test_streaming_rejects_fittable_test_without_train(tmp_path):
    _make_folder(str(tmp_path), "train", n_per_class=3)
    _make_folder(str(tmp_path), "val", n_per_class=3)
    ds_tr = load_imagenet_folder(str(tmp_path), train=True)
    ds_te = load_imagenet_folder(str(tmp_path), train=False)
    bad_test = dict(AUG_TEST)
    bad_test["ColorTransform"] = {}
    with pytest.raises(ValueError, match="reusable"):
        build_streaming_data(
            ds_tr, ds_te, AUG_TRAIN, bad_test, str(tmp_path / "c"),
            make_mesh(), batch_size=8, num_workers=1, fit_sample_limit=6)


def test_training_loop_streaming_with_steps_per_dispatch(tmp_path):
    """Regression: a streaming config with steps_per_dispatch > 1 must
    train (the loop auto-disables chunking — streaming feeds carry no
    chunk dim; previously this crashed scanning the microbatch axis)."""
    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
    from pytorch_ddp_resnet_tpu.utils.config import ConfigParser

    _make_folder(str(tmp_path), "train")
    _make_folder(str(tmp_path), "val", n_per_class=3)
    cfg = {
        "mode": "train", "data_dir": str(tmp_path),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "log_dir": str(tmp_path / "tb"),
        "dataset_cls_name": "ImageNet",
        "data_aug_train": dict(AUG_TRAIN),
        "data_aug_test": dict(AUG_TEST),
        "architecture_spec": "c3,4,3,1,1 n a ap16,1,0 fc4,2",
        "preact": False, "use_proj": False, "dropout_prob": 0.0,
        "compute_dtype": "float32", "max_steps": 3, "batch_size": 16,
        "num_microbatches": 2, "data_workers": 2,
        "optimizer_cls_name": "SGD", "optimizer_args": {"lr": 0.01},
        "scheduler_cls_name": "None",
        "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
        "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
        "log_every": 100, "steps_per_dispatch": 8,
    }
    config = ConfigParser(defaults=cfg)
    config._config = dict(cfg)
    ls = setup(config, verbose=False)
    out = training_loop(config, ls, verbose=False)
    assert out["global_step"] == 3
