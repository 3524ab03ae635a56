"""End-to-end training through the Pallas fused-augment path (interpret mode
on CPU; the identical code compiles on TPU) and pattern-matcher behavior."""

import numpy as np
import yaml

import jax

from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic
from pytorch_ddp_resnet_tpu.data.pipeline import build_transforms
from pytorch_ddp_resnet_tpu.ops.pallas.augment import try_from_transforms
from pytorch_ddp_resnet_tpu.utils.config import get_config
import pytest

CONFIG = {
    "dataset_cls_name": "Synthetic",
    "data_aug_train": {
        "ToTensorTransform": {},
        "StandardizeWhiteningTransform": {},
        "FlipTransform": {"p": 0.5},
        "PaddingTransform": {"pad_size": 4, "pad_type": "mirror"},
        "RandomCropTransform": {"crop_size": 32},
    },
    "data_aug_test": {
        "ToTensorTransform": {},
        "StandardizeWhiteningTransform": {},
    },
    "architecture_spec": "c3,8,3,1,1 n a r1 r1 ap16,1,0 fc16,10",
    "preact": False,
    "use_proj": False,
    "dropout_prob": 0.0,
    "compute_dtype": "float32",
    "use_pallas_augment": True,
    "max_steps": 6,
    "batch_size": 64,
    "num_microbatches": 2,
    "optimizer_cls_name": "SGD",
    "optimizer_args": {"lr": 0.05, "momentum": 0.9},
    "scheduler_cls_name": "None",
    "scheduler_args": {},
    "scheduler_step_unit": "none",
    "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
    "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
}


def _run_config(tmp_path, run_name):
    base = tmp_path / "models_dir" / run_name
    base.mkdir(parents=True, exist_ok=True)
    (base / "config.yaml").write_text(yaml.safe_dump(CONFIG, sort_keys=False))
    return get_config(str(tmp_path / "models_dir"), run_name, mode="train",
                      data_dir=str(tmp_path / "data"), verbose=False)


@pytest.mark.slow
def test_pallas_augment_e2e_training(tmp_path):
    config = _run_config(tmp_path, "pallas_run")
    ls = setup(config, verbose=False)
    assert ls["augment_pass_indices"] is True  # fused kernel matched
    stats = training_loop(config, ls, verbose=False)
    assert stats["global_step"] == 6


@pytest.mark.slow
def test_pattern_matcher_rejects_nonmatching(tmp_path):
    ds = load_synthetic(None, train=True, n_train=64)
    # ZCA whitening is not expressible in the fused kernel
    aug = {"ToTensorTransform": {}, "ZCAWhiteningTransform": {}}
    tr = build_transforms(ds, aug, str(tmp_path), is_train=True)
    assert try_from_transforms(tr, ds.x, interpret=True) is None
    # order violation: flip before whitening
    aug2 = {"ToTensorTransform": {},
            "FlipTransform": {"p": 0.5},
            "StandardizeWhiteningTransform": {}}
    tr2 = build_transforms(ds, aug2, str(tmp_path), is_train=True)
    assert try_from_transforms(tr2, ds.x, interpret=True) is None


def test_pattern_matcher_accepts_both_shipped_recipes(tmp_path):
    ds = load_synthetic(None, train=True, n_train=64)
    resnet20_aug = {
        "ToTensorTransform": {},
        "ZeroMeanWhiteningTransform": {},
        "FlipTransform": {"p": 0.5},
        "PaddingTransform": {"pad_size": 4, "pad_type": "zero"},
        "RandomCropTransform": {"crop_size": 32},
    }
    tr = build_transforms(ds, resnet20_aug, str(tmp_path), is_train=True)
    fn = try_from_transforms(tr, ds.x, interpret=True)
    assert fn is not None
    out = fn(jax.numpy.arange(8, dtype=jax.numpy.int32), jax.random.key(0))
    assert out.shape == (8, 32, 32, 3)
    assert np.isfinite(np.asarray(out, np.float32)).all()
