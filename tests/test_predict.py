"""Serving surface: train a tiny run, load a Predictor from its checkpoint,
classify raw uint8 images with arbitrary batch sizes."""

import numpy as np
import yaml

from pytorch_ddp_resnet_tpu.algos.predict import load_predictor
from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
from pytorch_ddp_resnet_tpu.data.datasets import load_synthetic
from pytorch_ddp_resnet_tpu.utils.config import get_config
import pytest

CONFIG = {
    "dataset_cls_name": "Synthetic",
    "data_aug_train": {
        "ToTensorTransform": {},
        "StandardizeWhiteningTransform": {},
        "FlipTransform": {"p": 0.5},
    },
    "data_aug_test": {
        "ToTensorTransform": {},
        "StandardizeWhiteningTransform": {},
    },
    "architecture_spec": "c3,8,3,1,1 n a r1 ap32,1,0 fc8,10",
    "preact": False,
    "use_proj": False,
    "dropout_prob": 0.0,
    "compute_dtype": "float32",
    "max_steps": 30,
    "batch_size": 64,
    "num_microbatches": 1,
    "optimizer_cls_name": "SGD",
    "optimizer_args": {"lr": 0.05, "momentum": 0.9},
    "scheduler_cls_name": "None",
    "scheduler_args": {},
    "scheduler_step_unit": "none",
    "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
    "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
}


@pytest.mark.slow
def test_predictor_roundtrip(tmp_path):
    base = tmp_path / "models_dir" / "run"
    base.mkdir(parents=True)
    (base / "config.yaml").write_text(yaml.safe_dump(CONFIG, sort_keys=False))
    config = get_config(str(tmp_path / "models_dir"), "run", mode="train",
                        data_dir=str(tmp_path / "data"), verbose=False)
    ls = setup(config, verbose=False)
    training_loop(config, ls, verbose=False)

    predictor = load_predictor(config, batch_size=32)
    test = load_synthetic(None, train=False, n_test=80)
    # odd batch size: exercises padding (80 = 2*32 + 16)
    logits = predictor.logits(test.x)
    assert logits.shape == (80, 10)
    labels = predictor.predict(test.x)
    assert labels.shape == (80,)
    # the synthetic task is linearly separable; a trained net beats chance
    acc = float((labels == test.y).mean())
    assert acc > 0.3, acc
    # chunking must not change results
    predictor2 = load_predictor(config, batch_size=80)
    np.testing.assert_allclose(predictor2.logits(test.x), logits, rtol=2e-5,
                               atol=1e-5)
