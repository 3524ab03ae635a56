"""End-to-end integration: config-driven training on synthetic data,
checkpoint-restart-continue, eval mode, TB logging — the full user-visible
contract (SURVEY.md §4 'Integration')."""

import glob
import os

import numpy as np
import pytest
import yaml

from pytorch_ddp_resnet_tpu.algos.evaluate import evaluation_loop
from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
from pytorch_ddp_resnet_tpu.utils.config import get_config
from pytorch_ddp_resnet_tpu.utils.tb import read_scalars

pytestmark = pytest.mark.slow

CONFIG = {
    "backend": "gloo",          # accepted for reference-YAML compat
    "world_size": 8,
    "dataset_cls_name": "Synthetic",
    "data_aug_train": {
        "ToTensorTransform": {},
        "StandardizeWhiteningTransform": {},
        "FlipTransform": {"p": 0.5},
        "PaddingTransform": {"pad_size": 2, "pad_type": "zero"},
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
    "max_steps": 6,
    "batch_size": 64,
    "num_microbatches": 1,
    "compute_dtype": "float32",
    "optimizer_cls_name": "SGD",
    "optimizer_args": {"lr": 0.05, "momentum": 0.9, "dampening": 0.0,
                       "nesterov": False, "weight_decay": 0.0001},
    "scheduler_cls_name": "MultiStepLR",
    "scheduler_step_unit": "batch",
    "scheduler_args": {"milestones": [4], "gamma": 0.1},
    "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
    "checkpoint_strategy_args": {"unit": "batch", "frequency": 2},
}


def _write_run(tmp_path, run_name="smoke", overrides=None):
    base = tmp_path / "models_dir" / run_name
    base.mkdir(parents=True, exist_ok=True)
    cfg = dict(CONFIG)
    if overrides:
        cfg.update(overrides)
    # sort_keys=False: the data_aug dicts are ORDER-SENSITIVE (the YAML file
    # order is the pipeline order, like the reference's data_util.py:69)
    (base / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))
    return get_config(str(tmp_path / "models_dir"), run_name, mode="train",
                      data_dir=str(tmp_path / "data"), verbose=False)


def test_train_checkpoints_logs_and_resume(tmp_path):
    config = _write_run(tmp_path)
    ls = setup(config, verbose=False)
    assert ls["global_step"] == 0
    stats = training_loop(config, ls, verbose=False)
    assert stats["global_step"] == 6

    ckpt_dir = config.get("checkpoint_dir")
    kinds = {f.split("_")[-2] if False else f.rsplit("_", 1)[0]
             for f in os.listdir(ckpt_dir)}
    # strategy fires at batch_step 0,2,4 -> checkpoints at steps 1,3,5, plus
    # the fitted transform at step 1 under its lowercased name
    assert "checkpoint" in " ".join(kinds)
    for kind in ["checkpoint_strategy", "classifier", "optimizer",
                 "scheduler", "standardizewhiteningtransform"]:
        assert any(f.startswith(kind) for f in os.listdir(ckpt_dir)), kind
    steps_seen = sorted({int(f.rsplit("_", 1)[1].split(".")[0])
                         for f in os.listdir(ckpt_dir)
                         if f.startswith("classifier")})
    assert steps_seen == [1, 3, 5]

    # TB logs: train/* per step and val/* per epoch
    event_files = glob.glob(os.path.join(config.get("log_dir"),
                                         "events.out.tfevents*"))
    assert event_files
    events = [e for f in event_files for e in read_scalars(f)]
    train_steps = sorted({s for s, t, _ in events if t == "train/loss"})
    assert train_steps == [0, 1, 2, 3, 4, 5]
    assert any(t == "val/loss" for _, t, _ in events)

    # resume: a fresh setup restores the latest aligned step (5) and
    # continues to max_steps without refitting transforms
    config2 = _write_run(tmp_path, overrides={"max_steps": 8})
    ls2 = setup(config2, verbose=False)
    assert ls2["global_step"] == 5
    stats2 = training_loop(config2, ls2, verbose=False)
    assert stats2["global_step"] == 8
    assert stats2["steps_done"] == 3


def test_loss_decreases_e2e(tmp_path):
    config = _write_run(tmp_path, run_name="learn", overrides={
        "max_steps": 25,
        "scheduler_cls_name": "None",
        "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
    })
    ls = setup(config, verbose=False)
    training_loop(config, ls, verbose=False)
    event_files = glob.glob(os.path.join(config.get("log_dir"),
                                         "events.out.tfevents*"))
    events = [e for f in event_files for e in read_scalars(f)]
    losses = [v for s, t, v in sorted(events) if t == "train/loss"]
    assert len(losses) == 25
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_eval_mode(tmp_path):
    config = _write_run(tmp_path, run_name="evalrun", overrides={"max_steps": 4})
    ls = setup(config, verbose=False)
    training_loop(config, ls, verbose=False)

    # reload in eval mode from the checkpoint
    ls2 = setup(config, verbose=False)
    import jax

    from pytorch_ddp_resnet_tpu.algos.steps import make_eval_step
    eval_fn = jax.jit(ls2["pipeline"].bind_eval_step(
        make_eval_step(ls2["model"], ls2["preprocess_fn"])))

    metrics = evaluation_loop(
        ls2["pipeline"], eval_fn,
        ls2["train_state"]["params"], ls2["train_state"]["model_state"])
    assert set(metrics) == {"loss", "top1_err", "top5_err"}
    assert 0.0 <= metrics["top1_err"] <= 1.0
    assert np.isfinite(metrics["loss"])

    # deterministic eval: run twice, bitwise equal
    metrics2 = evaluation_loop(
        ls2["pipeline"], eval_fn,
        ls2["train_state"]["params"], ls2["train_state"]["model_state"])
    assert metrics == metrics2


def test_performance_strategy_and_plateau_e2e(tmp_path):
    config = _write_run(tmp_path, run_name="perf", overrides={
        "max_steps": 6,
        "scheduler_cls_name": "ReduceLROnPlateau",
        "scheduler_step_unit": "batch",
        "scheduler_args": {"patience": 1, "factor": 0.5},
        "checkpoint_strategy_cls_name": "PerformanceCheckpointStrategy",
        "checkpoint_strategy_args": {"unit": "batch"},
    })
    ls = setup(config, verbose=False)
    stats = training_loop(config, ls, verbose=False)
    assert stats["global_step"] == 6
    ckpts = os.listdir(config.get("checkpoint_dir"))
    assert any(f.startswith("classifier") for f in ckpts)


def test_momentum_cycling_e2e(tmp_path):
    """OneCycleLR with torch-default cycle_momentum feeds the cycled
    momentum into the jitted step as a traced scalar, in BOTH dispatch
    modes (per-step and steps_per_dispatch chunking), and the two modes
    produce the same trajectory."""
    import jax.numpy as jnp

    def run(run_name, extra):
        config = _write_run(tmp_path, run_name=run_name, overrides={
            "max_steps": 8,
            "scheduler_cls_name": "OneCycleLR",
            "scheduler_step_unit": "batch",
            "scheduler_args": {"max_lr": 0.3, "total_steps": 9},
            **extra,
        })
        ls = setup(config, verbose=False)
        stats = training_loop(config, ls, verbose=False)
        assert stats["global_step"] == 8
        return np.asarray(
            jax.tree_util.tree_leaves(ls["train_state"]["params"])[0])

    import jax

    p_single = run("cycle1", {})
    p_chunked = run("cycle2", {"steps_per_dispatch": 4})
    np.testing.assert_allclose(p_chunked, p_single, rtol=2e-5, atol=2e-5)


def test_momentum_cycling_requires_momentum_optimizer(tmp_path):
    """Adam + default-cycling CyclicLR must fail fast at setup (torch's
    'optimizer must support momentum' analog), and the documented opt-out
    unblocks it."""
    config = _write_run(tmp_path, run_name="badcycle", overrides={
        "optimizer_cls_name": "Adam",
        "optimizer_args": {"lr": 0.01},
        "scheduler_cls_name": "CyclicLR",
        "scheduler_step_unit": "batch",
        "scheduler_args": {"base_lr": 0.01, "max_lr": 0.1,
                           "step_size_up": 3},
    })
    with pytest.raises(ValueError, match="cycle_momentum"):
        setup(config, verbose=False)
    config = _write_run(tmp_path, run_name="okcycle", overrides={
        "max_steps": 3,
        "optimizer_cls_name": "Adam",
        "optimizer_args": {"lr": 0.01},
        "scheduler_cls_name": "CyclicLR",
        "scheduler_step_unit": "batch",
        "scheduler_args": {"base_lr": 0.01, "max_lr": 0.1,
                           "step_size_up": 3, "cycle_momentum": False},
    })
    ls = setup(config, verbose=False)
    stats = training_loop(config, ls, verbose=False)
    assert stats["global_step"] == 3
