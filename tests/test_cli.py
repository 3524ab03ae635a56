"""CLI surface tests: argparse defaults, --help, and main() end-to-end."""

import os

import pytest
import yaml

from pytorch_ddp_resnet_tpu.cli import create_argparser, main


def test_argparser_defaults_match_reference():
    """Reference defaults: mode=train, models_dir, wrn run, data_dir
    (script.py:25-28)."""
    args = create_argparser().parse_args([])
    assert args.mode == "train"
    assert args.models_dir == "models_dir"
    assert args.run_name == "wrn-28-10-dropout_cifar10"
    assert args.data_dir == "data_dir"
    assert args.distributed is False


def test_mode_choices_enforced():
    with pytest.raises(SystemExit):
        create_argparser().parse_args(["--mode", "banana"])


def test_help_exits_zero(capsys):
    with pytest.raises(SystemExit) as e:
        create_argparser().parse_args(["--help"])
    assert e.value.code == 0
    assert "TPU-native" in capsys.readouterr().out


@pytest.mark.slow
def test_main_train_then_eval(tmp_path, capsys):
    cfg = {
        "dataset_cls_name": "Synthetic",
        "data_aug_train": {"ToTensorTransform": {}},
        "data_aug_test": {"ToTensorTransform": {}},
        "architecture_spec": "c3,8,3,1,1 n a ap32,1,0 fc8,10",
        "preact": False, "use_proj": False, "dropout_prob": 0.0,
        "compute_dtype": "float32",
        "max_steps": 3, "batch_size": 64, "num_microbatches": 1,
        "optimizer_cls_name": "SGD", "optimizer_args": {"lr": 0.05},
        "scheduler_cls_name": "None", "scheduler_args": {},
        "scheduler_step_unit": "none",
        "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
        "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
    }
    base = tmp_path / "models_dir" / "clirun"
    base.mkdir(parents=True)
    (base / "config.yaml").write_text(yaml.safe_dump(cfg, sort_keys=False))
    argv = ["--models_dir", str(tmp_path / "models_dir"),
            "--run_name", "clirun", "--data_dir", str(tmp_path / "data")]

    assert main(["--mode", "train"] + argv) == 0
    out = capsys.readouterr().out
    assert "Training done at step 3" in out
    assert os.path.isdir(base / "checkpoints")

    assert main(["--mode", "eval"] + argv) == 0
    out = capsys.readouterr().out
    assert "Test metrics:" in out and "top1_err" in out
