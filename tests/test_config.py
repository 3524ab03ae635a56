import os

import pytest

from pytorch_ddp_resnet_tpu.utils.config import ConfigParser, get_config, get_run_paths


def _write_run(tmp_path, run_name="myrun", text="foo: 1\nbar: two\n"):
    base = tmp_path / run_name
    base.mkdir(parents=True)
    (base / "config.yaml").write_text(text)
    return base


def test_defaults_merged_under_file_keys(tmp_path):
    _write_run(tmp_path, text="foo: 1\nmode: eval\n")
    cfg = ConfigParser(defaults={"mode": "train", "extra": "kept"})
    cfg.read(str(tmp_path / "myrun" / "config.yaml"))
    assert cfg["foo"] == 1
    assert cfg["mode"] == "eval"  # file wins over default
    assert cfg["extra"] == "kept"  # default survives


def test_dict_protocol_supports_splatting(tmp_path):
    _write_run(tmp_path)
    cfg = ConfigParser(defaults={})
    cfg.read(str(tmp_path / "myrun" / "config.yaml"))

    def consumer(foo, **kwargs):
        return foo

    assert consumer(**cfg) == 1
    assert set(cfg.keys()) == {"foo", "bar"}
    assert len(cfg) == 2


def test_get_returns_default_for_missing_key(tmp_path):
    _write_run(tmp_path)
    cfg = ConfigParser(defaults={})
    cfg.read(str(tmp_path / "myrun" / "config.yaml"))
    assert cfg.get("absent") is None
    assert cfg.get("absent", 7) == 7
    with pytest.raises(KeyError):
        cfg["absent"]


def test_run_paths_layout():
    paths = get_run_paths("models_dir", "wrn")
    assert paths["config_path"] == os.path.join("models_dir", "wrn", "config.yaml")
    assert paths["checkpoint_dir"] == os.path.join("models_dir", "wrn", "checkpoints")
    assert paths["log_dir"] == os.path.join("models_dir", "wrn", "tensorboard_logs")


def test_get_config_injects_standard_defaults(tmp_path):
    _write_run(tmp_path, run_name="r1", text="batch_size: 128\n")
    cfg = get_config(str(tmp_path), "r1", mode="train", data_dir="dd", verbose=False)
    assert cfg["batch_size"] == 128
    assert cfg["mode"] == "train"
    assert cfg["data_dir"] == "dd"
    assert cfg["checkpoint_dir"].endswith(os.path.join("r1", "checkpoints"))
    assert cfg["log_dir"].endswith(os.path.join("r1", "tensorboard_logs"))
