"""YAML run-config system.

Mirrors the reference's ``ConfigParser`` behavior
(reference: resnet/utils/config_util.py:6-28 and script.py:32-47):
a per-run ``config.yaml`` is merged over programmatic defaults and the result
is exposed dict-like so call sites can splat ``**config`` into factories that
each pick the keys they need. The YAML keys are the real API surface of the
framework.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml


class ConfigParser(dict):
    """Dict-like view over defaults merged with a YAML file.

    File keys win over defaults, matching the reference
    (config_util.py:12-15, ``config.update(yaml.safe_load(f))``).
    """

    def __init__(self, defaults: Optional[Dict[str, Any]] = None) -> None:
        super().__init__()
        self._defaults = dict(defaults) if defaults else {}
        self._config: Optional[Dict[str, Any]] = None

    def read(self, config_path: str, verbose: bool = False) -> None:
        config = dict(self._defaults)
        with open(config_path, "rb") as f:
            loaded = yaml.safe_load(f)
        if loaded:
            config.update(loaded)
        self._config = config
        if verbose:
            for k in self._config:
                print(f"{k}: {self._config[k]}")

    # -- dict protocol over the merged config -------------------------------
    def __getitem__(self, item: str) -> Any:
        return self._config[item]

    def __contains__(self, item: object) -> bool:
        return self._config is not None and item in self._config

    def get(self, item: str, default: Any = None) -> Any:
        # Unlike the reference (which raises on a missing key even in .get),
        # this returns a default: new optional keys must not break old YAMLs.
        return self._config.get(item, default)

    def items(self):
        return self._config.items()

    def keys(self):
        return self._config.keys()

    def values(self):
        return self._config.values()

    def __iter__(self):
        return iter(self._config)

    def __len__(self) -> int:
        return 0 if self._config is None else len(self._config)

    def as_dict(self) -> Dict[str, Any]:
        return dict(self._config)


def get_run_paths(models_dir: str, run_name: str) -> Dict[str, str]:
    """Derive the per-run directory layout (reference: script.py:32-37)."""
    base_path = os.path.join(models_dir, run_name)
    return {
        "base_path": base_path,
        "config_path": os.path.join(base_path, "config.yaml"),
        "checkpoint_dir": os.path.join(base_path, "checkpoints"),
        "log_dir": os.path.join(base_path, "tensorboard_logs"),
    }


def get_config(
    models_dir: str,
    run_name: str,
    mode: str = "train",
    data_dir: str = "data_dir",
    verbose: bool = True,
    extra_defaults: Optional[Dict[str, Any]] = None,
) -> ConfigParser:
    """Load a run's config.yaml over the standard defaults
    (reference: script.py:38-47)."""
    paths = get_run_paths(models_dir, run_name)
    defaults = {
        "mode": mode,
        "data_dir": data_dir,
        "checkpoint_dir": paths["checkpoint_dir"],
        "log_dir": paths["log_dir"],
    }
    if extra_defaults:
        defaults.update(extra_defaults)
    config = ConfigParser(defaults=defaults)
    config.read(paths["config_path"], verbose=verbose)
    return config
