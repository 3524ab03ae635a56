"""Checkpoint system tests (reference behaviors: checkpoint_util.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.utils import checkpoint as ckpt


def _tree(v=0.0):
    return {"params": {"w": jnp.full((3, 2), v), "b": jnp.zeros((2,))},
            "opt": {"step": jnp.zeros((), jnp.int32)}}


def test_name_format_and_parse():
    assert ckpt._format_name("classifier", 120) == "classifier_120.ckpt"
    parsed = ckpt._parse_name("classifier_120.ckpt")
    assert parsed == {"kind": "classifier", "steps": 120, "suffix": "ckpt"}
    assert ckpt._parse_name("notacheckpoint") is None


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path)
    c = ckpt.PytreeCheckpointable(_tree(1.5))
    ckpt.save_checkpoint(d, "state", c, steps=7)
    c2 = ckpt.PytreeCheckpointable(_tree(0.0))
    step = ckpt.maybe_load_checkpoint(d, "state", c2, verbose=False)
    assert step == 7
    np.testing.assert_allclose(np.asarray(c2.tree["params"]["w"]), 1.5)


def test_load_missing_returns_zero(tmp_path):
    c = ckpt.PytreeCheckpointable(_tree())
    assert ckpt.maybe_load_checkpoint(str(tmp_path), "none", c, verbose=False) == 0


def test_latest_step_discovery_and_retention(tmp_path):
    d = str(tmp_path)
    c = ckpt.PytreeCheckpointable(_tree())
    for s in [1, 5, 3, 9, 7, 11, 2]:
        ckpt.save_checkpoint(d, "state", c, steps=s)
    files = sorted(os.listdir(d))
    # newest 5 by step kept: {3,5,7,9,11}
    assert files == [f"state_{s}.ckpt" for s in [11, 3, 5, 7, 9]] or set(
        files) == {f"state_{s}.ckpt" for s in [3, 5, 7, 9, 11]}
    c2 = ckpt.PytreeCheckpointable(_tree())
    assert ckpt.maybe_load_checkpoint(d, "state", c2, verbose=False) == 11
    # explicit step load
    assert ckpt.maybe_load_checkpoint(d, "state", c2, steps=7, verbose=False) == 7


def test_multi_kind_alignment(tmp_path):
    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree(1.0))
    b = ckpt.PytreeCheckpointable(_tree(2.0))
    ckpt.save_checkpoints(d, {"a": a, "b": b}, steps=4)
    a2, b2 = ckpt.PytreeCheckpointable(_tree()), ckpt.PytreeCheckpointable(_tree())
    assert ckpt.maybe_load_checkpoints(
        d, {"a": a2, "b": b2, "skipped": None}, verbose=False) == 4
    # one kind a save ahead (the crash-between-per-kind-writes window, a
    # normal state with the async writer): resume from the newest step at
    # which EVERY kind exists — the last complete save
    ckpt.save_checkpoint(d, "a", a, steps=5)
    assert ckpt.maybe_load_checkpoints(
        d, {"a": ckpt.PytreeCheckpointable(_tree()),
            "b": ckpt.PytreeCheckpointable(_tree())}, verbose=False) == 4
    # a kind with ZERO files (crash during the very first save, after some
    # kinds' files but before the rest) falls back to run-from-scratch
    # instead of hard-failing — same outcome as nothing-saved-yet
    assert ckpt.maybe_load_checkpoints(
        d, {"a": ckpt.PytreeCheckpointable(_tree()),
            "never_saved": ckpt.PytreeCheckpointable(_tree())},
        verbose=False) == 0
    # kinds that BOTH have files but share no step (corrupted dir) still raise
    ckpt.save_checkpoint(d, "only", a, steps=7)
    with pytest.raises(RuntimeError, match="no common step"):
        ckpt.maybe_load_checkpoints(
            d, {"a": ckpt.PytreeCheckpointable(_tree()),
                "only": ckpt.PytreeCheckpointable(_tree())},
            steps=None, verbose=False)


def test_shape_mismatch_rejected(tmp_path):
    d = str(tmp_path)
    c = ckpt.PytreeCheckpointable({"w": jnp.zeros((3,))})
    ckpt.save_checkpoint(d, "state", c, steps=1)
    bad = ckpt.PytreeCheckpointable({"w": jnp.zeros((4,))})
    with pytest.raises(ValueError, match="shape"):
        ckpt.maybe_load_checkpoint(d, "state", bad, verbose=False)


def test_structure_mismatch_rejected(tmp_path):
    d = str(tmp_path)
    c = ckpt.PytreeCheckpointable({"w": jnp.zeros((3,)), "extra": jnp.zeros(())})
    ckpt.save_checkpoint(d, "state", c, steps=1)
    missing = ckpt.PytreeCheckpointable({"w": jnp.zeros((3,))})
    with pytest.raises(KeyError, match="unexpected"):
        ckpt.maybe_load_checkpoint(d, "state", missing, verbose=False)


def test_atomicity_no_tmp_left(tmp_path):
    d = str(tmp_path)
    c = ckpt.PytreeCheckpointable(_tree())
    ckpt.save_checkpoint(d, "state", c, steps=1)
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]


# --- strategies -------------------------------------------------------------


def test_frequency_strategy_batch_unit():
    s = ckpt.get_checkpoint_strategy(
        "FrequencyCheckpointStrategy", {"unit": "batch", "frequency": 3})
    fired = [s.observe(unit="batch") for _ in range(7)]
    # pre-increment modulo: counter 0,1,2,... -> fires at 0,3,6
    assert fired == [True, False, False, True, False, False, True]
    assert s.batch_step == 7
    # observing the other unit advances its counter but never fires
    assert s.observe(unit="epoch") is False
    assert s.epoch_step == 1


def test_frequency_strategy_epoch_unit_counts_both():
    s = ckpt.get_checkpoint_strategy(
        "FrequencyCheckpointStrategy", {"unit": "epoch", "frequency": 1})
    for _ in range(10):
        assert s.observe(unit="batch") is False
    assert s.observe(unit="epoch") is True
    assert (s.batch_step, s.epoch_step) == (10, 1)


def test_performance_strategy():
    s = ckpt.get_checkpoint_strategy(
        "PerformanceCheckpointStrategy", {"unit": "epoch"})
    assert s.observe(unit="epoch", loss=1.0) is True
    assert s.observe(unit="epoch", loss=1.5) is False
    assert s.observe(unit="epoch", loss=0.5) is True
    assert s.lowest_loss == 0.5
    # other unit: state advances, best is NOT updated (reference 197-204)
    assert s.observe(unit="batch", loss=0.1) is False
    assert s.lowest_loss == 0.5


def test_strategy_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path)
    s = ckpt.get_checkpoint_strategy(
        "PerformanceCheckpointStrategy", {"unit": "epoch"})
    s.observe(unit="epoch", loss=0.7)
    s.observe(unit="batch", loss=0.9)
    ckpt.save_checkpoint(d, "checkpoint_strategy", s, steps=3)
    s2 = ckpt.get_checkpoint_strategy(
        "PerformanceCheckpointStrategy", {"unit": "epoch"})
    assert ckpt.maybe_load_checkpoint(d, "checkpoint_strategy", s2,
                                      verbose=False) == 3
    assert s2.epoch_step == 1 and s2.batch_step == 1
    assert s2.lowest_loss == 0.7


def test_unknown_strategy():
    with pytest.raises(ValueError):
        ckpt.get_checkpoint_strategy("Nope", {})


class _DictCheckpointable:
    def __init__(self, d):
        self.d = dict(d)

    def state_dict(self):
        return dict(self.d)

    def load_state_dict(self, d):
        self.d = dict(d)


def test_async_checkpointer_durable_and_ordered(tmp_path):
    from pytorch_ddp_resnet_tpu.utils.checkpoint import (
        AsyncCheckpointer, _latest_step, maybe_load_checkpoint)

    ck = AsyncCheckpointer()
    obj = _DictCheckpointable({"w": np.arange(4.0)})
    ck.submit(str(tmp_path), {"thing": obj}, steps=10)
    ck.submit(str(tmp_path), {"thing": obj}, steps=20)
    ck.wait()
    assert _latest_step(str(tmp_path), "thing") == 20
    fresh = _DictCheckpointable({"w": np.zeros(4)})
    assert maybe_load_checkpoint(str(tmp_path), "thing", fresh,
                                 verbose=False) == 20
    np.testing.assert_array_equal(fresh.d["w"], np.arange(4.0))
    ck.close()


def test_async_checkpointer_snapshots_at_submit(tmp_path):
    """Mutating the checkpointable after submit must not affect the saved
    state (the training loop keeps advancing strategy counters while the
    writer drains)."""
    from pytorch_ddp_resnet_tpu.utils.checkpoint import (
        AsyncCheckpointer, maybe_load_checkpoint)

    ck = AsyncCheckpointer()
    obj = _DictCheckpointable({"count": np.asarray(7)})
    ck.submit(str(tmp_path), {"s": obj}, steps=1)
    obj.d["count"] = np.asarray(99)  # post-submit mutation
    ck.wait()
    fresh = _DictCheckpointable({"count": np.asarray(0)})
    maybe_load_checkpoint(str(tmp_path), "s", fresh, verbose=False)
    assert int(fresh.d["count"]) == 7
    ck.close()


def test_async_checkpointer_surfaces_writer_errors(tmp_path):
    from pytorch_ddp_resnet_tpu.utils.checkpoint import AsyncCheckpointer

    target = tmp_path / "not_a_dir"
    target.write_text("occupied")  # os.makedirs on a file path fails
    ck = AsyncCheckpointer()
    obj = _DictCheckpointable({"w": np.ones(2)})
    ck.submit(str(target), {"thing": obj}, steps=1)
    with pytest.raises(OSError):
        ck.wait()
    ck.close()


def test_training_loop_async_checkpoint_resumable(tmp_path):
    """training_loop with async_checkpoint (the default) leaves durable,
    aligned checkpoints that a fresh setup resumes from."""
    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
    from pytorch_ddp_resnet_tpu.utils.config import ConfigParser

    cfg = {
        "mode": "train", "data_dir": None,
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "log_dir": str(tmp_path / "tb"),
        "dataset_cls_name": "Synthetic",
        "data_aug_train": {"ToTensorTransform": {}},
        "data_aug_test": {"ToTensorTransform": {}},
        "architecture_spec": "c3,4,3,1,1 n a ap32,1,0 fc4,10",
        "preact": False, "use_proj": False, "dropout_prob": 0.0,
        "compute_dtype": "float32", "max_steps": 6, "batch_size": 16,
        "num_microbatches": 1,
        "optimizer_cls_name": "SGD", "optimizer_args": {"lr": 0.01},
        "scheduler_cls_name": "None",
        "checkpoint_strategy_cls_name": "FrequencyCheckpointStrategy",
        "checkpoint_strategy_args": {"unit": "epoch", "frequency": 1},
        "log_every": 100,
    }
    config = ConfigParser(defaults=cfg)
    config._config = dict(cfg)
    ls = setup(config, verbose=False)
    training_loop(config, ls, verbose=False)
    ls2 = setup(config, verbose=False)  # resumes from the async-written files
    assert ls2["global_step"] > 0


# --- save manifests (atomic multi-kind saves) ------------------------------


def test_manifest_written_and_preferred(tmp_path):
    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree(1.0))
    b = ckpt.PytreeCheckpointable(_tree(2.0))
    ckpt.save_checkpoints(d, {"a": a, "b": b}, steps=4)
    assert os.path.exists(os.path.join(d, "manifest_4.json"))
    # a TORN save: kind files for step 9 exist but the crash happened
    # before the manifest write — resume must pick the manifested step 4,
    # not the newest common step 9
    ckpt.save_checkpoint(d, "a", a, steps=9)
    ckpt.save_checkpoint(d, "b", b, steps=9)
    assert ckpt.maybe_load_checkpoints(
        d, {"a": ckpt.PytreeCheckpointable(_tree()),
            "b": ckpt.PytreeCheckpointable(_tree())}, verbose=False) == 4


def test_manifest_kind_set_change_falls_back(tmp_path):
    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree(1.0))
    ckpt.save_checkpoints(d, {"a": a}, steps=3)
    # a NEW kind appears (config change): no manifest covers {a, b}; the
    # common-step fallback sees b has no files -> run from scratch
    assert ckpt.maybe_load_checkpoints(
        d, {"a": ckpt.PytreeCheckpointable(_tree()),
            "b": ckpt.PytreeCheckpointable(_tree())}, verbose=False) == 0
    # a SUBSET of the manifested kinds still resumes from the manifest
    ckpt.save_checkpoints(d, {"a": a, "extra": a}, steps=6)
    assert ckpt.maybe_load_checkpoints(
        d, {"a": ckpt.PytreeCheckpointable(_tree())}, verbose=False) == 6


def test_manifest_retention_gc(tmp_path):
    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree())
    for s in range(1, 9):
        ckpt.save_checkpoints(d, {"a": a}, steps=s)
    manifests = sorted(f for f in os.listdir(d) if f.startswith("manifest"))
    assert manifests == [f"manifest_{s}.json" for s in [4, 5, 6, 7, 8]]


def test_manifest_corrupted_is_skipped(tmp_path):
    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree(1.0))
    ckpt.save_checkpoints(d, {"a": a}, steps=2)
    ckpt.save_checkpoints(d, {"a": a}, steps=5)
    with open(os.path.join(d, "manifest_5.json"), "w") as f:
        f.write("{torn")  # simulated torn write
    assert ckpt.maybe_load_checkpoints(
        d, {"a": ckpt.PytreeCheckpointable(_tree())}, verbose=False) == 2


def test_manifest_truncated_kind_file_scans_back(tmp_path):
    """Manifests record file sizes; a truncated-but-present kind file (fs
    corruption — atomic renames rule out crash truncation) must make
    resume scan back to the previous intact manifested step instead of
    failing np.load."""
    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree(1.0))
    b = ckpt.PytreeCheckpointable(_tree(2.0))
    ckpt.save_checkpoints(d, {"a": a, "b": b}, steps=3)
    ckpt.save_checkpoints(d, {"a": a, "b": b}, steps=7)
    path = os.path.join(d, "b_7.ckpt")
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size // 2)
    target = {"a": ckpt.PytreeCheckpointable(_tree()),
              "b": ckpt.PytreeCheckpointable(_tree())}
    assert ckpt.maybe_load_checkpoints(d, target, verbose=False) == 3


def test_manifest_without_sizes_still_resumes(tmp_path):
    """Pre-size manifests (older saves) verify by existence only."""
    import json as _json

    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree(1.0))
    ckpt.save_checkpoints(d, {"a": a}, steps=4)
    mpath = os.path.join(d, "manifest_4.json")
    with open(mpath) as f:
        data = _json.load(f)
    del data["sizes"]
    with open(mpath, "w") as f:
        _json.dump(data, f)
    assert ckpt.maybe_load_checkpoints(
        d, {"a": ckpt.PytreeCheckpointable(_tree())}, verbose=False) == 4


def test_manifest_kind_reserved(tmp_path):
    with pytest.raises(ValueError, match="reserved"):
        ckpt.save_checkpoint(str(tmp_path), "manifest",
                             ckpt.PytreeCheckpointable(_tree()), steps=1)


def test_async_checkpointer_release_caps_device_copies(tmp_path):
    """wait_prior_release returns once the previous snapshot was host-copied
    (the one-extra-copy HBM contract), before the file write completes."""
    from pytorch_ddp_resnet_tpu.utils.checkpoint import AsyncCheckpointer

    ck = AsyncCheckpointer()
    obj = _DictCheckpointable({"w": np.arange(8.0)})
    ck.wait_prior_release()  # no-op before any submit
    ck.submit(str(tmp_path), {"thing": obj}, steps=1)
    ck.wait_prior_release()  # must not deadlock; returns after D2H
    ck.submit(str(tmp_path), {"thing": obj}, steps=2)
    ck.wait()
    assert os.path.exists(os.path.join(str(tmp_path), "manifest_2.json"))
    fresh = _DictCheckpointable({"w": np.zeros(8)})
    assert ckpt.maybe_load_checkpoint(str(tmp_path), "thing", fresh,
                                      verbose=False) == 2
    ck.close()


def test_manifest_same_size_corruption_scans_back(tmp_path):
    """A kind file corrupted WITHOUT a size change passes the manifest's
    size check and only surfaces when np.load parses it; resume must
    scan back to the previous complete manifested step instead of
    crashing (the scan-back loop in maybe_load_checkpoints)."""
    d = str(tmp_path)
    a = ckpt.PytreeCheckpointable(_tree(1.0))
    b = ckpt.PytreeCheckpointable(_tree(2.0))
    ckpt.save_checkpoints(d, {"a": a, "b": b}, steps=3)
    ckpt.save_checkpoints(d, {"a": a, "b": b}, steps=7)
    path = os.path.join(d, "b_7.ckpt")
    size = os.path.getsize(path)
    with open(path, "r+b") as f:  # zero the zip header, keep the size
        f.write(b"\x00" * min(512, size))
    assert os.path.getsize(path) == size
    target = {"a": ckpt.PytreeCheckpointable(_tree()),
              "b": ckpt.PytreeCheckpointable(_tree())}
    assert ckpt.maybe_load_checkpoints(d, target, verbose=False) == 3
