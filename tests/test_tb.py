"""TensorBoard event writer tests: roundtrip through our own parser, and
cross-validation with the real tensorboard reader when available."""

import glob
import os

import numpy as np
import pytest

from pytorch_ddp_resnet_tpu.utils.tb import SummaryWriter, crc32c, read_scalars


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes([0] * 32)) == 0x8A9136AA


def test_roundtrip_scalars(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 0)
    w.add_scalar("train/loss", 0.75, 1)
    w.add_scalar("val/top1_err", 0.25, 1)
    w.close()
    events = read_scalars(w.path)
    assert (0, "train/loss") in [(s, t) for s, t, _ in events]
    vals = {(s, t): v for s, t, v in events}
    assert vals[(0, "train/loss")] == pytest.approx(1.5)
    assert vals[(1, "train/loss")] == pytest.approx(0.75)
    assert vals[(1, "val/top1_err")] == pytest.approx(0.25)


@pytest.mark.slow
def test_real_tensorboard_can_read_our_files(tmp_path):
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    w = SummaryWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("train/loss", 1.0 / (i + 1), i)
    w.close()
    acc = ea_mod.EventAccumulator(str(tmp_path))
    acc.Reload()
    assert "train/loss" in acc.Tags()["scalars"]
    scalars = acc.Scalars("train/loss")
    assert len(scalars) == 5
    np.testing.assert_allclose(
        [s.value for s in scalars], [1.0 / (i + 1) for i in range(5)],
        rtol=1e-6)
    np.testing.assert_array_equal([s.step for s in scalars], list(range(5)))


def test_our_reader_handles_torch_files(tmp_path):
    tb = pytest.importorskip("torch.utils.tensorboard")
    w = tb.SummaryWriter(str(tmp_path))
    w.add_scalar("x", 3.0, 7)
    w.close()
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents*"))
    assert files
    events = [e for f in files for e in read_scalars(f)]
    assert (7, "x", pytest.approx(3.0)) in [
        (s, t, pytest.approx(v)) for s, t, v in events]
