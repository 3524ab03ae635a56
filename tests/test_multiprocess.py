"""Multi-process (2 x jax.distributed CPU processes) equivalence tests.

The reference validated its distributed path with ``backend: gloo,
world_size: 2`` on one machine (its CIFAR config, SURVEY.md §4); the JAX
analog launches 2 OS processes with 2 virtual CPU devices each, rendezvoused
through ``jax.distributed.initialize``, and asserts:

- the resident training path (put_global data plane) produces the same final
  parameters as a single-process run over the same 4-device global mesh;
- the streaming pipeline's per-host partial decode
  (make_array_from_process_local_data) assembles exactly the batches a
  single-process full decode produces.

These run real subprocesses; they are the closest a single machine gets to a
pod (VERDICT round 1, "Prove the multi-process path").
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "mp_driver.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(mode, workdir, nproc=2, timeout=420, dev_per_proc=2,
            retries=2):
    """Run nproc driver processes; retry on gloo-rendezvous timeouts.

    XLA:CPU's gloo context init has a fixed 30s key-value deadline that
    starts at the FIRST process's first collective; on this 1-core host,
    nproc cold controllers compiling/loading serially can exceed that
    skew under load. A retry reruns with every compile cache warm — an
    environment capacity limit, not product logic, so bounded retries
    keep the test meaningful without masking real failures (any other
    error signature fails immediately)."""
    last = None
    for _ in range(retries + 1):
        port = _free_port()
        env = {k: v for k, v in os.environ.items()
               if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS",
                            "JAX_PLATFORMS")}
        procs = [
            subprocess.Popen(
                [sys.executable, DRIVER, str(port), str(nproc), str(pid),
                 workdir, mode, str(dev_per_proc)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=REPO)
            for pid in range(nproc)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
        ok = all(p.returncode == 0 and "MP_DRIVER_OK" in out
                 for p, out in zip(procs, outs))
        if ok:
            return [
                {parts[1]: float(parts[2])
                 for line in out.splitlines() if line.startswith("DIGEST ")
                 for parts in [line.split()]}
                for out in outs
            ]
        last = outs
        # Environment-capacity flake signatures on this oversubscribed
        # 1-core host (fixed 30s deadlines inside XLA:CPU/gloo or the
        # coordination service, hit when nproc cold controllers serialize
        # under load). Rendezvous/context-init timeouts retry always; a
        # SHUTDOWN-barrier timeout retries ONLY when every process got
        # through its work (printed DIGEST lines) — teardown skew, not a
        # coordination regression. A barrier timeout mid-work (no digests
        # from some process) fails immediately.
        init_flake = any(
            "Gloo context initialization failed" in out
            or "GetKeyValue() timed out" in out
            for out in outs)
        teardown_flake = (
            all("DIGEST " in out for out in outs)
            and any("Barrier timed out" in out or "BarrierError" in out
                    for out in outs))
        if not (init_flake or teardown_flake):
            break
    for p, out in zip(procs, last):
        assert p.returncode == 0 and "MP_DRIVER_OK" in out, out[-4000:]
    raise AssertionError("unreachable")


def _write_synthetic_config(workdir):
    run_dir = os.path.join(workdir, "models_dir", "mp_run")
    os.makedirs(run_dir, exist_ok=True)
    cfg = """
dataset_cls_name: Synthetic
data_aug_train:
    ToTensorTransform: {}
    StandardizeWhiteningTransform: {}
    FlipTransform: {p: 0.5}
data_aug_test:
    ToTensorTransform: {}
    StandardizeWhiteningTransform: {}
architecture_spec: 'c3,8,3,1,1 n a r1 ap32,1,0 fc8,10'
preact: False
use_proj: False
dropout_prob: 0.0
compute_dtype: float32
max_steps: 6
batch_size: 16
num_microbatches: 1
optimizer_cls_name: SGD
optimizer_args: {lr: 0.1, momentum: 0.9, weight_decay: 0.0001}
scheduler_cls_name: MultiStepLR
scheduler_step_unit: batch
scheduler_args: {milestones: [4], gamma: 0.1}
checkpoint_strategy_cls_name: FrequencyCheckpointStrategy
checkpoint_strategy_args: {unit: epoch, frequency: 1}
"""
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        f.write(cfg)
    return run_dir


def _single_process_reference_digest(workdir):
    """Same run on 4 in-process devices (conftest provides 8)."""
    import jax
    import yaml

    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
    from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh

    run_dir = os.path.join(workdir, "models_dir", "mp_run_single")
    os.makedirs(run_dir, exist_ok=True)
    src = os.path.join(workdir, "models_dir", "mp_run", "config.yaml")
    with open(src) as f:
        config = yaml.safe_load(f)
    config["checkpoint_dir"] = os.path.join(run_dir, "checkpoints")
    config["log_dir"] = os.path.join(run_dir, "tensorboard_logs")
    config["data_dir"] = os.path.join(workdir, "data_single")

    mesh = make_mesh(num_devices=4)
    ls = setup(config, mesh=mesh, verbose=False)
    training_loop(config, ls, verbose=False)
    params = jax.device_get(ls["train_state"]["params"])
    return float(sum(
        np.abs(np.asarray(v, np.float64)).sum()
        for v in jax.tree_util.tree_leaves(params)))


def test_two_process_training_matches_single_process(tmp_path):
    workdir = str(tmp_path)
    _write_synthetic_config(workdir)
    digests = _launch("train", workdir)
    a, b = digests[0]["params"], digests[1]["params"]
    np.testing.assert_allclose(a, b, rtol=1e-6)
    ref = _single_process_reference_digest(workdir)
    np.testing.assert_allclose(a, ref, rtol=1e-5)
    # coordinator-only checkpointing: files exist exactly once
    ckpts = os.listdir(os.path.join(workdir, "models_dir", "mp_run",
                                    "checkpoints"))
    assert any(c.startswith("classifier_") for c in ckpts)


def _write_imagefolder(workdir):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls in ("c0", "c1"):
            d = os.path.join(workdir, "imagefolder-root", "imagenet",
                             split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(6):
                h, w = int(rng.integers(24, 40)), int(rng.integers(24, 40))
                Image.fromarray(
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                ).save(os.path.join(d, f"img{i}.jpeg"))


def _single_process_stream_digests(workdir):
    import jax
    import jax.numpy as jnp

    from pytorch_ddp_resnet_tpu.data.datasets import load_imagenet_folder
    from pytorch_ddp_resnet_tpu.data.streaming import StreamingPipeline
    from pytorch_ddp_resnet_tpu.data.transforms import RandomScaleTransform
    from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh

    root = os.path.join(workdir, "imagefolder-root")
    train = load_imagenet_folder(root, True)
    test = load_imagenet_folder(root, False)
    scale = RandomScaleTransform((None, None, 3), target_short_side=24)
    pipe = StreamingPipeline(
        train, test, make_mesh(num_devices=4), batch_size=8, crop_size=16,
        host_transforms_train=[scale], host_transforms_test=[scale],
        num_workers=2, shuffle_seed=0)
    digest_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    x, y = next(pipe.train_batches(epoch=0))
    out = {"train_x": float(digest_fn(x)), "train_y": float(digest_fn(y))}
    tot_x = tot_m = 0.0
    for x, y, m in pipe.eval_batches():
        tot_x += float(digest_fn(x))
        tot_m += float(digest_fn(m))
    out["eval_x"] = tot_x
    out["eval_mask"] = tot_m
    return out


def test_two_process_streaming_partial_decode_matches(tmp_path):
    workdir = str(tmp_path)
    _write_imagefolder(workdir)
    digests = _launch("stream", workdir)
    ref = _single_process_stream_digests(workdir)
    for key, val in ref.items():
        np.testing.assert_allclose(digests[0][key], val, rtol=1e-6,
                                   err_msg=key)
        np.testing.assert_allclose(digests[1][key], val, rtol=1e-6,
                                   err_msg=key)


def test_four_process_chunked_async_training_and_resume(tmp_path):
    """The pod story past 2 processes (VERDICT r2 next-round #6): 4
    processes (1 device each — 4 controllers over a 4-device global mesh;
    gloo's fixed 30s rendezvous deadline can't absorb four cold 2-device
    controllers compiling serially on this 1-core host), with the two previously-untested
    interactions enabled — steps_per_dispatch chunking and async-
    checkpoint submission under jax.distributed. Asserts cross-process
    digest equality, equality with a single-process run of the same
    config over the same 4-device global mesh, coordinator-only checkpoint files incl. the save
    manifest, and a multi-process resume continuing to the same state a
    straight single-process run reaches."""
    workdir = str(tmp_path)
    run_dir = _write_synthetic_config(workdir)
    cfg_path = os.path.join(run_dir, "config.yaml")
    with open(cfg_path, "a") as f:
        # n_train 48 / batch 16 -> 3-step epochs: max_steps 6 and 12 land
        # exactly on epoch boundaries, so the resumed trajectory is
        # comparable step-for-step with a straight run (a mid-epoch resume
        # legitimately replays from a fresh epoch, as the reference's
        # DataLoader does)
        f.write("steps_per_dispatch: 3\nasync_checkpoint: true\n"
                "dataset_args: {n_train: 48, n_test: 32}\n")

    digests = _launch("train", workdir, nproc=4, dev_per_proc=1,
                      retries=4)
    vals = [d["params"] for d in digests]
    for v in vals[1:]:
        np.testing.assert_allclose(v, vals[0], rtol=1e-6)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    ckpts = os.listdir(ckpt_dir)
    assert any(c.startswith("classifier_") for c in ckpts)
    assert any(c.startswith("manifest_") for c in ckpts), ckpts

    # resume: bump max_steps and relaunch the 4-process run; it must pick
    # up from the newest manifested step and land where a straight
    # single-process run lands
    with open(cfg_path) as f:
        cfg = f.read()
    with open(cfg_path, "w") as f:
        f.write(cfg.replace("max_steps: 6", "max_steps: 12"))
    digests2 = _launch("train", workdir, nproc=4, dev_per_proc=1,
                       retries=4)
    vals2 = [d["params"] for d in digests2]
    for v in vals2[1:]:
        np.testing.assert_allclose(v, vals2[0], rtol=1e-6)

    # single-process reference over the same 4-device global mesh, straight
    # to 12 steps (resume-by-checkpoint must not change the trajectory)
    import yaml

    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop
    from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh
    import jax

    ref_dir = os.path.join(workdir, "models_dir", "mp_run_single8")
    os.makedirs(ref_dir, exist_ok=True)
    with open(cfg_path) as f:
        config = yaml.safe_load(f)
    config["checkpoint_dir"] = os.path.join(ref_dir, "checkpoints")
    config["log_dir"] = os.path.join(ref_dir, "tensorboard_logs")
    config["data_dir"] = os.path.join(workdir, "data_single8")
    mesh = make_mesh(num_devices=4)
    ls = setup(config, mesh=mesh, verbose=False)
    training_loop(config, ls, verbose=False)
    params = jax.device_get(ls["train_state"]["params"])
    ref = float(sum(
        np.abs(np.asarray(v, np.float64)).sum()
        for v in jax.tree_util.tree_leaves(params)))
    np.testing.assert_allclose(vals2[0], ref, rtol=1e-5)
