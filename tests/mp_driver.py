"""Subprocess driver for the 2-process jax.distributed CPU tests.

Launched by tests/test_multiprocess.py as:

    python mp_driver.py <coordinator_port> <num_processes> <process_id> \
        <workdir> <mode>

Each process gets 2 virtual CPU devices (4 global). ``mode`` selects:

- ``train``: run setup + training_loop on the Synthetic config in
  ``<workdir>/models_dir/mp_run`` over the full 4-device global mesh and
  print a digest of the final params — asserting the multi-process data
  plane (put_global / make_array_from_callback) end-to-end.
- ``stream``: build a StreamingPipeline over the image folder in
  ``<workdir>/imagefolder-root`` and print digests of the first train batch
  and of one eval pass — asserting the per-host partial-decode path
  (put_process_local / make_array_from_process_local_data).

Digests are printed as ``DIGEST <name> <value>`` lines for the parent test
to scrape and compare across processes and against a single-process run.
"""

import os
import sys


def main():
    port, nproc, pid, workdir, mode = sys.argv[1:6]
    # optional 6th arg: virtual devices per process (default 2); the
    # 4-process test uses 1 so the global mesh stays at 4 devices — same
    # compiled programs as the 2x2 test (warm cache) and light enough that
    # four cold controllers on one core still make gloo's fixed 30s
    # rendezvous deadline
    dev_per_proc = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dev_per_proc}")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # axon plugin hijacks CPU

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.devices()) == dev_per_proc * int(nproc), len(jax.devices())

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()

    if mode == "train":
        import yaml

        from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop

        run_dir = os.path.join(workdir, "models_dir", "mp_run")
        with open(os.path.join(run_dir, "config.yaml")) as f:
            config = yaml.safe_load(f)
        config["checkpoint_dir"] = os.path.join(run_dir, "checkpoints")
        config["log_dir"] = os.path.join(run_dir, "tensorboard_logs")
        config["data_dir"] = os.path.join(workdir, "data")

        ls = setup(config, mesh=mesh, verbose=False)
        training_loop(config, ls, verbose=False)
        params = jax.device_get(ls["train_state"]["params"])
        digest = float(sum(
            np.abs(np.asarray(v, np.float64)).sum()
            for v in jax.tree_util.tree_leaves(params)))
        print(f"DIGEST params {digest:.10e}", flush=True)
    elif mode == "stream":
        from pytorch_ddp_resnet_tpu.data.datasets import load_imagenet_folder
        from pytorch_ddp_resnet_tpu.data.streaming import StreamingPipeline
        from pytorch_ddp_resnet_tpu.data.transforms import (
            RandomScaleTransform)

        root = os.path.join(workdir, "imagefolder-root")
        train = load_imagenet_folder(root, True)
        test = load_imagenet_folder(root, False)
        scale = RandomScaleTransform((None, None, 3), target_short_side=24)
        pipe = StreamingPipeline(
            train, test, mesh, batch_size=8, crop_size=16,
            host_transforms_train=[scale], host_transforms_test=[scale],
            num_workers=2, shuffle_seed=0)

        digest_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
        x, y = next(pipe.train_batches(epoch=0))
        print(f"DIGEST train_x {float(digest_fn(x)):.10e}", flush=True)
        print(f"DIGEST train_y {float(digest_fn(y)):.10e}", flush=True)
        tot_x = tot_m = 0.0
        for x, y, m in pipe.eval_batches():
            tot_x += float(digest_fn(x))
            tot_m += float(digest_fn(m))
        print(f"DIGEST eval_x {tot_x:.10e}", flush=True)
        print(f"DIGEST eval_mask {tot_m:.10e}", flush=True)
    else:
        raise ValueError(mode)
    print("MP_DRIVER_OK", flush=True)


if __name__ == "__main__":
    main()
