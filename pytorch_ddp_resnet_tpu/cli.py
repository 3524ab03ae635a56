"""Command-line entry point.

Identical user surface to the reference launcher (reference: script.py:20-29,
129-136):

    python -m pytorch_ddp_resnet_tpu --mode={train,eval} \
        --models_dir=... --run_name=... --data_dir=...

but with no ``torch.multiprocessing.spawn``: one process drives the whole
mesh (multi-host pods call ``jax.distributed.initialize()`` first via
``--distributed``). The config keys ``backend`` / ``world_size`` /
``master_addr`` / ``master_port`` are accepted for YAML compatibility; the
comm backend is XLA and rendezvous is the JAX coordinator (SURVEY.md §5.8).
"""

from __future__ import annotations

import argparse
import sys

from pytorch_ddp_resnet_tpu.utils.config import get_config


def create_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="pytorch_ddp_resnet_tpu",
        description="A TPU-native JAX implementation of Deep Residual "
                    "Networks, using SPMD data parallelism over a device "
                    "mesh.")
    parser.add_argument("--mode", choices=["train", "eval"], default="train")
    parser.add_argument("--models_dir", type=str, default="models_dir")
    parser.add_argument("--run_name", type=str,
                        default="wrn-28-10-dropout_cifar10")
    parser.add_argument("--data_dir", type=str, default="data_dir")
    parser.add_argument(
        "--distributed", action="store_true",
        help="Call jax.distributed.initialize() for multi-host pods "
             "(replaces MASTER_ADDR/PORT rendezvous).")
    return parser


def main(argv=None) -> int:
    args = create_argparser().parse_args(argv)
    if args.distributed:
        import jax

        jax.distributed.initialize()

    config = get_config(args.models_dir, args.run_name, mode=args.mode,
                        data_dir=args.data_dir, verbose=True)

    # imported here so --help works without touching accelerators
    from pytorch_ddp_resnet_tpu.algos.evaluate import evaluation_loop
    from pytorch_ddp_resnet_tpu.algos.train import setup, training_loop

    learning_system = setup(config)
    if config.get("mode") == "train":
        stats = training_loop(config, learning_system)
        print(f"Training done at step {stats['global_step']} "
              f"({stats['images_per_sec']:.1f} images/sec).")
    else:
        import jax

        from pytorch_ddp_resnet_tpu.algos.steps import make_eval_step

        ls = learning_system
        eval_fn = jax.jit(ls["pipeline"].bind_eval_step(
            make_eval_step(ls["model"], ls["preprocess_fn"])))
        metrics = evaluation_loop(
            ls["pipeline"], eval_fn,
            ls["train_state"]["params"], ls["train_state"]["model_state"])
        print(f"Test metrics: {metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
