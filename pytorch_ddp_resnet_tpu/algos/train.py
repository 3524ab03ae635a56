"""Learning-system setup and the training loop.

Single-process SPMD replacement for the reference's per-rank ``setup`` +
``training_loop`` (reference: script.py:50-108, resnet/algos/training.py:
31-171). The per-process rendezvous, DDP wrapper, GradScaler, and
DistributedSampler all collapse into: one mesh, one jitted train step, one
resident pipeline.

Loop cadence parity (training.py:86-171):
- epoch counter = checkpoint strategy's ``epoch_step`` (training.py:87-88);
- ``train/*`` scalars + stdout print every optimizer step, ``val/*`` per
  epoch with the epoch as the TB step (training.py:121-127, 153-159);
- scheduler stepped per 'batch' or per 'epoch' unit, plateau schedulers fed
  the loss (training.py:20-28, 118-119, 150-151);
- checkpoints at batch/epoch boundaries via the strategy, saved at the
  completed-step count (batch saves: ``global_step + 1`` before the
  increment, training.py:129-139; epoch saves: ``global_step`` after it —
  the reference's epoch saves use global_step+1 post-increment
  (training.py:161-171), an off-by-one that skips a training step on
  every epoch-boundary resume; fixed here, see PARITY.md);
- per-epoch validation via the evaluation loop (training.py:147).

Known reference divergence (deliberate): the reference advances the
strategy's counters only on rank 0, so non-zero ranks reuse the epoch-0
shuffle forever (SURVEY.md §5.4); single-process SPMD has one strategy and
one global shuffle, which is what the reference *intended*.

Throughput design: metrics are logged with a one-step lag so the host never
blocks on the device inside the hot loop; the only synchronous fetch happens
when a batch-unit plateau scheduler or performance strategy genuinely needs
the current loss.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_ddp_resnet_tpu.algos.evaluate import evaluation_loop
from pytorch_ddp_resnet_tpu.algos.steps import (
    init_train_state,
    make_chunked_train_step,
    make_eval_step,
    make_train_step,
)
from pytorch_ddp_resnet_tpu.data.datasets import ArrayDataset, get_dataset
from pytorch_ddp_resnet_tpu.data.pipeline import ResidentPipeline, build_transforms
from pytorch_ddp_resnet_tpu.data.transforms import make_batch_augment_fn
from pytorch_ddp_resnet_tpu.models.resnet import ResNet
from pytorch_ddp_resnet_tpu.parallel.mesh import make_mesh, put_replicated
from pytorch_ddp_resnet_tpu.utils import tb
from pytorch_ddp_resnet_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    PytreeCheckpointable,
    get_checkpoint_strategy,
    maybe_load_checkpoints,
    save_checkpoints,
)
from pytorch_ddp_resnet_tpu.utils.optim import base_lr_of, get_optimizer, get_scheduler

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "float16": jnp.float16}


_REQUIRED_KEYS = (
    "dataset_cls_name", "data_aug_train", "data_aug_test",
    "architecture_spec", "preact", "use_proj", "dropout_prob",
    "batch_size", "optimizer_cls_name", "optimizer_args",
    "checkpoint_strategy_cls_name",
)


def setup(config, mesh=None, verbose: bool = True) -> Dict[str, Any]:
    """Build the full learning system from a run config
    (reference: script.py:50-108). Returns the dict of handles the loops
    consume, including the restored ``global_step``."""
    verbose = verbose and jax.process_index() == 0
    missing = [k for k in _REQUIRED_KEYS if config.get(k) is None
               and k not in ("data_aug_train", "data_aug_test")]
    if missing:
        raise ValueError(
            f"config.yaml is missing required keys: {missing} "
            f"(see models_dir/*/config.yaml for the schema).")
    if mesh is None:
        mesh = make_mesh()
    world_size = config.get("world_size")
    if world_size is not None and world_size != mesh.size and verbose:
        print(f"Note: config world_size={world_size}, mesh has {mesh.size} "
              f"device(s); the mesh wins (world_size is a process count in "
              f"the reference, a device count here).")

    checkpoint_dir = config.get("checkpoint_dir")
    data_dir = config.get("data_dir")
    dataset_cls_name = config.get("dataset_cls_name")

    # dataset_args: optional loader kwargs (e.g. SyntheticSpectral's
    # num_classes/hardness knobs), same class-name+kwargs convention as
    # every other factory in the YAML surface.
    dataset_args = config.get("dataset_args") or {}
    dataset_train = get_dataset(dataset_cls_name, data_dir, train=True,
                                **dataset_args)
    dataset_test = get_dataset(dataset_cls_name, data_dir, train=False,
                               **dataset_args)

    batch_size = config.get("batch_size")
    num_microbatches = config.get("num_microbatches", 1)
    augment_pass_indices = False

    if isinstance(dataset_train, ArrayDataset):
        # Resident path: dataset in HBM, augmentation fused into the step.
        transforms_train = build_transforms(
            dataset_train, config.get("data_aug_train"), checkpoint_dir,
            is_train=True, verbose=verbose)
        transforms_test = build_transforms(
            dataset_train, config.get("data_aug_test"), checkpoint_dir,
            is_train=False, reusable_transforms=transforms_train)
        augment_fn = make_batch_augment_fn(list(transforms_train.values()))
        test_fn = make_batch_augment_fn(list(transforms_test.values()))
        # test transforms are deterministic in every shipped config; if a
        # stochastic one is configured, it gets a fixed key so eval stays
        # deterministic.
        preprocess_fn = lambda x: test_fn(x, jax.random.key(0))  # noqa: E731
        pipeline = ResidentPipeline(
            dataset_train, dataset_test, mesh,
            batch_size=batch_size, num_microbatches=num_microbatches,
            shuffle_seed=config.get("shuffle_seed", 0))
        sample_shape = tuple(
            transforms_train[next(reversed(transforms_train))].output_shape
        ) if transforms_train else dataset_train.data_shape

        # Optional Pallas fused gather+augment kernel (ops/pallas/augment.py):
        # replaces the XLA gather + transform chain when the recipe matches
        # the standard CIFAR pattern.
        if config.get("use_pallas_augment", False):
            from pytorch_ddp_resnet_tpu.ops.pallas.augment import (
                try_from_transforms)

            fused = try_from_transforms(
                transforms_train, dataset_train.x,
                # Mosaic targets TPU; elsewhere (CPU tests) run interpreted.
                interpret=jax.default_backend() != "tpu")
            if fused is not None:
                augment_fn = fused
                augment_pass_indices = True
            elif verbose:
                print("use_pallas_augment: pipeline doesn't match the fused "
                      "kernel pattern; using the XLA path.")
    else:
        # Streaming path: host decode/scale/crop workers + device suffix.
        from pytorch_ddp_resnet_tpu.data.streaming import build_streaming_data

        pipeline, augment_fn, preprocess_fn, sample_shape = (
            build_streaming_data(
                dataset_train, dataset_test,
                config.get("data_aug_train"), config.get("data_aug_test"),
                checkpoint_dir, mesh,
                batch_size=batch_size, num_microbatches=num_microbatches,
                num_workers=config.get("data_workers", 8),
                shuffle_seed=config.get("shuffle_seed", 0),
                fit_sample_limit=config.get("fit_sample_limit", 65536),
                # DCT-domain scaled JPEG decode (opt-in; pixel-altering —
                # ACCURACY.md streaming gate rule)
                dct_scale=config.get("dct_decode_scale", False),
                verbose=verbose))

    compute_dtype = _DTYPES[config.get("compute_dtype", "bfloat16")]
    model = ResNet(
        architecture_spec=config.get("architecture_spec"),
        preact=config.get("preact"),
        use_proj=config.get("use_proj"),
        dropout_prob=config.get("dropout_prob"),
        compute_dtype=compute_dtype,
        # opt-in block rematerialization: trades ~1/3 extra FLOPs for far
        # less saved-activation HBM traffic; wins at large batch (see
        # models/blocks.py measurements)
        remat=config.get("remat", False),
        # opt-in lane-packed Pallas kernels for stride-1 3x3 convs
        # (ops/pallas/conv.py; benchmarked in BASELINE.md)
        pallas_conv=config.get("use_pallas_conv", False),
        # opt-in fused preact block-half kernels: norm+relu+dropout+conv
        # (+residual, +next-BN stats) as one Pallas call
        # (ops/pallas/fused_block.py; benchmarked in BASELINE.md)
        fused_block=config.get("use_fused_block", False),
        # opt-in int8 quantization-aware training: fused lane path with
        # s8 x s8 -> s32 conv cores on the 2x int8 MXU mode, per-tile
        # dynamic activation scales, straight-through gradients
        # (ops/pallas/fused_block.py fused_half_int8); _bwd additionally
        # quantizes the dgrad/wgrad convs (fully quantized training)
        int8_train=(config.get("use_int8_train", False)
                    or config.get("use_int8_train_bwd", False)),
        int8_train_bwd=config.get("use_int8_train_bwd", False),
        # opt-in in-kernel counter-based dropout bits for the fused lane
        # paths: masks reconstructed on the VPU from a hash of the global
        # element index instead of a materialized HBM bits tensor
        # (ops/pallas/fused_block.py _seed_bits)
        inkernel_dropout=config.get("use_inkernel_dropout", False),
        lane_transition=config.get("use_lane_transition", False),
        # pod runs: the fused/int8 lane paths dispatch per-shard via
        # shard_map over this mesh's 'data' axis (models/blocks.py)
        shard_mesh=mesh if mesh.size > 1 else None,
    )
    optimizer = get_optimizer(
        config.get("optimizer_cls_name"), config.get("optimizer_args"))
    scheduler = get_scheduler(
        config.get("scheduler_cls_name"), config.get("scheduler_args"),
        base_lr=base_lr_of(config.get("optimizer_args")))
    if (scheduler is not None and scheduler.cycles_momentum
            and not optimizer.supports_momentum):
        # torch raises the analogous "optimizer must support momentum" error
        # when OneCycleLR/CyclicLR cycle momentum over an optimizer without
        # a momentum group
        raise ValueError(
            f"{config.get('scheduler_cls_name')} cycles momentum "
            f"(cycle_momentum is on by default, as in torch) but optimizer "
            f"{config.get('optimizer_cls_name')!r} with "
            f"{config.get('optimizer_args')} does not consume a cycled "
            f"momentum (needs SGD/RMSprop constructed with momentum != 0). "
            f"Set scheduler_args: {{cycle_momentum: false}} to schedule "
            f"the lr only.")
    checkpoint_strategy = get_checkpoint_strategy(
        config.get("checkpoint_strategy_cls_name"),
        config.get("checkpoint_strategy_args"))

    # The final transform's output shape decides the model's input shape.
    train_state = init_train_state(
        model, optimizer, jax.random.key(config.get("seed", 0)), sample_shape)
    train_state = put_replicated(train_state, mesh)

    # Checkpoint kinds mirror the reference's (script.py:84-94):
    # checkpoint_strategy / classifier / optimizer / scheduler. The 'scaler'
    # kind does not exist — bf16 needs no loss scaler (SURVEY.md §2.2).
    classifier_ckpt = PytreeCheckpointable(
        {"params": train_state["params"],
         "model_state": train_state["model_state"]})
    optimizer_ckpt = PytreeCheckpointable(train_state["opt_state"])
    global_step = maybe_load_checkpoints(
        checkpoint_dir,
        {
            "checkpoint_strategy": checkpoint_strategy,
            "classifier": classifier_ckpt,
            "optimizer": optimizer_ckpt,
            "scheduler": scheduler,
        },
        verbose=verbose)
    if global_step > 0:
        train_state = put_replicated(
            {"params": classifier_ckpt.tree["params"],
             "model_state": classifier_ckpt.tree["model_state"],
             "opt_state": optimizer_ckpt.tree},
            mesh)

    return {
        "mesh": mesh,
        "model": model,
        "optimizer": optimizer,
        "scheduler": scheduler,
        "checkpoint_strategy": checkpoint_strategy,
        "pipeline": pipeline,
        "augment_fn": augment_fn,
        "preprocess_fn": preprocess_fn,
        "train_state": train_state,
        "global_step": global_step,
        "num_microbatches": num_microbatches,
        "augment_pass_indices": augment_pass_indices,
    }


def _save_all(checkpoint_dir, strategy, train_state, scheduler, steps,
              checkpointer=None, snapshot_fn=None):
    # Coordinator-only writes (reference: rank-0-only saves, training.py:129);
    # on a shared filesystem every host would otherwise race on the same
    # files. Every process still *observes* the strategy so counters agree.
    if snapshot_fn is not None:
        # Async path: the step function donates train_state, so its buffers
        # die at the next dispatch — take a device-side copy in ONE compiled
        # dispatch (~ms), then the writer thread device_gets and serializes
        # the un-donated copy while training continues (no step-loop stall).
        # The snapshot jit runs on EVERY process (a multi-host global array
        # cannot be dispatched from the coordinator alone); only the submit
        # below is coordinator-only.
        if checkpointer is not None:
            # HBM cap: wait until the PREVIOUS snapshot's device buffers
            # were dropped (D2H done) before allocating this one — at most
            # one extra copy of the train state is ever live
            checkpointer.wait_prior_release()
        snap = snapshot_fn(train_state)
    if jax.process_index() != 0:
        return
    if checkpointer is not None:
        checkpointer.submit(
            checkpoint_dir,
            {
                "checkpoint_strategy": strategy,
                "classifier": PytreeCheckpointable(
                    {"params": snap["params"],
                     "model_state": snap["model_state"]}),
                "optimizer": PytreeCheckpointable(snap["opt_state"]),
                "scheduler": scheduler,
            },
            steps=steps)
        return
    host_state = jax.device_get(train_state)
    save_checkpoints(
        checkpoint_dir,
        {
            "checkpoint_strategy": strategy,
            "classifier": PytreeCheckpointable(
                {"params": host_state["params"],
                 "model_state": host_state["model_state"]}),
            "optimizer": PytreeCheckpointable(host_state["opt_state"]),
            "scheduler": scheduler,
        },
        steps=steps)


def _auto_steps_per_dispatch(verbose: bool = True) -> int:
    """Pick a dispatch chunk length from the measured host<->device
    round-trip latency (tiny jitted op + forced value readback, the same
    sync the step loop pays once per dispatch). Thresholds assume an
    O(10ms) training step: <1ms RTT (PCIe-attached) needs no chunking;
    a tunneled host at 4-12ms RTT amortizes well at K=8-16. Under
    ``jax.distributed`` every process must compile the same K, so the
    coordinator's choice is broadcast."""
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((), jnp.float32)
    float(f(x))  # warm the compile outside the timed loop
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        _ = float(x)  # forced readback (block_until_ready can return early)
    rtt_ms = (time.perf_counter() - t0) / n * 1e3
    if rtt_ms < 1.0:
        k = 1
    elif rtt_ms < 4.0:
        k = 4
    elif rtt_ms < 10.0:
        k = 8
    else:
        k = 16
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        k = int(multihost_utils.broadcast_one_to_all(jnp.int32(k)))
    if verbose:
        print(f"steps_per_dispatch: auto -> {k} "
              f"(dispatch round-trip {rtt_ms:.2f} ms)")
    return k


def training_loop(
    config,
    learning_system: Dict[str, Any],
    verbose: bool = True,
) -> Dict[str, Any]:
    """Run training to ``max_steps`` (reference: training.py:31-171)."""
    ls = learning_system
    model, optimizer = ls["model"], ls["optimizer"]
    scheduler = ls["scheduler"]
    strategy = ls["checkpoint_strategy"]
    pipeline = ls["pipeline"]
    train_state = ls["train_state"]
    global_step = ls["global_step"]
    num_microbatches = ls["num_microbatches"]

    max_steps = config.get("max_steps")
    checkpoint_dir = config.get("checkpoint_dir")
    log_dir = config.get("log_dir")
    scheduler_step_unit = config.get("scheduler_step_unit", "none")
    log_every = config.get("log_every", 1)
    seed = config.get("seed", 0)

    # Profiling (SURVEY.md §5.1: absent in the reference, first-class here):
    # `profile_port` starts jax.profiler's trace server for live TensorBoard
    # profiling; `profile_steps: [start, stop]` captures a programmatic trace
    # of that step window into log_dir/plugins/profile.
    if config.get("profile_port"):
        jax.profiler.start_server(int(config.get("profile_port")))
    profile_steps = config.get("profile_steps")

    # non-coordinator processes on a pod stay silent and write nothing
    # (reference: rank-0-only logging, training.py:77-78, 121-127)
    is_coordinator = jax.process_index() == 0
    verbose = verbose and is_coordinator

    base_step = make_train_step(
        model, optimizer, num_microbatches, augment_fn=ls["augment_fn"],
        grad_reduction=config.get("microbatch_grad_reduction", "sum"))
    bound_step = pipeline.bind_train_step(
        base_step, pass_indices=ls.get("augment_pass_indices", False))
    step_fn = jax.jit(bound_step, donate_argnums=0)
    eval_step_fn = jax.jit(
        pipeline.bind_eval_step(make_eval_step(model, ls["preprocess_fn"])))

    writer = tb.SummaryWriter(log_dir) if is_coordinator else tb.NullWriter()
    # Per-step randomness (dropout masks, flips, crops) uses the RBG PRNG by
    # default: threefry bit generation costs ~43% of a WRN-28-10 step on
    # v5e (113ms -> 64ms without dropout; 71ms with rbg, measured), while
    # rbg is hardware-accelerated. Statistically equivalent for
    # augmentation/dropout; the reference uses torch's Philox streams, so
    # there is no bit-level parity to preserve.
    root_rng = jax.random.key(seed, impl=config.get("prng_impl", "rbg"))

    # A synchronous loss fetch per step is only needed when a batch-unit
    # consumer requires the fresh value.
    strategy_needs_loss = getattr(strategy, "requires_loss", False)
    sync_batch_loss = (
        (scheduler is not None and scheduler.requires_loss
         and scheduler_step_unit == "batch")
        or (strategy_needs_loss and strategy.unit == "batch"))

    # steps_per_dispatch (off by default, = reference cadence): scan K steps
    # inside one jit dispatch, amortizing per-dispatch host latency. Same
    # training trajectory (identical per-step rng/lr derivations, modulo
    # XLA's compilation-dependent float reassociation); the
    # observable divergences, documented here, are (a) batch-unit checkpoint
    # triggers that fire mid-chunk save the chunk-end state at the chunk-end
    # step (align `frequency` to a multiple of K for exact parity), and
    # (b) profile_steps forces K=1 for per-step trace boundaries.
    # `steps_per_dispatch: auto` probes the dispatch round-trip latency and
    # picks K from it — on a PCIe-attached host the probe lands at K=1
    # (chunking buys nothing), on a high-RTT tunneled host at K=8-16
    # (measured: this tunnel's RTT varies 4-12ms day to day, ROADMAP #3).
    spd_cfg = config.get("steps_per_dispatch", 1)
    if isinstance(spd_cfg, str) and spd_cfg.lower() == "auto":
        steps_per_dispatch = _auto_steps_per_dispatch(verbose)
    else:
        steps_per_dispatch = int(spd_cfg)
    if steps_per_dispatch > 1 and (sync_batch_loss or profile_steps):
        if verbose:
            print("steps_per_dispatch: disabled (a batch-unit loss consumer "
                  "or profile window needs per-step dispatches).")
        steps_per_dispatch = 1
    if steps_per_dispatch > 1 and not getattr(
            pipeline, "supports_chunking", False):
        # streaming feeds carry no chunk dim; scanning them would consume
        # the microbatch axis as steps (decode-bound anyway)
        if verbose:
            print("steps_per_dispatch: disabled (this pipeline's feeds are "
                  "not chunked).")
        steps_per_dispatch = 1
    chunk_fn = None
    if steps_per_dispatch > 1:
        chunk_fn = jax.jit(make_chunked_train_step(bound_step, root_rng),
                           donate_argnums=0)

    # Async checkpoint writes (default on; `async_checkpoint: false` for
    # strict sync semantics): serialization/D2H/GC run on a worker thread;
    # a WRN-sized save no longer stalls the step loop. Atomic tmp+rename
    # plus newest-COMMON-step resume (maybe_load_checkpoints) keep the
    # crash-resume contract: a kill between per-kind writes resumes from
    # the last complete save. The snapshot jit exists on every process
    # (multi-host global arrays dispatch SPMD); the writer only on the
    # coordinator, which alone touches the filesystem.
    async_ckpt = bool(config.get("async_checkpoint", True))
    checkpointer = (AsyncCheckpointer()
                    if async_ckpt and is_coordinator else None)
    snapshot_fn = (jax.jit(
        lambda t: jax.tree_util.tree_map(jnp.copy, t))
        if async_ckpt else None)
    save_kw = {"checkpointer": checkpointer, "snapshot_fn": snapshot_fn}

    pending = None  # (step_id, device_metrics, n_steps), one-dispatch lag
    t_start, steps_at_start = time.time(), global_step
    last_drain_t = [time.time()]
    last_drain_step = [global_step]

    def drain(p):
        step0, m, n = p
        stacked = {k: np.asarray(v) for k, v in m.items()}
        host = None
        for i in range(n):
            step_id = step0 + i
            # chunked metrics are (n,)-stacked even at n == 1; index by the
            # array's rank, not n (float() on a 1-elem array is deprecated)
            host = {k: float(v[i]) if getattr(v, "ndim", 0) >= 1
                    else float(v) for k, v in stacked.items()}
            if verbose and (step_id % log_every == 0):
                print(f"global step: {step_id}... loss: {host['loss']}")
            for name, v in host.items():
                writer.add_scalar(f"train/{name}", v, step_id)
        # throughput as a first-class logged metric (SURVEY.md §5.1; the
        # reference logs nothing beyond loss/err)
        last_step = step0 + n - 1
        now = time.time()
        dsteps = last_step + 1 - last_drain_step[0]
        if now > last_drain_t[0] and dsteps > 0:
            writer.add_scalar(
                "train/images_per_sec",
                dsteps * config.get("batch_size") / (now - last_drain_t[0]),
                last_step)
        last_drain_t[0] = now
        last_drain_step[0] = last_step + 1
        return host

    def done():
        return global_step >= max_steps

    while not done():
        epoch = strategy.epoch_step
        for n_steps, feed in pipeline.train_feed(
                epoch, steps_per_dispatch,
                budget=max_steps - global_step):
            if n_steps <= 0 or global_step >= max_steps:
                break
            if profile_steps and global_step == int(profile_steps[0]):
                jax.profiler.start_trace(log_dir)
            # per-step lrs (and cycled momentum, when the scheduler does
            # that) for this dispatch; non-loss batch schedulers advance
            # here (plateau batch schedulers imply sync_batch_loss and K=1,
            # and step after the loss arrives below)
            lrs, moms = [], []
            cycles_momentum = scheduler is not None and scheduler.cycles_momentum
            for _ in range(n_steps):
                lrs.append(scheduler.get_lr() if scheduler else base_lr_of(
                    config.get("optimizer_args")))
                if cycles_momentum:
                    moms.append(scheduler.get_momentum())
                if (scheduler and scheduler_step_unit == "batch"
                        and not scheduler.requires_loss):
                    scheduler.step()
            if chunk_fn is not None:
                # the pipeline already cut the feed to n_steps host-side
                # (budget=...); one compiled function serves each distinct
                # chunk length (full K + at most the epoch/budget tails)
                hp = jnp.asarray(lrs, jnp.float32)
                if cycles_momentum:
                    hp = {"lr": hp, "momentum": jnp.asarray(moms, jnp.float32)}
                train_state, metrics = chunk_fn(
                    train_state, feed, hp, jnp.int32(global_step))
            else:
                rng = jax.random.fold_in(root_rng, global_step)
                hp = jnp.float32(lrs[0])
                if cycles_momentum:
                    hp = {"lr": hp, "momentum": jnp.float32(moms[0])}
                train_state, metrics = step_fn(
                    train_state, *feed, hp, rng)
            cur = (global_step, metrics, n_steps)
            if profile_steps and global_step == int(profile_steps[1]):
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()

            if sync_batch_loss:
                host = drain(cur)
                loss_now = host["loss"]
                if (scheduler and scheduler_step_unit == "batch"
                        and scheduler.requires_loss):
                    scheduler.step(loss_now)
                if strategy.observe(unit="batch", loss=loss_now):
                    _save_all(checkpoint_dir, strategy, train_state,
                              scheduler, steps=global_step + 1, **save_kw)
            else:
                if pending is not None:
                    drain(pending)
                pending = cur
                # In the async branch the strategy is either frequency-based
                # or an epoch-unit performance strategy: a batch observation
                # can't fire with a loss, so no loss fetch is needed.
                fired = False
                for _ in range(n_steps):
                    fired = strategy.observe(unit="batch", loss=None) or fired
                if fired:
                    _save_all(checkpoint_dir, strategy, train_state,
                              scheduler, steps=global_step + n_steps,
                              **save_kw)

            global_step += n_steps
            if done():
                break

        if pending is not None:
            drain(pending)
            pending = None

        # per-epoch validation (training.py:147-171)
        val_metrics = evaluation_loop(
            pipeline, eval_step_fn, train_state["params"],
            train_state["model_state"])
        val_loss = val_metrics["loss"]
        if scheduler and scheduler_step_unit == "epoch":
            scheduler.step(val_loss if scheduler.requires_loss else None)
        if verbose:
            print(f"epoch: {epoch}... validation loss: {val_loss}")
        for name, v in val_metrics.items():
            writer.add_scalar(f"val/{name}", v, epoch)
        if strategy.observe(unit="epoch", loss=val_loss):
            # steps = the COMPLETED optimizer-step count (global_step here,
            # already advanced past the epoch). The reference saves epoch
            # checkpoints at global_step+1 (training.py:161-171) even
            # though its global_step was also already incremented — an
            # off-by-one that makes its resume SKIP one training step
            # after every epoch-boundary restore (found round 3 when a
            # resumed run failed trajectory-equality vs a straight run;
            # deliberate divergence, documented in PARITY.md).
            _save_all(checkpoint_dir, strategy, train_state, scheduler,
                      steps=global_step, **save_kw)

    try:
        if checkpointer is not None:
            checkpointer.close()  # flush pending writes; may re-raise a
            # deferred background-writer error
    finally:
        writer.close()  # TB events flush even on a failed-save run
    elapsed = time.time() - t_start
    steps_done = global_step - steps_at_start
    images_per_sec = (steps_done * config.get("batch_size") / elapsed
                      if elapsed > 0 else float("nan"))
    ls["train_state"] = train_state
    ls["global_step"] = global_step
    return {
        "global_step": global_step,
        "steps_done": steps_done,
        "elapsed_s": elapsed,
        "images_per_sec": images_per_sec,
    }
