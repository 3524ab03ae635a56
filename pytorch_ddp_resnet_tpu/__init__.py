"""pytorch_ddp_resnet_tpu — a TPU-native (JAX / XLA / pjit / Pallas) residual
network training framework.

Re-implements the full capability surface of the reference
``lucaslingle/pytorch_ddp_resnet`` (a torch DDP CIFAR/ImageNet ResNet trainer)
as an idiomatic single-process SPMD JAX framework:

- spec-string-driven ResNet-v1 / ResNet-v2 (pre-activation) / Wide-ResNet
  models as functional pytrees in NHWC layout (reference:
  resnet/architectures/resnet.py, residual_block.py),
- one jitted train step: on-device fused augmentation -> forward/backward ->
  gradient accumulation -> optimizer update, with gradients all-reduced over
  the ICI mesh by XLA (replacing DDP's bucketed NCCL allreduce,
  reference: script.py:64-71),
- YAML-driven run layout ``models_dir/<run_name>/{config.yaml, checkpoints/,
  tensorboard_logs/}`` (reference: script.py:32-47),
- torch-semantics optimizers/schedulers, checkpoint strategies, and
  ``{kind}_{steps}`` checkpoint files with newest-5 retention
  (reference: resnet/utils/{optim_util,checkpoint_util}.py).
"""

__version__ = "0.1.0"
