from pytorch_ddp_resnet_tpu.models.resnet import ResNet

__all__ = ["ResNet"]
