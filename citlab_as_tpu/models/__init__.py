from citlab_as_tpu.models.arunet import ARUNet, per_image_standardization
from citlab_as_tpu.models.backbones import get_backbone

__all__ = ["ARUNet", "per_image_standardization", "get_backbone"]
