"""Model zoo: TimeSformer, ViViT, MViT, MaskFeat."""

from videotransformer_tpu.models.timesformer import TimeSformer, get_vit_base_patch16_224
from videotransformer_tpu.models.vivit import ViViT

__all__ = ["TimeSformer", "ViViT", "get_vit_base_patch16_224"]
