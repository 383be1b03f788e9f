"""Model zoo: TimeSformer, ViViT, MViT, MaskFeat."""

from videotransformer_tpu.models.timesformer import TimeSformer, get_vit_base_patch16_224
from videotransformer_tpu.models.vivit import ViViT
from videotransformer_tpu.models.maskfeat import MaskFeat

__all__ = ["TimeSformer", "ViViT", "MaskFeat", "get_vit_base_patch16_224"]
