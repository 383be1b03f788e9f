"""Core transformer op library (TPU-native counterpart of reference transformer.py)."""

from videotransformer_tpu.ops.blocks import (
    Attention,
    BasicTransformerBlock,
    ClassificationHead,
    DividedSpatialAttention,
    DividedTemporalAttention,
    FFN,
    JointAttention,
    PatchEmbed,
    TransformerContainer,
    drop_path,
    get_sine_cosine_pos_emb,
)

__all__ = [
    "Attention",
    "BasicTransformerBlock",
    "ClassificationHead",
    "DividedSpatialAttention",
    "DividedTemporalAttention",
    "FFN",
    "JointAttention",
    "PatchEmbed",
    "TransformerContainer",
    "drop_path",
    "get_sine_cosine_pos_emb",
]
