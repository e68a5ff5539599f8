from bifold_tpu.models.backbones.siglip_backbone import (
    SIGLIP_BASE_CONFIGS,
    SiglipBackbone,
    SiglipConfig,
)
from bifold_tpu.models.backbones.clip_backbone import (
    CLIP_CONFIGS,
    ClipBackbone,
    ClipConfig,
)

__all__ = [
    "SiglipBackbone",
    "SiglipConfig",
    "SIGLIP_BASE_CONFIGS",
    "ClipBackbone",
    "ClipConfig",
    "CLIP_CONFIGS",
]
