from bifold_tpu.models.backbones.siglip_backbone import (
    SIGLIP_BASE_CONFIGS,
    SiglipBackbone,
    SiglipConfig,
)
from bifold_tpu.models.backbones.clip_backbone import (
    CLIP_CONFIGS,
    CLIP_TEXT_CONFIGS,
    ClipBackbone,
    ClipConfig,
)
from bifold_tpu.models.backbones.t5_backbone import (
    T5_CONFIGS,
    T5Config,
    T5Encoder,
    resolve_t5_config,
)

__all__ = [
    "SiglipBackbone",
    "SiglipConfig",
    "SIGLIP_BASE_CONFIGS",
    "ClipBackbone",
    "ClipConfig",
    "CLIP_CONFIGS",
    "CLIP_TEXT_CONFIGS",
    "T5Encoder",
    "T5Config",
    "T5_CONFIGS",
    "resolve_t5_config",
]
