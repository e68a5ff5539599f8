"""Cross-cutting utilities: checkpointing, logging, visualization."""

from bifold_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from bifold_tpu.utils.logging import Writer

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint", "Writer"]
