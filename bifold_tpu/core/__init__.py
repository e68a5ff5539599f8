from bifold_tpu.core.registry import Registry

__all__ = ["Registry"]
