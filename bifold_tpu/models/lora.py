"""LoRA adapters as Flax modules.

Equivalent capability to the reference's peft.LoraModel wrapping of SigLIP
q/v projections (/root/reference/bifold/models/siglip.py:33-40): frozen base
kernel + trainable rank-r update, out = x W + (dropout(x) A) B * (alpha / r),
with peft's init (A ~ kaiming-uniform, B = 0 so the adapter starts as a
no-op). Trainability is enforced by the optimizer-side mask
(:func:`bifold_tpu.models.trainable.trainable_mask`), which freezes backbone
params but always trains ``lora_a``/``lora_b``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["LoRADense"]


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    # peft initializes lora_A with kaiming_uniform(a=sqrt(5)) over (r, in)
    fan_in = shape[0]
    bound = float(np.sqrt(6.0 / ((1 + 5) * fan_in)))
    import jax

    return jax.random.uniform(key, shape, dtype, -bound, bound)


class LoRADense(nn.Module):
    features: int
    rank: int
    alpha: float = 1.0
    use_bias: bool = True
    lora_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        base = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                        name="base")(x)
        a = self.param("lora_a", _kaiming_uniform, (x.shape[-1], self.rank))
        b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features))
        h = x
        if self.lora_dropout > 0:
            h = nn.Dropout(self.lora_dropout)(h, deterministic=deterministic)
        update = (h.astype(self.dtype) @ a.astype(self.dtype)) @ b.astype(self.dtype)
        return base + update * (self.alpha / self.rank)
