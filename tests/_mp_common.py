"""Shared tiny-model setup for the multi-process (dcn=2) test.

Imported both by the parent test (unsharded reference numerics) and by the
two `_mp_worker.py` subprocesses (sharded run), so every side builds the
IDENTICAL model, params, optimizer, and global batch.
"""

from __future__ import annotations

import numpy as np

GLOBAL_BATCH = 4
IMG, CTX = 32, 2


def global_batch_np():
    rng = np.random.default_rng(0)
    b, s = GLOBAL_BATCH, IMG
    batch = {
        "rgb": rng.standard_normal((b, 3, s, s)).astype(np.float32),
        "depth": rng.random((b, 1, s, s)).astype(np.float32),
        "mask": (rng.random((b, 1, s, s)) > 0.5).astype(np.float32),
        "instruction": rng.integers(0, 30000, (b, 16)).astype(np.int32),
        "rgb_context": rng.standard_normal((b, CTX, 3, s, s)).astype(np.float32),
        "context_attention_mask": rng.integers(0, 2, (b, CTX)).astype(np.int32),
    }
    for h in ("left_pick", "right_pick", "left_place", "right_place"):
        batch[f"{h}_heatmap"] = rng.random((b, s, s)).astype(np.float32)
    return batch


def build():
    """(model, loss_fn, tx, trainable_mask_fn) — SGD for exact
    sharded-vs-unsharded numerics (Adam's first-step sign(g) amplifies
    float noise; CLAUDE.md correctness note)."""
    import optax

    from bifold_tpu.losses import build_loss
    from bifold_tpu.models import build_model, trainable_mask

    model = build_model({
        "name": "siglip_sequential", "image_size": IMG, "is_bimanual": True,
        "patch_size": 16, "automodel_name": "tiny", "dim": 64, "lora": True,
        "r": 4, "depth": 2, "heads": 4, "context_length": CTX,
        "dropout": 0.0, "lora_dropout": 0.0,
    })
    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": True,
                          "mask_pick_heatmap": False})
    tx = optax.sgd(1e-3)
    return model, loss_fn, tx, trainable_mask


def init_params(model, batch_jnp):
    import jax

    return jax.jit(
        lambda: model.init(jax.random.key(0), batch_jnp, deterministic=True)
    )()["params"]
