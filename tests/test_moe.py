"""MoE FFN + expert parallelism (ops/moe.py): routing semantics, the dense
reference, and expert_parallel_ffn == dense on the CPU mesh (fwd + grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu import parallel
from bifold_tpu.ops.moe import (expert_parallel_ffn, init_moe_params,
                                moe_ffn, route)


@pytest.fixture()
def devices():
    assert len(jax.devices()) >= 8
    return jax.devices()


def _params(key, d=16, h=32, e=8):
    return init_moe_params(key, d, h, e)


def test_top1_routing_matches_manual():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((12, 16)), jnp.float32)
    p = _params(jax.random.key(1), e=4)
    out = moe_ffn(x, p, top_k=1, capacity_factor=8.0)  # no drops

    probs = jax.nn.softmax(x @ p["router"], axis=-1)
    for t in range(12):
        e = int(jnp.argmax(probs[t]))
        h = jax.nn.gelu(x[t] @ p["w1"][e] + p["b1"][e], approximate=False)
        y = (h @ p["w2"][e] + p["b2"][e]) * probs[t, e]
        np.testing.assert_allclose(np.asarray(out[t]), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def test_capacity_overflow_drops_late_tokens():
    """All tokens route to one expert; capacity 2 -> tokens beyond the first
    two contribute zero (standard static-capacity semantics)."""
    d, e = 8, 4
    p = _params(jax.random.key(0), d=d, h=16, e=e)
    # router forced: expert 0 wins for every token
    p["router"] = jnp.zeros((d, e)).at[:, 0].set(1.0)
    x = jnp.ones((8, d), jnp.float32)
    dispatch, combine = route(x, p["router"], top_k=1, capacity=2)
    kept = np.asarray(jnp.sum(dispatch, axis=(1, 2)))
    np.testing.assert_array_equal(kept, [1, 1, 0, 0, 0, 0, 0, 0])
    out = moe_ffn(x, p, top_k=1, capacity_factor=2 * e / 8)  # cap == 2
    np.testing.assert_array_equal(np.asarray(out[2:]), 0.0)
    assert float(jnp.abs(out[0]).sum()) > 0


@pytest.mark.parametrize("top_k", [1, 2])
def test_expert_parallel_matches_dense(devices, top_k):
    mesh = parallel.make_mesh({"ep": 8}, devices=devices[:8])
    rng = np.random.default_rng(2)
    t, d, h, e = 64, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    p = _params(jax.random.key(3), d=d, h=h, e=e)

    # generous capacity -> nothing drops on either path, so per-shard
    # capacity bookkeeping differences vanish and outputs match exactly
    dense = moe_ffn(x, p, top_k=top_k, capacity_factor=16.0)
    ep_out = jax.jit(lambda xx, pp: expert_parallel_ffn(
        xx, pp, mesh, top_k=top_k, capacity_factor=16.0))(x, p)
    np.testing.assert_allclose(np.asarray(ep_out), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


def test_expert_parallel_grads_match_dense(devices):
    mesh = parallel.make_mesh({"dp": 2, "ep": 4}, devices=devices[:8])
    rng = np.random.default_rng(4)
    t, d, h, e = 32, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((t, d)), jnp.float32)
    p = _params(jax.random.key(5), d=d, h=h, e=e)

    def loss_dense(x, p):
        return jnp.sum(moe_ffn(x, p, top_k=1, capacity_factor=16.0) ** 2)

    def loss_ep(x, p):
        return jnp.sum(expert_parallel_ffn(x, p, mesh, top_k=1,
                                           capacity_factor=16.0) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1))(x, p)
    ge = jax.jit(jax.grad(loss_ep, argnums=(0, 1)))(x, p)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_route_aux_loss_balance_extremes():
    """Switch load-balance loss: 1.0 at perfect balance, E at collapse."""
    d, e = 8, 4
    # logits engineered: tokens split evenly across experts
    router = jnp.eye(d, e) * 10.0
    x = jnp.eye(8, d, dtype=jnp.float32)[:, :d]  # token t -> expert t%4... use explicit
    x = jnp.concatenate([jnp.eye(4, d)] * 2, axis=0)  # 8 tokens, 2 per expert
    _, _, aux = route(x, router, top_k=1, capacity=8, return_aux=True)
    np.testing.assert_allclose(float(aux), 1.0, atol=0.05)

    collapsed = jnp.zeros((d, e)).at[:, 1].set(10.0)
    _, _, aux_c = route(jnp.ones((8, d)), collapsed, top_k=1, capacity=8,
                        return_aux=True)
    np.testing.assert_allclose(float(aux_c), e, atol=0.05)


def test_moe_feedforward_module_matches_op():
    """The flax MoEFeedForward wrapper == ops.moe_ffn on its own params,
    and sows the load-balance loss."""
    from bifold_tpu.models.layers import MoEFeedForward

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
    mod = MoEFeedForward(dim=16, hidden_dim=32, num_experts=4, top_k=2,
                         capacity_factor=4.0)
    variables = mod.init(jax.random.key(0), x)
    out, sown = mod.apply(variables, x, mutable=["moe_losses"])
    ref, aux = moe_ffn(x, variables["params"], top_k=2, capacity_factor=4.0,
                       return_aux=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    sown_aux = jax.tree_util.tree_leaves(sown["moe_losses"])[0]
    np.testing.assert_allclose(float(sown_aux), float(aux), rtol=1e-6)


def test_moe_model_trains_with_aux_loss(devices):
    """model.moe_experts from config: the fusion stack's FFNs become MoE,
    the sown per-layer load-balance losses ride the scanned depth axis into
    the train loss, and router + expert params receive gradients."""
    import optax

    from bifold_tpu.losses import build_loss
    from bifold_tpu.models import build_model

    model = build_model({
        "name": "siglip", "image_size": 32, "is_bimanual": False,
        "patch_size": 16, "automodel_name": "tiny", "dim": 32, "depth": 2,
        "heads": 4, "lora": False, "moe_experts": 4, "moe_top_k": 1,
        "moe_aux_weight": 0.02,
    })
    assert model.moe_experts == 4

    rng = np.random.default_rng(0)
    b, s = 4, 32
    batch = {
        "rgb": jnp.asarray(rng.standard_normal((b, 3, s, s)), jnp.float32),
        "instruction": jnp.asarray(rng.integers(0, 100, (b, 16)), jnp.int32),
        "mask": jnp.asarray(np.ones((b, 1, s, s)), jnp.float32),
        "pick_heatmap": jnp.asarray(rng.random((b, s, s)), jnp.float32),
        "place_heatmap": jnp.asarray(rng.random((b, s, s)), jnp.float32),
    }
    variables = jax.jit(
        lambda k: model.init(k, batch, deterministic=True))(jax.random.key(0))
    params = variables["params"]
    moe_leaves = [p for p in jax.tree_util.tree_flatten_with_path(params)[0]
                  if "router" in jax.tree_util.keystr(p[0])]
    assert moe_leaves, "fusion blocks must carry MoE routers"
    # scanned stack: router stacked over depth
    assert moe_leaves[0][1].shape == (2, 32, 4)

    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": False,
                          "mask_pick_heatmap": False})
    tx = optax.sgd(1e-2)
    step = parallel.make_train_step(model, loss_fn, tx, donate=False,
                                    moe_aux_weight=0.02)
    state = (params, tx.init(params), {}, jax.random.key(1))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "moe_load_balance" in metrics
    aux = float(metrics["moe_load_balance"])
    assert 0.9 <= aux <= 4.1  # within [1, E] up to float slack
    # router moved under SGD -> it received a gradient through the gates
    def leaf(tree, match):
        return [v for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
                if match in jax.tree_util.keystr(p)]
    delta = np.abs(np.asarray(leaf(state2[0], "router")[0])
                   - np.asarray(leaf(params, "router")[0])).max()
    assert delta > 0
