"""gpipe pipeline parallelism: exact fwd+grad equivalence vs the sequential
stack, on real multi-device CPU meshes (conftest forces 8 host devices).

The reference has no pipelining (single-GPU; SURVEY.md §2.4) — these tests pin
the TPU-native capability addition: the [depth, ...] stacked-param layout
shards over a pp mesh axis and the GPipe schedule reproduces the sequential
stack bit-for-bit through both the forward and jax.grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bifold_tpu.parallel.pipeline import gpipe


def _mlp_body(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _mlp_stack(depth, dim, key):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (depth, dim, dim), jnp.float32) / np.sqrt(dim),
        "b": 0.01 * jax.random.normal(kb, (depth, dim), jnp.float32),
    }


def _sequential(body, stacked, x):
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(depth):
        x = body(jax.tree_util.tree_map(lambda l: l[i], stacked), x)
    return x


@pytest.mark.parametrize("pp,microbatches,depth", [(2, 2, 4), (4, 3, 8), (1, 2, 3)])
def test_gpipe_forward_matches_sequential(pp, microbatches, depth):
    mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))
    dim, batch = 16, 6
    params = _mlp_stack(depth, dim, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (batch, dim), jnp.float32)

    ref = _sequential(_mlp_body, params, x)
    out = jax.jit(lambda p, xx: gpipe(
        _mlp_body, p, xx, mesh=mesh, microbatches=microbatches))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_grads_match_sequential():
    pp, microbatches, depth, dim, batch = 2, 3, 4, 16, 6
    mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))
    params = _mlp_stack(depth, dim, jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (batch, dim), jnp.float32)

    def loss_seq(p, xx):
        return jnp.sum(jnp.square(_sequential(_mlp_body, p, xx)))

    def loss_pp(p, xx):
        return jnp.sum(jnp.square(gpipe(
            _mlp_body, p, xx, mesh=mesh, microbatches=microbatches)))

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g_ref, g_pp)


def test_gpipe_composes_with_dp_batch_sharding():
    """Manual over pp only; the dp axis stays automatic, so a dp-sharded batch
    flows through the pipeline without replication at feed time."""
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("dp", "pp"))
    depth, dim, batch, microbatches = 4, 16, 8, 2
    params = _mlp_stack(depth, dim, jax.random.key(4))
    x = jax.random.normal(jax.random.key(5), (batch, dim), jnp.float32)
    ref = _sequential(_mlp_body, params, x)

    x_sh = jax.device_put(x, NamedSharding(mesh, P("dp")))
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    out = jax.jit(lambda p, xx: gpipe(
        _mlp_body, p, xx, mesh=mesh, microbatches=microbatches))(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_transformer_block_stack():
    """Pipeline the REAL TransformerBlock over its native stacked-param
    layout (the checkpoint format) and match the Transformer module's own
    scan path — fwd and grads."""
    from bifold_tpu.models.layers import Transformer, TransformerBlock

    depth, dim, heads, batch, n = 4, 32, 4, 4, 12
    tower = Transformer(dim=dim, depth=depth, heads=heads, mlp_dim=2 * dim,
                        fused_qkv=True, scan_layers=True)
    x = jax.random.normal(jax.random.key(6), (batch, n, dim), jnp.float32)
    variables = tower.init(jax.random.key(7), x, deterministic=True)
    ref = tower.apply(variables, x, deterministic=True)

    stacked = variables["params"]["blocks"]["block"]
    block = TransformerBlock(dim=dim, heads=heads, mlp_dim=2 * dim,
                             fused_qkv=True)

    def body(p, h):
        return block.apply({"params": p}, h, None, deterministic=True)

    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    out = jax.jit(lambda p, xx: gpipe(
        body, p, xx, mesh=mesh, microbatches=2))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_seq(p):
        return jnp.mean(jnp.square(tower.apply(
            {"params": {"blocks": {"block": p}}}, x, deterministic=True)))

    def loss_pp(p):
        return jnp.mean(jnp.square(gpipe(
            body, p, x, mesh=mesh, microbatches=2)))

    g_ref = jax.grad(loss_seq)(stacked)
    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_ref, g_pp)


def test_make_mesh_pp_axis():
    """make_mesh grows a trailing pp axis on demand and gpipe runs on it."""
    from bifold_tpu import parallel

    mesh = parallel.make_mesh({"dp": 2, "pp": 2},
                              devices=jax.devices()[:4])
    assert mesh.axis_names == ("dp", "fsdp", "tp", "pp")
    assert dict(mesh.shape) == {"dp": 2, "fsdp": 1, "tp": 1, "pp": 2}
    # batch axes unchanged: pp never shards the batch
    assert parallel.batch_sharding(mesh).spec == P(("dp", "fsdp"))

    params = _mlp_stack(4, 16, jax.random.key(9))
    x = jax.random.normal(jax.random.key(10), (8, 16), jnp.float32)
    out = jax.jit(lambda p, xx: gpipe(
        _mlp_body, p, xx, mesh=mesh, microbatches=2))(params, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sequential(_mlp_body, params, x)),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_validation_errors():
    mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    params = _mlp_stack(3, 8, jax.random.key(8))  # 3 % 2 != 0
    x = jnp.zeros((4, 8))
    with pytest.raises(ValueError, match="not divisible by pp"):
        gpipe(_mlp_body, params, x, mesh=mesh, microbatches=2)
    params = _mlp_stack(4, 8, jax.random.key(8))
    with pytest.raises(ValueError, match="not divisible by microbatches"):
        gpipe(_mlp_body, params, x, mesh=mesh, microbatches=3)
