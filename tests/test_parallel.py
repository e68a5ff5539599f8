"""Mesh/sharding/train-step on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from bifold_tpu import parallel


def test_make_mesh_shapes(devices):
    mesh = parallel.make_mesh({"dp": -1, "fsdp": 1, "tp": 1})
    assert dict(mesh.shape) == {"dp": 8, "fsdp": 1, "tp": 1}
    mesh2 = parallel.make_mesh({"dp": -1, "fsdp": 2, "tp": 1})
    assert dict(mesh2.shape) == {"dp": 4, "fsdp": 2, "tp": 1}
    with pytest.raises(AssertionError):
        parallel.make_mesh({"dp": 3, "fsdp": 1, "tp": 1})


def test_fsdp_param_sharding_spec(devices):
    mesh = parallel.make_mesh({"dp": -1, "fsdp": 2, "tp": 1})
    params = {"big": jnp.zeros((1024, 768)), "small": jnp.zeros((16,))}
    sh = parallel.param_sharding(mesh, params, min_size=1000)
    assert sh["big"].spec == P("fsdp", None)  # largest divisible axis sharded
    assert sh["small"].spec == P()      # below min_size -> replicated


def test_shard_batch_and_divisibility(devices):
    mesh = parallel.make_mesh({"dp": -1, "fsdp": 1, "tp": 1})
    batch = {"rgb": np.zeros((8, 3, 16, 16), np.float32), "meta": "keep"}
    out = parallel.shard_batch(mesh, batch)
    assert out["meta"] == "keep"
    assert out["rgb"].sharding.spec == P(("dp", "fsdp"))
    with pytest.raises(ValueError, match="divisible"):
        parallel.shard_batch(mesh, {"x": np.zeros((3, 4), np.float32)})


def test_train_step_dp_equals_single_device(devices):
    """The sharded step must compute the same update as an unsharded one."""
    import flax.linen as nn
    import optax

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True):
            x = batch["x"].reshape(batch["x"].shape[0], -1)
            h = nn.Dense(16)(x)
            return {"y": nn.Dense(4)(nn.relu(h))}

    def loss_fn(out, batch):
        loss = jnp.mean((out["y"] - batch["t"]) ** 2)
        return loss, {"mse": loss}

    model = Tiny()
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((8, 8)).astype(np.float32),
             "t": rng.standard_normal((8, 4)).astype(np.float32)}
    params = model.init(jax.random.key(0), batch)["params"]
    tx = optax.adam(1e-2)

    # unsharded reference update
    def plain_step(params, opt_state):
        grads = jax.grad(lambda p: loss_fn(
            model.apply({"params": p}, batch), batch)[0])(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates)

    expect = plain_step(params, tx.init(params))

    mesh = parallel.make_mesh({"dp": -1, "fsdp": 1, "tp": 1})
    step = parallel.make_train_step(model, loss_fn, tx, donate=False)
    sp = parallel.param_sharding(mesh, params)
    p_sharded = jax.device_put(params, sp)
    o_sharded = jax.device_put(tx.init(params),
                               parallel.param_sharding(mesh, tx.init(params)))
    b_sharded = parallel.shard_batch(mesh, batch)
    (p_new, _, _, _), metrics = step(
        (p_sharded, o_sharded, {}, jax.random.key(1)), b_sharded)
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.isfinite(float(metrics["loss"]))


def test_fsdp_step_matches_dp(devices):
    """fsdp=2 (params sharded) must match dp-only numerics."""
    import flax.linen as nn
    import optax

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True):
            return {"y": nn.Dense(64)(batch["x"])}

    def loss_fn(out, batch):
        loss = jnp.mean(out["y"] ** 2)
        return loss, {}

    model = Tiny()
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((8, 128)).astype(np.float32)}
    params = model.init(jax.random.key(0), batch)["params"]
    tx = optax.adam(1e-2)

    results = []
    for mesh_cfg in ({"dp": -1, "fsdp": 1, "tp": 1}, {"dp": -1, "fsdp": 2, "tp": 1}):
        mesh = parallel.make_mesh(mesh_cfg)
        step = parallel.make_train_step(model, loss_fn, tx, donate=False)
        p = jax.device_put(params, parallel.param_sharding(mesh, params, min_size=64))
        o = jax.device_put(tx.init(params),
                           parallel.param_sharding(mesh, tx.init(params), min_size=64))
        b = parallel.shard_batch(mesh, batch)
        (p_new, _, _, _), m = step((p, o, {}, jax.random.key(1)), b)
        results.append((jax.tree_util.tree_map(np.asarray, p_new),
                        float(m["loss"])))
    (p1, l1), (p2, l2) = results
    assert abs(l1 - l2) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_tp_step_matches_dp(devices):
    """tp=2 (Megatron-sharded attention/MLP kernels) must match dp-only
    numerics on a real transformer block."""
    import optax
    from bifold_tpu.models.layers import Transformer

    model = Transformer(dim=64, depth=2, heads=4, mlp_dim=128, fused_qkv=False)
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((8, 16, 64)).astype(np.float32)}

    class Wrap:
        def apply(self, variables, b, deterministic=True, rngs=None):
            return {"y": model.apply(variables, b["x"],
                                     deterministic=deterministic, rngs=rngs)}

    def loss_fn(out, b):
        loss = jnp.mean(out["y"] ** 2)
        return loss, {}

    params = model.init(jax.random.key(0), batch["x"])["params"]
    # SGD so the comparison sees raw gradient numerics (Adam's first-step
    # sign(g) behavior amplifies reduction-order noise on near-zero grads)
    tx = optax.sgd(1e-1)

    results = []
    for mesh_cfg in ({"dp": -1, "fsdp": 1, "tp": 1},
                     {"dp": -1, "fsdp": 1, "tp": 2}):
        mesh = parallel.make_mesh(mesh_cfg)
        sp = parallel.param_sharding(mesh, params, min_size=128)
        if mesh_cfg["tp"] == 2:
            flat = jax.tree_util.tree_flatten_with_path(sp)[0]
            assert any("tp" in str(s.spec) for _, s in flat), "tp never applied"
        step = parallel.make_train_step(Wrap(), loss_fn, tx, donate=False)
        p = jax.device_put(params, sp)
        o = jax.device_put(tx.init(params),
                           parallel.param_sharding(mesh, tx.init(params), min_size=128))
        b = parallel.shard_batch(mesh, batch)
        (p_new, _, _, _), m = step((p, o, {}, jax.random.key(1)), b)
        results.append((jax.tree_util.tree_map(np.asarray, p_new), float(m["loss"])))
    (p1, l1), (p2, l2) = results
    assert abs(l1 - l2) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_hybrid_dcn_mesh(devices):
    """(dcn, dp, fsdp, tp) hybrid mesh: batch shards across dcn x dp, step
    numerics match the flat mesh."""
    import optax
    import flax.linen as nn

    mesh = parallel.make_mesh({"dcn": 2, "dp": -1, "fsdp": 1, "tp": 1})
    assert dict(mesh.shape) == {"dcn": 2, "dp": 4, "fsdp": 1, "tp": 1}
    batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    out = parallel.shard_batch(mesh, batch)
    assert "dcn" in str(out["x"].sharding.spec)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, b, deterministic=True):
            return {"y": nn.Dense(4)(b["x"])}

    def loss_fn(o, b):
        return jnp.mean(o["y"] ** 2), {}

    model = Tiny()
    params = model.init(jax.random.key(0), batch)["params"]
    tx = optax.sgd(0.1)
    results = []
    for cfg in ({"dp": -1, "fsdp": 1, "tp": 1}, {"dcn": 2, "dp": -1, "fsdp": 1, "tp": 1}):
        m = parallel.make_mesh(cfg)
        step = parallel.make_train_step(model, loss_fn, tx, donate=False)
        p = jax.device_put(params, parallel.param_sharding(m, params))
        o = jax.device_put(tx.init(params), parallel.param_sharding(m, tx.init(params)))
        (p_new, _, _, _), metrics = step((p, o, {}, jax.random.key(1)),
                                         parallel.shard_batch(m, batch))
        results.append((jax.tree_util.tree_map(np.asarray, p_new), float(metrics["loss"])))
    (p1, l1), (p2, l2) = results
    assert abs(l1 - l2) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_partitioned_grads_match_full_grads(devices):
    """With a trainable mask, the step differentiates only trainable leaves
    (requires_grad semantics). Updates must be identical to full-tree grads
    under the masked optimizer, and frozen params must stay bitwise frozen."""
    import flax.linen as nn
    import optax

    class Two(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True):
            h = nn.Dense(32, name="frozen")(batch["x"])
            return {"y": nn.Dense(16, name="head")(h)}

    def loss_fn(out, batch):
        return jnp.mean((out["y"] - batch["t"]) ** 2), {}

    model = Two()
    rng = np.random.default_rng(0)
    batch = {"x": rng.standard_normal((8, 24)).astype(np.float32),
             "t": rng.standard_normal((8, 16)).astype(np.float32)}
    params = model.init(jax.random.key(0), batch)["params"]
    mask = {"frozen": jax.tree_util.tree_map(lambda _: False, params["frozen"]),
            "head": jax.tree_util.tree_map(lambda _: True, params["head"])}
    # frozen leaves ride set_to_zero, as build_optimizer composes it
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "frozen", mask)
    tx = optax.multi_transform(
        {"train": optax.sgd(1e-2), "frozen": optax.set_to_zero()}, labels)

    mesh = parallel.make_mesh({"dp": -1, "fsdp": 1, "tp": 1})
    outs = []
    for trainable in (None, mask):
        step = parallel.make_train_step(model, loss_fn, tx, donate=False,
                                        trainable=trainable)
        p = jax.device_put(params, parallel.param_sharding(mesh, params))
        o = jax.device_put(tx.init(params),
                           parallel.param_sharding(mesh, tx.init(params)))
        (p_new, _, _, _), m = step(
            (p, o, {}, jax.random.key(1)), parallel.shard_batch(mesh, batch))
        outs.append((jax.tree_util.tree_map(np.asarray, p_new), m))

    (p_full, m_full), (p_part, m_part) = outs
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_part)):
        np.testing.assert_allclose(a, b, atol=1e-7)
    # frozen subtree is bitwise untouched
    for a, b in zip(jax.tree_util.tree_leaves(params["frozen"]),
                    jax.tree_util.tree_leaves(p_part["frozen"])):
        np.testing.assert_array_equal(np.asarray(a), b)
    assert abs(float(m_full["loss"]) - float(m_part["loss"])) < 1e-6
    # the partitioned step's headline norm covers exactly the trainable grads
    assert np.isclose(float(m_part["grad_norm"]),
                      float(m_part["grad_norm_trainable"]), atol=1e-6)


def test_sharded_model_flash_matches_xla(devices, monkeypatch):
    """The flagship integration of the partitioned flash kernel: a tiny
    sequential model's train-step loss/grads under a dp x tp mesh must match
    between the flash path (interpret mode on CPU) and the XLA path."""
    from bifold_tpu.losses import build_loss
    from bifold_tpu.models import build_model

    model = build_model({
        "name": "siglip_sequential", "image_size": 256, "is_bimanual": False,
        "patch_size": 16, "automodel_name": "tiny", "dim": 64, "lora": True,
        "r": 4, "lora_alpha": 8, "lora_dropout": 0.0, "depth": 2, "heads": 4,
        "context_length": 2,
    })
    rng = np.random.default_rng(0)
    b, s, t = 4, 256, 2
    yy, xx = np.mgrid[0:s, 0:s]
    gm = np.exp(-((xx - 90.0) ** 2 + (yy - 120.0) ** 2) / 50.0)
    batch = {
        "rgb": jnp.asarray(rng.standard_normal((b, 3, s, s)), jnp.float32),
        "rgb_context": jnp.asarray(rng.standard_normal((b, t, 3, s, s)), jnp.float32),
        "instruction": jnp.asarray(rng.integers(0, 30000, (b, 64)), jnp.int32),
        "context_attention_mask": jnp.asarray([[1, 1], [1, 0], [0, 0], [1, 1]], jnp.int32),
        "pick_heatmap": jnp.asarray(np.broadcast_to(gm, (b, s, s)), jnp.float32),
        "place_heatmap": jnp.asarray(np.broadcast_to(gm, (b, s, s)), jnp.float32),
    }
    params = model.init(jax.random.key(0), batch, deterministic=True)["params"]
    loss_fn = build_loss({"name": "bce_gaussmap", "is_bimanual": False,
                          "mask_pick_heatmap": False})
    mesh = parallel.make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    p = jax.device_put(params, parallel.param_sharding(mesh, params))
    bsh = parallel.shard_batch(mesh, batch)

    def loss_of(p, batch):
        out = model.apply({"params": p}, batch, deterministic=True)
        return loss_fn(out, batch)[0]

    results = {}
    for backend in ("xla", "flash"):
        monkeypatch.setenv("BIFOLD_ATTN_BACKEND", backend)
        monkeypatch.setenv("BIFOLD_FLASH_INTERPRET", "1")
        loss, grads = jax.jit(jax.value_and_grad(loss_of))(p, bsh)
        results[backend] = (float(loss),
                            jax.tree_util.tree_map(np.asarray, grads))

    (l1, g1), (l2, g2) = results["xla"], results["flash"]
    assert abs(l1 - l2) < 1e-5, (l1, l2)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(a, b_, atol=2e-4)


def test_sharded_serving_matches_unsharded(devices):
    """ServingModel(mesh=...): tp/fsdp-sharded weights + dp-sharded pooled
    batch through the one-dispatch serve program == the unsharded server,
    both plain and int8-quantized (multi-chip serving surface)."""
    from bifold_tpu.data.processor import Processor
    from bifold_tpu.models import build_model
    from bifold_tpu.serving import ServingModel

    mesh = parallel.make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    model = build_model({
        "name": "siglip", "image_size": 64, "is_bimanual": False,
        "patch_size": 16, "automodel_name": "tiny", "dim": 64,
        "lora": False, "depth": 1, "heads": 4}, dtype=jnp.float32)
    proc = Processor(
        {"model_image_size": 64, "text_encoder": None, "sigma": 5,
         "requires_graph": False, "spatial_augment": False,
         "strategy": "gmm", "mask_depth": True, "standardize_depth": False},
        partition="test", autoprocessor_name="tiny")
    s = 64
    init_sample = {
        "rgb": jnp.zeros((1, 3, s, s), jnp.float32),
        "instruction": jnp.zeros((1, 64), jnp.int32),
        "mask": jnp.ones((1, 1, s, s), jnp.float32),
    }
    variables = jax.jit(
        lambda k: model.init(k, init_sample, deterministic=True)
    )(jax.random.key(0))

    rng = np.random.default_rng(7)
    obs = [dict(rgb=rng.integers(0, 255, (96, 96, 3), dtype=np.uint8),
                depth=rng.random((96, 96)).astype(np.float32),
                mask=np.ones((96, 96), np.float32),
                instruction=f"fold towel number {i}") for i in range(4)]

    base = ServingModel(model, variables, proc, threshold=0.01)
    sharded = ServingModel(model, variables, proc, threshold=0.01,
                           mesh=mesh)
    # weights actually landed tp-sharded on the mesh
    qkv = sharded.variables["params"]["pick_place"]["fusion"][
        "transformer_encoder"]["block_0"]["attn"]["to_qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "tp")

    a0, r0 = base.predict_batch(obs, return_raw_output=True)
    a1, r1 = sharded.predict_batch(obs, return_raw_output=True)
    np.testing.assert_allclose(np.asarray(r1["pick_heatmap"]),
                               np.asarray(r0["pick_heatmap"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a1.pick), np.asarray(a0.pick))
    np.testing.assert_array_equal(np.asarray(a1.place), np.asarray(a0.place))

    # int8 + mesh compose: the quantized payload shards like its kernel
    q_sharded = ServingModel(model, variables, proc, threshold=0.01,
                             mesh=mesh, quantize="int8",
                             quantize_min_size=4096)
    q_base = ServingModel(model, variables, proc, threshold=0.01,
                          quantize="int8", quantize_min_size=4096)
    aq, rq = q_sharded.predict_batch(obs, return_raw_output=True)
    aqb, rqb = q_base.predict_batch(obs, return_raw_output=True)
    np.testing.assert_allclose(np.asarray(rq["pick_heatmap"]),
                               np.asarray(rqb["pick_heatmap"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(aq.pick), np.asarray(aqb.pick))

    # batch-1 (indivisible by dp) still serves on the mesh: the constraint
    # is skipped per-input, weights stay sharded
    one = sharded.predict(**obs[0])
    one_ref = base.predict(**obs[0])
    np.testing.assert_array_equal(np.asarray(one.pick),
                                  np.asarray(one_ref.pick))

    # export from a sharded server is an explicit error, not a bad artifact
    with pytest.raises(NotImplementedError, match="mesh-sharded"):
        sharded.export("/tmp/should_not_exist.bifold", **obs[0])


def test_flash_partition_tolerates_subaxis_gspmd_proposals(devices):
    """Shardy can propose *sub-axis* shardings for the flash custom-call's
    operands (seen live: the vision tower's h=12 heads tiled 4-way over a
    size-4 sub-axis of an fsdp=8 mesh axis when the fsdp-sharded qkv
    projection's feature sharding propagates through the (b, n, h, d)
    reshape). jax's eager NamedSharding decode hard-fails on those, so the
    callbacks register decode_shardings=False and parse tolerantly: the
    unrepresentable proposal degrades to the key mask's batch split instead
    of crashing the compile (or silently replicating the kernel)."""
    from types import SimpleNamespace

    from jax._src.lib import xla_client as xc
    from jax._src.sharding_impls import GSPMDSharding
    from jax.sharding import Mesh

    from bifold_tpu.ops.flash_attention import _bh_spec, _pspec

    mesh = Mesh(np.array(devices[:8]).reshape(8), ("fsdp",))
    devs = tuple(mesh.devices.flat)
    subaxis = GSPMDSharding(
        devs, xc.HloSharding.iota_tile(
            (1, 1, 4, 1, 2), subgroup_types=[xc.OpSharding.Type.REPLICATED]))
    q8 = GSPMDSharding(devs, xc.HloSharding.iota_tile((8, 1, 1, 1)))
    mask8 = GSPMDSharding(devs, xc.HloSharding.iota_tile((8, 1)))
    arg = lambda s: SimpleNamespace(sharding=s)  # noqa: E731

    # representable GSPMD tilings parse to their mesh axes
    spec = _pspec(arg(q8), mesh)
    assert spec is not None and spec[0] in ("fsdp", ("fsdp",))
    # the sub-axis proposal is unrepresentable -> None, not a raise
    assert _pspec(arg(subaxis), mesh) is None
    # q/k/v all unrepresentable -> batch split recovered from the key mask
    bs, hs = _bh_spec([arg(subaxis)] * 3 + [arg(mask8)], mesh)
    assert bs in ("fsdp", ("fsdp",)) and hs is None
    # nothing parseable at all -> full replication (the warned-about path)
    bs, hs = _bh_spec([arg(subaxis)] * 4, mesh)
    assert bs is None and hs is None


def test_scan_train_step_matches_dispatched(devices):
    """k steps fused into one lax.scan program (make_scan_train_step) must be
    bit-identical to k separately dispatched steps — same params, same last
    metrics — including the dropout PRNG stream carried in the state."""
    import flax.linen as nn
    import optax

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True, **kw):
            h = nn.Dense(16)(batch["x"])
            h = nn.Dropout(0.1, deterministic=deterministic)(h)
            return {"y": nn.Dense(4)(nn.relu(h))}

    def loss_fn(out, batch):
        loss = jnp.mean((out["y"] - batch["t"]) ** 2)
        return loss, {"mse": loss}

    model = Tiny()
    rng = np.random.default_rng(0)
    mk = lambda: {  # noqa: E731
        "x": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32),
        "t": jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)}
    batch0 = mk()
    params = model.init(jax.random.key(0), batch0)["params"]
    tx = optax.adam(1e-2)
    step = parallel.make_train_step(model, loss_fn, tx, donate=False)

    k = 4
    batches = [mk() for _ in range(k)]
    state = (params, tx.init(params), {}, jax.random.key(7))
    losses = []
    for b in batches:
        state, m = step(state, b)
        losses.append(float(m["loss"]))

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    multi = parallel.make_scan_train_step(step, k, donate=False)
    state_s, m_s = multi((params, tx.init(params), {}, jax.random.key(7)),
                         stacked)

    for a, b in zip(jax.tree_util.tree_leaves(state[0]),
                    jax.tree_util.tree_leaves(state_s[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m_s["loss"]) == losses[-1]          # last step's metrics
    assert float(m_s["mse"]) == losses[-1]
    np.testing.assert_allclose(float(m_s["loss_mean"]), np.mean(losses),
                               rtol=1e-6)

    # same_batch benchmarking path: k reuses of one batch == k dispatches
    multi_sb = parallel.make_scan_train_step(step, k, same_batch=True,
                                             donate=False)
    state_r = (params, tx.init(params), {}, jax.random.key(7))
    for _ in range(k):
        state_r, _ = step(state_r, batch0)
    state_b, _ = multi_sb((params, tx.init(params), {}, jax.random.key(7)),
                          batch0)
    for a, b in zip(jax.tree_util.tree_leaves(state_r[0]),
                    jax.tree_util.tree_leaves(state_b[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError):
        parallel.make_scan_train_step(step, 0)


def test_scan_train_step_sharded(devices):
    """The fused multi-step program composes with a dp-sharded mesh: state
    donation + scan over device-sharded stacked batches runs and matches the
    per-step sharded path."""
    import flax.linen as nn
    import optax

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, deterministic=True, **kw):
            return {"y": nn.Dense(4)(batch["x"])}

    def loss_fn(out, batch):
        loss = jnp.mean((out["y"] - batch["t"]) ** 2)
        return loss, {}

    model = Tiny()
    rng = np.random.default_rng(0)
    mk = lambda: {  # noqa: E731
        "x": rng.standard_normal((8, 8)).astype(np.float32),
        "t": rng.standard_normal((8, 4)).astype(np.float32)}
    batches = [mk() for _ in range(3)]
    params = model.init(jax.random.key(0), batches[0])["params"]
    tx = optax.sgd(1e-2)  # SGD: exact across sharding (CLAUDE.md Adam note)
    step = parallel.make_train_step(model, loss_fn, tx, donate=False)

    mesh = parallel.make_mesh({"dp": -1, "fsdp": 1, "tp": 1})
    sp = parallel.param_sharding(mesh, params)
    expect = (jax.device_put(params, sp),
              jax.device_put(tx.init(params),
                             parallel.param_sharding(mesh, tx.init(params))),
              {}, jax.random.key(1))
    for b in batches:
        expect, _ = step(expect, parallel.shard_batch(mesh, b))

    # stacked batches shard over the data axes on the (per-step) batch axis 1
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *batches)
    data_axes = tuple(parallel._batch_axes(mesh))
    sharded_stack = {kk: jax.device_put(
        v, jax.sharding.NamedSharding(mesh, P(None, data_axes)))
        for kk, v in stacked.items()}
    multi = parallel.make_scan_train_step(step, 3)
    got = (jax.device_put(params, sp),
           jax.device_put(tx.init(params),
                          parallel.param_sharding(mesh, tx.init(params))),
           {}, jax.random.key(1))
    got, metrics = multi(got, sharded_stack)
    for a, b in zip(jax.tree_util.tree_leaves(expect[0]),
                    jax.tree_util.tree_leaves(got[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert np.isfinite(float(metrics["loss"]))
