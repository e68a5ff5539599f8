"""mesh.pp / mesh.ep as user-reachable config axes (VERDICT r3 item 5).

The primitives (parallel.gpipe, ops.moe.expert_parallel_ffn) were already
dryrun-proven; these tests cover the WIRING: parallel.set_active_mesh routes
the Transformer stack through gpipe when ``mesh.pp`` divides depth, and the
MoE FFN through the ep all_to_all path when ``mesh.ep`` divides experts —
reachable from ``python -m bifold_tpu mesh.pp=2`` with numerics equal to the
unsharded step. No reference counterpart (single-GPU, SURVEY.md §2.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bifold_tpu import parallel
from bifold_tpu.config import Config, compose
from bifold_tpu.models.layers import Transformer
from bifold_tpu.trainer import Trainer


def test_transformer_pp_matches_scan(devices):
    """apply() under an active pp mesh == the scan-path apply, fwd and grad."""
    tower = Transformer(dim=32, depth=4, heads=4, mlp_dim=64,
                        fused_qkv=True, scan_layers=True)
    x = jax.random.normal(jax.random.key(0), (8, 12, 32), jnp.float32)
    km = (jax.random.uniform(jax.random.key(1), (8, 12)) > 0.2).astype(
        jnp.float32)
    variables = tower.init(jax.random.key(2), x, km, deterministic=True)

    def loss(v):
        return jnp.sum(jnp.square(tower.apply(v, x, km, deterministic=True)))

    ref = tower.apply(variables, x, km, deterministic=True)
    g_ref = jax.grad(loss)(variables)

    mesh = parallel.make_mesh({"dp": 2, "pp": 2}, devices=devices[:4])
    parallel.set_active_mesh(mesh)
    out = jax.jit(lambda v: tower.apply(v, x, km, deterministic=True))(
        variables)
    g_pp = jax.jit(jax.grad(loss))(variables)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_pp)):
        # grads sum over the batch dim; microbatching changes the reduction
        # order (partial sums then psum) — float-order noise only, so the
        # tolerance scales with the leaf's own magnitude (tiny elements of
        # large-range leaves are relatively noisy but absolutely negligible)
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            b, a, rtol=1e-4, atol=2e-6 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(ka)}")


def test_transformer_pp_falls_back_when_depth_indivisible(devices):
    tower = Transformer(dim=32, depth=3, heads=4, mlp_dim=64,
                        scan_layers=True)
    x = jax.random.normal(jax.random.key(0), (4, 8, 32), jnp.float32)
    variables = tower.init(jax.random.key(1), x, deterministic=True)
    ref = tower.apply(variables, x, deterministic=True)
    parallel.set_active_mesh(
        parallel.make_mesh({"dp": 4, "pp": 2}, devices=devices))
    out = tower.apply(variables, x, deterministic=True)  # depth 3 % 2 != 0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _tiny_cfg(tmp_path, extra=()):
    return compose([
        "train_dataset=synthetic", "test_dataset=null", "model=siglip",
        "train_dataset.n_samples=16", "train_dataset.image_size=64",
        "model.image_size=64", "model.automodel_name=tiny", "model.dim=64",
        "model.depth=2", "model.heads=4", "model.r=2",
        "model.lora_dropout=0",  # dropout-free: pp path is exactly equal
        "optim=sgd",             # Adam's first-step sign(g) amplifies noise
        # f32 compute: bf16 quantizes the (benign) microbatch-shape
        # vectorization noise to ~4e-3, past an exactness gate
        "precision.compute_dtype=float32",
        "epochs=1", "eval_epochs=1", "batch_size=8", "test_batch_size=8",
        "simulator=null", "steps_per_dispatch=1",
        f"run_dir={tmp_path}/run", "log_every=1", *extra,
    ])


def _train_one_epoch(tmp_path, extra=()):
    parallel.set_active_mesh(None)
    cfg = _tiny_cfg(tmp_path, extra)
    trainer = Trainer(Config(cfg), run_dir=f"{tmp_path}/run")
    trainer.prepare_train()
    loss = trainer.train_epoch()
    return loss, jax.device_get(trainer.params)


def _fingerprint(params):
    return float(sum(np.square(np.asarray(l, np.float64)).sum()
                     for l in jax.tree_util.tree_leaves(params)))


def test_cli_train_pp_matches_unsharded(tmp_path):
    """`python -m bifold_tpu mesh.pp=2` == the dp-only run: same loss, same
    updated params (tiny siglip, SGD, dropout-free; CPU mesh)."""
    loss_ref, p_ref = _train_one_epoch(tmp_path / "ref", ["mesh.pp=1"])
    loss_pp, p_pp = _train_one_epoch(
        tmp_path / "pp", ["mesh.pp=2", "mesh.dp=4"])
    assert abs(loss_pp - loss_ref) <= 2e-5 * max(1.0, abs(loss_ref)), (
        loss_pp, loss_ref)
    f_ref, f_pp = _fingerprint(p_ref), _fingerprint(p_pp)
    assert abs(f_pp - f_ref) <= 2e-4 * max(1.0, abs(f_ref)), (f_pp, f_ref)


def test_cli_train_ep_moe_matches_unsharded(tmp_path):
    """`python -m bifold_tpu model.moe_experts=4 mesh.ep=2` == the dense-MoE
    dp-only run (expert_parallel_ffn is exact vs moe_ffn at top-1/top-2)."""
    moe = ["model.moe_experts=4", "model.moe_top_k=1",
           "model.moe_capacity_factor=8"]  # ample capacity: no drop diffs
    loss_ref, p_ref = _train_one_epoch(tmp_path / "ref", moe + ["mesh.ep=1"])
    loss_ep, p_ep = _train_one_epoch(
        tmp_path / "ep", moe + ["mesh.ep=2", "mesh.dp=4"])
    assert abs(loss_ep - loss_ref) <= 2e-5 * max(1.0, abs(loss_ref)), (
        loss_ep, loss_ref)
    f_ref, f_ep = _fingerprint(p_ref), _fingerprint(p_ep)
    assert abs(f_ep - f_ref) <= 2e-4 * max(1.0, abs(f_ref)), (f_ep, f_ref)


def test_pp_microbatches_config_plumbed(tmp_path, devices):
    parallel.set_active_mesh(None)
    cfg = _tiny_cfg(tmp_path, ["mesh.pp=2", "mesh.dp=4",
                               "mesh.pp_microbatches=4"])
    Trainer(Config(cfg), run_dir=f"{tmp_path}/run")
    assert parallel.active_pp_microbatches() == 4
    assert parallel.active_axis_size("pp") == 2


def test_scan_train_step_rejects_misstacked_batch():
    """ADVICE r3: a stacked batch whose leading dim != k must fail loudly."""
    def step(state, batch):
        return state, {"loss": jnp.mean(batch["x"])}

    multi = parallel.make_scan_train_step(step, 4, donate=False)
    with pytest.raises(ValueError, match="expected 4 stacked"):
        multi((jnp.zeros(()),) * 4, {"x": jnp.zeros((3, 2))})
