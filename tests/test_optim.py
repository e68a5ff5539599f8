"""Optimizer/scheduler semantics vs the reference's LinearWarmup
(bifold/optim/__init__.py:28-92) and frozen-param masking."""

import jax
import jax.numpy as jnp
import numpy as np

from bifold_tpu.optim import build_optimizer, build_schedule


def test_constant_schedule_when_none():
    sched = build_schedule(None, base_lr=1e-3, max_iters=100)
    assert float(sched(0)) == 1e-3
    assert float(sched(99)) == 1e-3
    sched2 = build_schedule({"name": None}, base_lr=1e-3, max_iters=100)
    assert float(sched2(50)) == 1e-3


def test_linear_warmup_cosine():
    cfg = {"name": "linear_warmup", "warmup_portion": 0.1,
           "warmup_start_lr": 0, "use_cosine_decay": True}
    max_iters, base = 1000, 1e-4
    sched = build_schedule(cfg, base_lr=base, max_iters=max_iters)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(50)) - base * 0.5) < 1e-9  # mid-warmup
    assert abs(float(sched(100)) - base) < 1e-9       # warmup done
    assert float(sched(550)) < base                    # decaying
    assert float(sched(max_iters)) < 1e-6              # ~0 at the end


def test_warmup_no_decay_holds_base():
    cfg = {"name": "linear_warmup", "warmup_portion": 0.1,
           "warmup_start_lr": 0, "use_cosine_decay": False}
    sched = build_schedule(cfg, base_lr=1e-4, max_iters=100)
    assert abs(float(sched(10)) - 1e-4) < 1e-9
    assert abs(float(sched(99)) - 1e-4) < 1e-9


def test_frozen_mask_zero_updates_and_state():
    params = {"backbone": {"w": jnp.ones((4, 4))}, "head": {"w": jnp.ones((4, 4))}}
    trainable = {"backbone": {"w": False}, "head": {"w": True}}
    tx, _ = build_optimizer({"name": "adam", "lr": 1e-2, "betas": [0.9, 0.999],
                             "eps": 1e-8, "weight_decay": 0},
                            None, max_iters=10, trainable=trainable)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["backbone"]["w"]) == 0)
    assert np.all(np.asarray(updates["head"]["w"]) != 0)


def test_gradient_clip():
    params = {"w": jnp.ones(3)}
    tx, _ = build_optimizer({"name": "adam", "lr": 1.0, "betas": [0.9, 0.999],
                             "eps": 1e-8, "weight_decay": 0},
                            None, max_iters=10, gradient_clip=0.1)
    state = tx.init(params)
    big = {"w": jnp.full(3, 1e3)}
    updates, _ = tx.update(big, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_adamw_weight_decay_differs():
    params = {"w": jnp.full(3, 10.0)}
    mk = lambda name, wd: build_optimizer(
        {"name": name, "lr": 1e-2, "betas": [0.9, 0.999], "eps": 1e-8,
         "weight_decay": wd}, None, max_iters=10)[0]
    g = {"w": jnp.zeros(3)}
    for name, wd, expect_move in [("adam", 0, False), ("adamw", 0.01, True)]:
        tx = mk(name, wd)
        st = tx.init(params)
        up, _ = tx.update(g, st, params)
        moved = bool(np.any(np.abs(np.asarray(up["w"])) > 1e-8))
        assert moved == expect_move, (name, wd)


def test_accumulate_steps_matches_full_batch_sgd():
    """k micro-batches with accumulate_steps=k produce the SAME update as one
    step on the concatenated batch (mean-loss semantics), and the schedule
    advances per UPDATE, not per micro-step."""
    import optax

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)

    def grad_of(w, x, y):
        return jax.grad(lambda w_: jnp.mean((x @ w_ - y) ** 2))(w)

    # betas=0 makes adam memoryless (update depends only on this step's
    # grad), so both sides see exactly one grad each and must agree
    cfg = {"name": "adam", "lr": 0.1, "betas": [0.0, 0.0], "eps": 1e-8,
           "weight_decay": 0}
    # accumulated: 4 micro-batches of 2
    tx_acc, _ = build_optimizer({**cfg, "accumulate_steps": 4}, None,
                                max_iters=8)
    params = {"w": w0}
    st = tx_acc.init(params)
    for i in range(4):
        g = {"w": grad_of(params["w"], xs[2 * i:2 * i + 2], ys[2 * i:2 * i + 2])}
        up, st = tx_acc.update(g, st, params)
        params = optax.apply_updates(params, up)
        if i < 3:  # no update until the k-th micro-step
            assert np.allclose(np.asarray(params["w"]), np.asarray(w0))

    # one full-batch step
    tx_full, _ = build_optimizer(cfg, None, max_iters=2)
    pf = {"w": w0}
    stf = tx_full.init(pf)
    up, _ = tx_full.update({"w": grad_of(w0, xs, ys)}, stf, pf)
    pf = optax.apply_updates(pf, up)

    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(pf["w"]),
                               rtol=2e-6, atol=2e-7)


def test_accumulate_steps_schedule_counts_updates():
    """Warmup spans the same training run whether or not grads accumulate:
    max_iters (micro-steps) is rescaled to updates for the schedule."""
    sched_cfg = {"name": "linear_warmup", "warmup_portion": 0.5,
                 "warmup_start_lr": 0, "use_cosine_decay": False}
    _, sched = build_optimizer(
        {"name": "adam", "lr": 1e-2, "betas": [0.9, 0.999], "eps": 1e-8,
         "weight_decay": 0, "accumulate_steps": 10},
        sched_cfg, max_iters=1000)
    # 1000 micro-steps / 10 = 100 updates; warmup ends at update 50
    assert float(sched(25)) < 1e-2 * 0.6
    assert abs(float(sched(50)) - 1e-2) < 1e-9


def test_accumulate_with_trainable_mask():
    """Accumulators live only on the trainable branch; frozen leaves stay
    zero through and after the update boundary."""
    import optax

    params = {"frozen": jnp.ones((2, 2)), "head": jnp.ones((2, 2))}
    trainable = {"frozen": False, "head": True}
    tx, _ = build_optimizer(
        {"name": "adam", "lr": 0.1, "betas": [0.0, 0.0], "eps": 1e-8,
         "weight_decay": 0, "accumulate_steps": 2},
        None, max_iters=4, trainable=trainable)
    st = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    p = params
    for _ in range(2):
        up, st = tx.update(g, st, p)
        p = optax.apply_updates(p, up)
    assert np.all(np.asarray(p["frozen"]) == 1.0)
    assert np.all(np.asarray(p["head"]) != 1.0)


def test_skip_nonfinite_guards_updates():
    """optim.skip_nonfinite=n: NaN/inf grads skip the update (params and
    inner state untouched); finite grads apply; after n consecutive bad
    steps the non-finite update propagates (divergence must surface)."""
    import jax.numpy as jnp

    from bifold_tpu.optim import build_optimizer

    tx, _ = build_optimizer(
        {"name": "adam", "lr": 1e-1, "betas": [0.9, 0.999], "eps": 1e-8,
         "weight_decay": 0, "skip_nonfinite": 2}, None, max_iters=10)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)

    bad = {"w": jnp.full(3, jnp.nan)}
    good = {"w": jnp.ones(3)}

    up, state = tx.update(bad, state, params)
    assert np.all(np.asarray(up["w"]) == 0)          # skipped
    up, state = tx.update(good, state, params)
    assert np.all(np.isfinite(np.asarray(up["w"])))  # applied
    assert float(np.abs(np.asarray(up["w"])).max()) > 0
    # two consecutive bad steps exhaust the budget -> the third propagates
    up, state = tx.update(bad, state, params)
    up, state = tx.update(bad, state, params)
    up, state = tx.update(bad, state, params)
    assert not np.all(np.isfinite(np.asarray(up["w"])))


def test_adam_weight_decay_is_coupled_like_torch():
    """The reference's 'adam' is torch.optim.Adam: weight_decay is COUPLED
    L2 (wd*p added to the grad BEFORE the moment updates), not AdamW's
    decoupled decay. Golden comparison against torch over several steps."""
    import torch

    w0 = np.asarray([1.5, -2.0, 0.5], np.float32)
    grads = [np.asarray(g, np.float32) for g in
             ([0.3, -0.1, 0.2], [-0.2, 0.4, 0.0], [0.1, 0.1, -0.3])]
    lr, wd = 1e-2, 0.1

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    tx, _ = build_optimizer(
        {"name": "adam", "lr": lr, "betas": [0.9, 0.999], "eps": 1e-8,
         "weight_decay": wd}, None, max_iters=len(grads))
    params = {"w": jnp.asarray(w0)}
    st = tx.init(params)
    for g in grads:
        up, st = tx.update({"w": jnp.asarray(g)}, st, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, up)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), atol=1e-6)
