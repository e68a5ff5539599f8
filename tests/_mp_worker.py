"""Subprocess worker for test_multiprocess: one of two JAX processes.

Usage: python _mp_worker.py <process_id> <coordinator_port>

Brings up the multi-process runtime (2 processes x 2 local CPU devices),
builds the (dcn=2, dp=2) mesh — dcn aligned with process boundaries — feeds
ONLY this process's slice of the global batch through
``parallel.shard_batch`` (jax.make_array_from_process_local_data), runs one
SGD train step, and prints loss/grad_norm as JSON for the parent to compare
against unsharded numerics.
"""

import json
import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root -> bifold_tpu
import _mp_common  # noqa: E402

from bifold_tpu import parallel  # noqa: E402

assert parallel.distributed_init(coordinator_address=f"localhost:{port}",
                                 num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.local_device_count() == 2

import jax.numpy as jnp  # noqa: E402

mesh = parallel.make_mesh({"dcn": 2, "dp": -1})
assert dict(mesh.shape) == {"dcn": 2, "dp": 2, "fsdp": 1, "tp": 1}

model, loss_fn, tx, trainable_mask = _mp_common.build()
gb = _mp_common.global_batch_np()
local_bs = _mp_common.GLOBAL_BATCH // 2
local = {k: v[pid * local_bs:(pid + 1) * local_bs] for k, v in gb.items()}

# init from the local slice (shapes identical on both processes)
params = _mp_common.init_params(model, {k: jnp.asarray(v)
                                        for k, v in local.items()})
shardings = parallel.param_sharding(mesh, params)
params = jax.device_put(params, shardings)
opt_state = jax.device_put(tx.init(params),
                           parallel.param_sharding(mesh, tx.init(params)))
batch = parallel.shard_batch(mesh, local)  # multi-process assembly path
for v in batch.values():
    assert not v.is_fully_addressable  # truly global arrays

mask = trainable_mask(jax.tree_util.tree_map(lambda x: x, params), lora=True)
step = parallel.make_train_step(model, loss_fn, tx, donate=True,
                                trainable=mask)
(params, opt_state, _, _), metrics = step(
    (params, opt_state, {}, jax.random.key(1)), batch)

# one trainable leaf's global norm as a params fingerprint (replicated over
# dp, so fully gatherable on every process)
flat = jax.tree_util.tree_flatten_with_path(params)[0]
lora_leaves = [l for p, l in flat if "lora" in str(p).lower()]
fp = float(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in lora_leaves))

# multi-host checkpoint: collective gather on every process, file written
# by process 0 only (fsdp-sharded leaves are NOT fully addressable here)
ckpt_dir = os.environ.get("BIFOLD_MP_CKPT")
ckpt_saved = None
if ckpt_dir:
    from bifold_tpu.utils.checkpoint import save_checkpoint

    out = save_checkpoint(os.path.join(ckpt_dir, "mp.ckpt"), params=params,
                          opt_state=opt_state, epoch=1,
                          jax_key=jax.random.key(1))
    ckpt_saved = str(out)

print(json.dumps({"pid": pid, "loss": float(metrics["loss"]),
                  "grad_norm": float(metrics["grad_norm"]),
                  "lora_sq_norm": fp, "ckpt": ckpt_saved}), flush=True)
