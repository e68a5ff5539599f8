"""Checkpoint store semantics: atomic writes, RNG restore (the bitwise-resume
contract of reference __main__.py:272-325), preference order, zarr_lite
fill-value/missing-chunk behavior."""

import random

import numpy as np

from bifold_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint


def test_save_load_roundtrip_and_rng(tmp_path):
    import jax

    params = {"a": np.arange(6.0).reshape(2, 3), "b": {"c": np.ones(4)}}
    random.seed(123)
    np.random.seed(456)
    _marker_py = random.random()
    _marker_np = np.random.random()
    random.seed(123)
    np.random.seed(456)
    key = jax.random.key(7)
    save_checkpoint(tmp_path / "last.ckpt", params=params, epoch=5, step=99,
                    best_eval=0.5, jax_key=key)

    # scramble host RNGs, then restore
    random.seed(0)
    np.random.seed(0)
    payload = load_checkpoint(tmp_path / "last.ckpt")
    assert payload["epoch"] == 5 and payload["step"] == 99
    np.testing.assert_array_equal(payload["params"]["a"], params["a"])
    assert random.random() == _marker_py       # python RNG restored bitwise
    assert np.random.random() == _marker_np    # numpy RNG restored bitwise
    assert jax.random.key_data(payload["jax_key"]).tolist() == \
        jax.random.key_data(key).tolist()


def test_latest_checkpoint_preference(tmp_path):
    assert latest_checkpoint(tmp_path) is None
    save_checkpoint(tmp_path / "best.ckpt", params={"x": np.zeros(1)})
    assert latest_checkpoint(tmp_path, prefer="last").name == "best.ckpt"
    save_checkpoint(tmp_path / "last.ckpt", params={"x": np.zeros(1)})
    assert latest_checkpoint(tmp_path, prefer="last").name == "last.ckpt"
    assert latest_checkpoint(tmp_path, prefer="best").name == "best.ckpt"


def test_no_tmp_leftover(tmp_path):
    save_checkpoint(tmp_path / "last.ckpt", params={"x": np.zeros(3)})
    assert not list(tmp_path.glob("*.tmp"))


def test_zarr_lite_missing_chunk_fill(tmp_path):
    import json

    from bifold_tpu.data.zarr_lite import Array

    p = tmp_path / "a"
    p.mkdir()
    meta = {"zarr_format": 2, "shape": [4, 4], "chunks": [2, 4], "dtype": "<f4",
            "compressor": None, "fill_value": 7.0, "order": "C", "filters": None}
    (p / ".zarray").write_text(json.dumps(meta))
    (p / "0.0").write_bytes(np.ones((2, 4), np.float32).tobytes())
    # chunk 1.0 is absent -> fill_value
    arr = Array(p)[:]
    np.testing.assert_array_equal(arr[:2], np.ones((2, 4)))
    np.testing.assert_array_equal(arr[2:], np.full((2, 4), 7.0))


def test_async_checkpointer_roundtrip(tmp_path):
    from bifold_tpu.utils.checkpoint import AsyncCheckpointer, load_checkpoint

    ck = AsyncCheckpointer()
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    path = ck.save(tmp_path / "last.ckpt", params=params, epoch=3, step=42)
    ck.wait()
    payload = load_checkpoint(path, restore_rng=False)
    np.testing.assert_array_equal(payload["params"]["w"], params["w"])
    assert payload["epoch"] == 3 and payload["step"] == 42
    assert not list(tmp_path.glob("*.tmp"))


def test_async_checkpointer_snapshot_isolation(tmp_path):
    """The host fetch happens inside save(): mutating the source arrays
    after save() returns must not corrupt the written checkpoint."""
    import jax.numpy as jnp

    from bifold_tpu.utils.checkpoint import AsyncCheckpointer, load_checkpoint

    ck = AsyncCheckpointer()
    w = np.ones(4, np.float32)
    ck.save(tmp_path / "last.ckpt", params={"w": jnp.asarray(w)})
    w[:] = -1.0  # source mutated while the writer thread may still run
    ck.wait()
    payload = load_checkpoint(tmp_path / "last.ckpt", restore_rng=False)
    np.testing.assert_array_equal(payload["params"]["w"], np.ones(4))


def test_async_checkpointer_surfaces_write_errors(tmp_path):
    import pytest

    from bifold_tpu.utils.checkpoint import AsyncCheckpointer

    target = tmp_path / "not_a_dir"
    target.write_text("file, not a directory")
    ck = AsyncCheckpointer()
    ck.save(target / "x.ckpt", params={"w": np.zeros(2)})
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.wait()
    # a later save works once the error has been surfaced (not sticky)
    ck.save(tmp_path / "ok.ckpt", params={"w": np.zeros(2)})
    ck.wait()
