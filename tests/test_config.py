"""Config composition semantics (mini-Hydra parity with the reference CLI)."""

import os

import pytest

from bifold_tpu.config import (
    Config,
    InterpolationError,
    MissingConfigError,
    compose,
    save,
    to_yaml,
)


def test_default_composition():
    cfg = compose([])
    assert cfg.model.name == "siglip_sequential"
    assert cfg.train_dataset.name == "bimanual_sequential"
    assert cfg.test_dataset.name is None
    assert cfg.loss.name == "bce_gaussmap"
    assert cfg.optim.name == "adam"
    assert cfg.scheduler.name is None
    assert cfg.seed == 3407
    assert cfg.batch_size == 2


def test_group_override_and_remapping():
    cfg = compose(["model=siglip", "dataset@train_dataset=single"])
    assert cfg.model.name == "siglip"
    assert cfg.train_dataset.name == "single"
    # interpolation follows the remapped dataset
    assert cfg.model.image_size == 224
    assert cfg.model.is_bimanual is False


def test_interpolation_chains():
    cfg = compose(["dataset@train_dataset=single_sequential"])
    # ${dataset_root}/single_data_sequential/All_${.n_samples}.pkl, relative interp
    assert cfg.train_dataset.dataset_path.endswith("/single_data_sequential/All_100.pkl")
    assert str(cfg.train_dataset.n_samples) in cfg.train_dataset.dataset_path
    # automodel name is built from patch size + image size
    assert cfg.model.automodel_name == "google/siglip-base-patch16-224"


def test_value_overrides_parse_yaml_scalars():
    cfg = compose(["optim.lr=1e-3", "epochs=5", "use_wandb=true", "gradient_clip=0.5"])
    assert cfg.optim.lr == pytest.approx(1e-3)
    assert isinstance(cfg.optim.lr, float)
    assert cfg.epochs == 5
    assert cfg.use_wandb is True
    assert cfg.gradient_clip == 0.5


def test_add_and_delete_overrides():
    cfg = compose(["+extra.flag=7", "~visualize_predictions"])
    assert cfg.extra.flag == 7
    assert "visualize_predictions" not in cfg


def test_env_resolver(tmp_path, monkeypatch):
    monkeypatch.setenv("BIFOLD_DATASET_ROOT", str(tmp_path))
    cfg = compose([])
    assert cfg.dataset_root == str(tmp_path)
    assert cfg.softgym_cache == f"{tmp_path}/softgym_cache"


def test_unknown_group_option_raises():
    with pytest.raises(MissingConfigError):
        compose(["model=nonexistent_model"])


def test_interpolation_missing_raises(tmp_path):
    (tmp_path / "config.yaml").write_text("a: ${does.not.exist}\n")
    with pytest.raises(InterpolationError):
        compose([], config_dir=tmp_path)


def test_snapshot_roundtrip(tmp_path):
    cfg = compose(["model=siglip"])
    save(cfg, tmp_path / "config.yaml")
    text = (tmp_path / "config.yaml").read_text()
    assert "siglip" in text
    assert "${" not in text  # fully resolved snapshot


def test_config_attribute_mutation():
    cfg = Config({"a": {"b": 1}})
    cfg.a.b = 2
    assert cfg["a"]["b"] == 2
    assert cfg.select("a.b") == 2
    assert cfg.select("a.zz", default="d") == "d"


def test_model_dataset_interpolation_consistency():
    cfg = compose(["dataset@train_dataset=bimanual_sequential"])
    assert cfg.model.image_size == cfg.train_dataset.image_size == 384
    assert cfg.model.context_length == cfg.train_dataset.max_context_length == 3
    assert cfg.processor.model_image_size == 384


def test_relative_interp_resolves_at_target_not_referrer():
    """'${a.y}' where a.y = '${.x}' must read a.x regardless of key order —
    resolution of a referenced value is anchored at the TARGET's location
    (this was dict-order dependent: the referrer-anchored lookup failed or
    silently read the wrong sibling)."""
    from bifold_tpu.config import resolve

    out1 = resolve({"b": "${a.y}", "a": {"x": 5, "y": "${.x}"}})
    out2 = resolve({"a": {"x": 5, "y": "${.x}"}, "b": "${a.y}"})
    assert out1["b"] == 5 and out2["b"] == 5


def test_unterminated_interp_and_escape():
    """A literal '${' without a closing brace raises an 'Unterminated'
    error (not 'nesting too deep'), and '\\${' escapes a literal."""
    import pytest as _pytest

    from bifold_tpu.config import InterpolationError, resolve

    with _pytest.raises(InterpolationError, match="Unterminated"):
        resolve({"cmd": "echo ${HOME"})
    assert resolve({"cmd": "a \\${HOME} b"})["cmd"] == "a ${HOME} b"
