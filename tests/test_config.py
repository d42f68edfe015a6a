"""Config-system tests: composition, overrides, overlays, instantiation."""

import os

import pytest

from satflow_tpu.core.config import compose, default_config_dir, instantiate
from satflow_tpu.core.utils import derived_input_channels, extras


CONFIG_DIR = default_config_dir()


class TestCompose:
    def test_defaults_compose(self):
        cfg = compose(CONFIG_DIR)
        assert cfg["model"]["_target_"].endswith("EncoderDecoderConvLSTM")
        assert cfg["datamodule"]["fake_data"] is True
        assert cfg["seed"] == 12345
        assert "trainer" in cfg and "callbacks" in cfg and "logger" in cfg

    def test_group_override(self):
        cfg = compose(CONFIG_DIR, overrides=["model=metnet"])
        assert cfg["model"]["_target_"].endswith("LitMetNet")

    def test_value_override_and_add(self):
        cfg = compose(CONFIG_DIR, overrides=["model.lr=0.5", "+model.extra=7"])
        assert cfg["model"]["lr"] == 0.5
        assert cfg["model"]["extra"] == 7

    def test_delete_override(self):
        cfg = compose(CONFIG_DIR, overrides=["~logger"])
        assert "logger" not in cfg

    def test_experiment_overlay_merges_global(self):
        cfg = compose(CONFIG_DIR, overrides=["+experiment=convlstm_simple"])
        assert cfg["model"]["hidden_dim"] == 16
        assert cfg["model"]["forecast_steps"] == 6
        assert cfg["trainer"]["max_epochs"] == 2

    def test_unknown_group_file_raises(self):
        with pytest.raises(FileNotFoundError):
            compose(CONFIG_DIR, overrides=["model=missing_model"])

    def test_malformed_override_raises(self):
        with pytest.raises(ValueError):
            compose(CONFIG_DIR, overrides=["oops"])

    @pytest.mark.parametrize(
        "name",
        sorted(
            f[:-5]
            for f in os.listdir(os.path.join(CONFIG_DIR, "model"))
            if f.endswith(".yaml")
        ),
    )
    def test_every_model_config_instantiates(self, name):
        """Registry-completeness analog of the reference's model sweep: every
        model YAML must build its object (reference tests/test_models.py:64-76)."""
        cfg = compose(CONFIG_DIR, overrides=[f"model={name}"])
        model = instantiate(cfg["model"])
        assert model is not None


class TestExtras:
    def test_forecast_minutes_derived(self):
        cfg = {"model": {"forecast_steps": 6}, "datamodule": {}}
        out = extras(cfg)
        assert out["datamodule"]["forecast_minutes"] == 30

    def test_input_channels_derived(self):
        ds_cfg = {
            "input_data": {
                "sat_channels": ["a"] * 12,
                "nwp_channels": ["b"] * 10,
                "add_topographic_data": True,
            }
        }
        assert derived_input_channels(ds_cfg) == 23

    def test_debug_forces_fast_dev_run(self):
        out = extras({"debug": True, "model": {}, "trainer": {}})
        assert out["trainer"]["fast_dev_run"] is True
        # the single-threaded-data knob lands on the node that READS it
        assert out["datamodule"]["num_workers"] == 0


class TestReviewRegressions:
    """Fixes from the round-3 self-review, pinned."""

    def test_scientific_notation_override_is_float(self):
        # PyYAML (YAML 1.1) leaves '1e-4' a string; run.py's own docstring
        # example `model.lr=1e-4` must produce a float
        cfg = compose(CONFIG_DIR, overrides=["model.lr=1e-4"])
        assert cfg["model"]["lr"] == pytest.approx(1e-4)
        assert isinstance(cfg["model"]["lr"], float)

    def test_scientific_notation_in_yaml_file(self, tmp_path):
        # bare 1e-style floats parse as floats (YAML 1.2 / hydra semantics),
        # while explicitly QUOTED scalars stay the strings the user wrote
        (tmp_path / "config.yaml").write_text(
            'lr: 5e-5\nversion: "1e5"\nname: x\n'
        )
        cfg = compose(str(tmp_path))
        assert cfg["lr"] == pytest.approx(5e-5)
        assert cfg["version"] == "1e5"

    def test_self_first_defaults_keeps_overlay_values(self, tmp_path):
        # hydra's recommended _self_-FIRST pattern: groups after _self_ must
        # override root keys (the root must NOT re-merge after the loop)
        os.makedirs(tmp_path / "experiment")
        (tmp_path / "config.yaml").write_text(
            "defaults:\n  - _self_\n  - experiment: foo\nseed: 0\n"
        )
        (tmp_path / "experiment" / "foo.yaml").write_text(
            "# @package _global_\nseed: 42\n"
        )
        cfg = compose(str(tmp_path))
        assert cfg["seed"] == 42

    def test_bare_string_defaults_merge_at_root(self, tmp_path):
        (tmp_path / "config.yaml").write_text(
            "defaults:\n  - base\n  - _self_\nseed: 1\n"
        )
        (tmp_path / "base.yaml").write_text("alpha: 3\n")
        cfg = compose(str(tmp_path))
        assert cfg["alpha"] == 3 and "" not in cfg
        assert cfg["seed"] == 1
