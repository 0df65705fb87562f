"""Every shipped config must load and instantiate its model + losses."""

from pathlib import Path

import pytest

from sonicsim_tpu.utils import instantiate, load_config

CONFIGS = sorted(Path("configs").rglob("*.yaml"))


def test_configs_exist():
    assert len(CONFIGS) >= 22  # 11 separation + 12 enhancement (one shared)


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_config_instantiates(path):
    cfg = load_config(path)
    model = instantiate(cfg["model"])
    assert hasattr(model, "apply")
    loss = instantiate(cfg["loss"])
    assert callable(loss)
    if "metrics" in cfg:
        assert callable(instantiate(cfg["metrics"]))
    assert cfg["datas"]["_target_"].startswith("sonicsim_tpu.")
