"""Every recipe under recipes/ must construct its config at import time
(reference keeps ~50 runnable recipes; the train call is guarded by
``__main__`` so importing exercises all config fields without training)."""

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECIPES = sorted(glob.glob(os.path.join(REPO, "recipes", "**", "*.py"), recursive=True))


@pytest.mark.parametrize("path", RECIPES, ids=lambda p: os.path.relpath(p, os.path.join(REPO, "recipes")))
def test_recipe_config_constructs(path):
    import runpy

    mod = runpy.run_path(path, run_name="recipe_import_check")
    assert "config" in mod, f"{path} defines no `config`"
    # round-trips through the coqpit-style serializer
    d = mod["config"].to_dict()
    assert isinstance(d, dict) and d.get("model") is not None or "output_path" in d


def test_stepwise_gradual_lr():
    """Capacitron recipes rely on StepwiseGradualLR (reference
    utils/training.py gradual LR tables)."""
    import jax.numpy as jnp

    from tts_tpu.trainer.optim import build_lr_schedule

    sched = build_lr_schedule(
        "StepwiseGradualLR", 1e-3,
        {"gradual_learning_rates": [[0, 1e-3], [2e4, 5e-4], [4e4, 3e-4]]},
    )
    assert abs(float(sched(jnp.asarray(0))) - 1e-3) < 1e-7
    assert abs(float(sched(jnp.asarray(19999))) - 1e-3) < 1e-7
    assert abs(float(sched(jnp.asarray(20000))) - 5e-4) < 1e-7
    assert abs(float(sched(jnp.asarray(999999))) - 3e-4) < 1e-7
