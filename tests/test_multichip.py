"""Driver-graded multi-chip artifacts: ``__graft_entry__.dryrun_multichip``
plus the mesh/sharding helpers it builds on (``tts_tpu/parallel/mesh.py``).

The reference has no distributed tests at all (SURVEY.md §4); here the full
VITS GAN train step is executed on the 8-device virtual CPU mesh provided by
``tests/conftest.py``.
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tts_tpu.parallel import get_mesh, replicate, shard_batch, with_data_parallel


def test_get_mesh_shapes():
    mesh = get_mesh(data=8, model=1)
    assert mesh.shape == {"data": 8, "model": 1, "seq": 1}
    mesh = get_mesh(data=-1, model=2)
    assert mesh.shape == {"data": 4, "model": 2, "seq": 1}
    with pytest.raises(AssertionError):
        get_mesh(data=3, model=2)


def test_with_data_parallel_pads_and_shards():
    mesh = get_mesh(data=8, model=1)
    batch = {"x": np.arange(12, dtype=np.float32).reshape(6, 2)}
    out = with_data_parallel(mesh, batch)
    # 6 rows padded (edge mode) up to 8, sharded over the data axis.
    assert out["x"].shape == (8, 2)
    assert out["x"].sharding == shard_batch(mesh)
    np.testing.assert_array_equal(np.asarray(out["x"])[6], np.asarray(out["x"])[5])
    np.testing.assert_array_equal(np.asarray(out["x"])[:6], batch["x"])


def test_replicate_sharding():
    mesh = get_mesh(data=8, model=1)
    x = jax.device_put(np.ones((4,), np.float32), replicate(mesh))
    assert x.sharding.is_fully_replicated


@pytest.mark.slow  # the driver runs dryrun_multichip on every round;
# the subprocess cold-compiles the full GAN+TP+ring stack (~10 min on 1 CPU)
def test_dryrun_multichip_8():
    """Exactly what the driver runs: one VITS GAN step over 8 devices."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_2d_mesh():
    """(4, 2) data×model mesh — the TP axis path compiles and executes."""
    import __graft_entry__ as g

    g.dryrun_multichip(8, model_parallel=2)


def test_partial_restore_merge():
    """--restore_path transfer learning: intersecting same-shape leaves are
    copied, everything else keeps its init (reference set_init_dict,
    generic_utils.py:149)."""
    import jax.numpy as jnp

    from tts_tpu.trainer.trainer import Trainer

    target = {"model": {"params": {
        "a": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros((4,))},
        "b": {"kernel": jnp.ones((2, 2))},
    }}}
    source = {"model": {"params": {
        "a": {"kernel": np.full((3, 4), 7.0), "bias": np.zeros((9,))},
    }}}
    merged = Trainer._partial_merge(target, source)
    assert float(merged["model"]["params"]["a"]["kernel"][0, 0]) == 7.0
    assert merged["model"]["params"]["a"]["bias"].shape == (4,)
    assert float(merged["model"]["params"]["b"]["kernel"][0, 0]) == 1.0
