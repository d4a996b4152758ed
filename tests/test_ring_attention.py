"""Ring attention parity on the 8-way virtual CPU mesh
(tts_tpu/parallel/ring_attention.py — the sequence-parallel capability the
reference lacks, SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.parallel import get_mesh, sequence_sharded_attention

B, T, H, Dh = 2, 32, 4, 16


def _full_attention(q, k, v, causal):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / (Dh**0.5)
    if causal:
        mask = jnp.tril(jnp.ones((T, T), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    return tuple(
        jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32)) for _ in range(3)
    )


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(qkv, causal):
    q, k, v = qkv
    mesh = get_mesh(data=1, model=1, seq=8)
    out = sequence_sharded_attention(q, k, v, mesh, axis_name="seq", causal=causal)
    ref = _full_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gpt_core_sequence_parallel(qkv):
    """GPT2Core with seq_axis: full forward under shard_map matches the
    plain causal forward — sequence-parallel XTTS GPT training."""
    from functools import partial

    try:
        from jax import shard_map  # jax >= 0.4.35
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from tts_tpu.models.xtts.gpt_core import GPT2Core, causal_mask

    D = H * Dh
    rng = np.random.RandomState(1)
    h_in = jnp.asarray(rng.randn(B, T, D).astype(np.float32))

    plain = GPT2Core(layers=2, dim=D, heads=H, use_pallas=False)
    params = plain.init(jax.random.PRNGKey(0), h_in, causal_mask(T))
    ref, _ = plain.apply(params, h_in, causal_mask(T))

    ring = GPT2Core(layers=2, dim=D, heads=H, use_pallas=False, seq_axis="seq")
    mesh = get_mesh(data=1, model=1, seq=8)
    import inspect

    sig = inspect.signature(shard_map).parameters
    check_kw = {k: False for k in ("check_rep", "check_vma") if k in sig}
    fn = shard_map(
        lambda p, x: ring.apply(p, x)[0],
        mesh=mesh,
        in_specs=(P(), P(None, "seq", None)),
        out_specs=P(None, "seq", None),
        **check_kw,
    )
    out = fn(params, h_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_ring_single_device(qkv):
    q, k, v = qkv
    mesh = get_mesh(data=1, model=1, seq=1, devices=jax.devices()[:1])
    out = sequence_sharded_attention(q, k, v, mesh, causal=True)
    ref = _full_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow  # two full GPT train-step compiles (~130 s CPU); the
# default suite still covers ring attention via the kernel tests above
def test_gpt_trainer_seq_parallel_train_step():
    """gpt_seq_parallel=True: one XTTS fine-tune step runs with the GPT
    core sharded (data, seq) over a virtual mesh, and its loss matches the
    single-device step (ring attention is exact)."""
    import numpy as np

    from tts_tpu.models.xtts import XttsArgs, XttsConfig
    from tts_tpu.models.xtts.trainer import GPTTrainer

    def _cfg(seq_parallel):
        cfg = XttsConfig()
        cfg.model_args = XttsArgs(
            gpt_layers=1, gpt_n_model_channels=32, gpt_n_heads=2,
            gpt_number_text_tokens=40, gpt_num_audio_tokens=18,
            gpt_start_audio_token=16, gpt_stop_audio_token=17,
            gpt_start_text_token=38, gpt_stop_text_token=0,
            gpt_max_text_tokens=24, gpt_max_audio_tokens=32,
            decoder_input_dim=32, gpt_seq_parallel=seq_parallel,
        )
        cfg.batch_size = 2
        return cfg

    rng = np.random.RandomState(0)
    batch = {
        "text_input": rng.randint(1, 40, (2, 11)).astype(np.int32),
        "text_lengths": np.asarray([11, 8], np.int32),
        "mel_input": rng.randn(2, 16, 80).astype(np.float32),
        "mel_lengths": np.asarray([16, 12], np.int32),
        "cond_mels": rng.randn(2, 16, 80).astype(np.float32),
    }

    mesh = get_mesh(data=2, model=1, seq=4)
    tr = GPTTrainer(_cfg(True))
    step, _, state = tr.make_train_step(tr.config, jax.random.PRNGKey(0), mesh=mesh)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    loss_sp = float(metrics["loss"])
    assert np.isfinite(loss_sp)

    tr0 = GPTTrainer(_cfg(False))
    step0, _, state0 = tr0.make_train_step(tr0.config, jax.random.PRNGKey(0))
    _, metrics0 = jax.jit(step0)(state0, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(loss_sp, float(metrics0["loss"]), rtol=2e-4)

    # missing mesh is a clear error, not silent single-device fallback
    tr_err = GPTTrainer(_cfg(True))
    with pytest.raises(ValueError, match="seq"):
        tr_err.make_train_step(tr_err.config, jax.random.PRNGKey(0))
