"""Shared tiny-model factories used by more than one test module.

Cross-test imports like ``from tests.test_xtts import _tiny_config`` broke
whenever /root/reference's regular ``tests`` package shadowed this repo's
namespace ``tests`` dir (round-3 verdict).  Factories live here instead and
are imported top-level (``from helpers import ...``) — pytest puts this
directory on sys.path, same mechanism as ``ref_stubs``.
"""

import json


def _fill_like(shapes, seed=0, scale=0.02):
    """Host-side reproducible fill for an ``eval_shape`` pytree.  Leaf names
    steer the fill so the result behaves like a freshly-initialized net:
    norm scales/variances → 1, biases/means → 0, everything else small
    normals."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rs = np.random.RandomState(seed)

    def fill(path, leaf):
        name = getattr(path[-1], "key", "") if path else ""
        name = name if isinstance(name, str) else ""
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros(leaf.shape, leaf.dtype)
        if name.startswith("log"):  # log-scales: 0 ↔ scale 1
            return jnp.zeros(leaf.shape, leaf.dtype)
        if "scale" in name or "gamma" in name or name == "var":
            return jnp.ones(leaf.shape, leaf.dtype)
        if "bias" in name or "beta" in name or name == "mean":
            return jnp.zeros(leaf.shape, leaf.dtype)
        return jnp.asarray(rs.standard_normal(leaf.shape) * scale, leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def fast_params(init_fn, *args, seed=0, scale=0.02):
    """Pytree with the exact structure/shapes/dtypes of ``init_fn(*args)``
    but filled host-side with small reproducible normals — skips compiling
    and executing the (large) jitted init graph, the single biggest per-test
    cost on the 1-core CI box (~20s each).  Use in tests that assert shapes,
    structure, or finiteness; keep the real ``init_params`` in tests that
    check initializer behavior (and the slow-tier train smokes cover it)."""
    import jax

    shapes = jax.eval_shape(init_fn, *args)  # traces, never compiles/executes
    return _fill_like(shapes, seed=seed, scale=scale)


def fast_init_model(model, *args, attrs=(), seed=0, scale=0.02, **kwargs):
    """:func:`fast_params` for ``init_params`` methods that *store* their
    pytrees as model attributes (XTTS ``gpt_params``/``decoder_params``,
    Tortoise ``ar_params``/``diff_params``, …).  ``eval_shape`` leaves those
    attributes holding dead tracers, so re-set each named attribute with the
    host-filled value (order matches the method's return tuple)."""
    import jax

    shapes = jax.eval_shape(lambda: model.init_params(*args, **kwargs))
    filled = _fill_like(shapes, seed=seed, scale=scale)
    values = filled if isinstance(filled, tuple) else (filled,)
    for name, value in zip(attrs, values):
        setattr(model, name, value)
    return filled


def fast_vits_train_state(model, config, rng, seed=0):
    """`models.vits.train.create_train_state` minus the init-graph compile:
    same TrainState structure, host-filled params (see :func:`fast_params`)."""
    from tts_tpu.models.vits.train import TrainState, make_optimizers

    gen_params, disc_params = fast_params(model.init_params, rng, seed=seed)
    optimizers = make_optimizers(config)
    return TrainState.create({"gen": gen_params, "disc": disc_params}, optimizers)


def tiny_xtts_config():
    """A 2-layer 64-dim XTTS config small enough for CPU unit tests."""
    from tts_tpu.models.xtts import XttsArgs, XttsConfig

    cfg = XttsConfig()
    cfg.model_args = XttsArgs(
        gpt_layers=2,
        gpt_n_model_channels=64,
        gpt_n_heads=4,
        gpt_number_text_tokens=50,
        gpt_num_audio_tokens=34,
        gpt_start_audio_token=32,
        gpt_stop_audio_token=33,
        gpt_start_text_token=48,
        gpt_stop_text_token=0,
        gpt_max_text_tokens=40,
        gpt_max_audio_tokens=64,
        gpt_use_perceiver_resampler=True,
        decoder_input_dim=64,
    )
    return cfg


def make_tiny_bark(seed=0):
    """A 1-layer 32-dim Bark (3 AR stages + fine GPT), params initialised."""
    import jax

    from tts_tpu.models.bark import Bark, BarkConfig
    from tts_tpu.models.bark.config import BarkGPTArgs

    cfg = BarkConfig()
    cfg.SEMANTIC_VOCAB_SIZE = 100
    cfg.CODEBOOK_SIZE = 16
    cfg.TEXT_ENCODING_OFFSET = 104
    cfg.TEXT_PAD_TOKEN = 250
    cfg.SEMANTIC_PAD_TOKEN = 100
    cfg.SEMANTIC_INFER_TOKEN = 255
    cfg.COARSE_INFER_TOKEN = 140
    cfg.COARSE_SEMANTIC_PAD_TOKEN = 102
    cfg.semantic_config = BarkGPTArgs(
        block_size=640, input_vocab_size=256, output_vocab_size=256,
        n_layer=1, n_head=2, n_embd=32,
    )
    cfg.coarse_config = BarkGPTArgs(
        block_size=640, input_vocab_size=256, output_vocab_size=256,
        n_layer=1, n_head=2, n_embd=32,
    )
    cfg.fine_config = BarkGPTArgs(
        block_size=640, input_vocab_size=32, output_vocab_size=32,
        n_layer=1, n_head=2, n_embd=32, n_codes_total=4, n_codes_given=2,
    )
    cfg.N_FINE_CODEBOOKS = 4
    model = Bark(cfg)
    model.init_params(jax.random.PRNGKey(seed))
    return model


GLOW_SMOKE_FIXTURE = "/root/reference/tests/data/ljspeech"


def write_glow_smoke_config(tmp_path):
    """Tiny GlowTTS train-smoke config on the 128-clip LJSpeech fixture
    (reference pattern: tests/tts_tests/test_vits_train.py)."""
    config = {
        "model": "glow_tts",
        "batch_size": 4,
        "eval_batch_size": 4,
        "epochs": 1,
        "print_step": 1,
        "save_step": 2,
        "run_eval": True,
        "eval_split_size": 0.25,
        "num_flow_blocks_dec": 2,
        "num_block_layers": 1,
        "hidden_channels_enc": 32,
        "hidden_channels_dec": 32,
        "hidden_channels_dp": 16,
        "encoder_params": {
            "kernel_size": 3,
            "dropout_p": 0.1,
            "num_layers": 1,
            "num_heads": 2,
            "hidden_channels_ffn": 32,
        },
        "data_dep_init_steps": 0,
        # one padded shape for the whole fixture → the train step compiles once
        "max_audio_len": int(2.5 * 22050),
        "pad_to_multiple_text": 192,
        "pad_to_multiple_mel": 256,
        "text_cleaner": "english_cleaners",
        "use_phonemes": False,
        "output_path": str(tmp_path / "run"),
        "datasets": [
            {
                "formatter": "ljspeech",
                "dataset_name": "ljspeech",
                "path": GLOW_SMOKE_FIXTURE,
                "meta_file_train": "metadata.csv",
                "meta_file_val": "",
                "language": "en",
            }
        ],
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config))
    return str(config_path)


def synth_state_from_manifest(manifest, seed):
    """Deterministically rebuild a reference-layout state dict from a
    ``{name: [shape, dtype]}`` manifest — the big fidelity-corpus families
    (tacotron2, speaker encoder) commit only this manifest + golden outputs
    instead of tens of MB of weights (scripts/gen_fidelity_corpus.py writes
    the manifest; tests/test_fidelity_corpus.py replays it torch-free).

    Weight values are pure numpy: scaled gaussians, with BN running stats
    kept positive so folded-BN inference stays finite.
    """
    import numpy as np

    rs = np.random.RandomState(seed)
    state = {}
    for name, (shape, dtype) in manifest.items():
        shape = tuple(shape)
        if name.endswith("num_batches_tracked"):
            state[name] = np.zeros(shape, np.int64)
        elif name.endswith("running_var"):
            state[name] = (0.5 + np.abs(rs.randn(*shape))).astype(np.float32)
        elif name.endswith("running_mean"):
            state[name] = (0.1 * rs.randn(*shape)).astype(np.float32)
        else:
            state[name] = (0.1 * rs.randn(*shape)).astype(dtype)
    return state
