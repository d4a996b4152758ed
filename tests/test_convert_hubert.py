"""Bark HuBERT front-end conversion parity: HF HubertModel (built locally
at tiny dims, random weights) vs the flax port + converter
(reference kmeans_hubert.py wraps HubertModel; tokenizer.py is the LSTM
semantic tokenizer)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def hf_hubert():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    cfg = HubertConfig(
        hidden_size=96, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=192,
        conv_dim=(48, 48, 48), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False, feat_extract_norm="group",
        feat_proj_dropout=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0, layer_norm_eps=1e-5,
        feat_extract_activation="gelu", hidden_act="gelu",
    )
    m = HubertModel(cfg)
    m.eval()
    return m, cfg


def _flax_cfg(cfg):
    from tts_tpu.vc.modules.wavlm import WavLMConfig

    return WavLMConfig(
        extractor_mode="default",
        encoder_layers=cfg.num_hidden_layers,
        encoder_embed_dim=cfg.hidden_size,
        encoder_ffn_embed_dim=cfg.intermediate_size,
        encoder_attention_heads=cfg.num_attention_heads,
        layer_norm_first=False,
        conv_feature_layers=tuple(zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)),
        conv_bias=cfg.conv_bias,
        conv_pos=cfg.num_conv_pos_embeddings,
        conv_pos_groups=cfg.num_conv_pos_embedding_groups,
        relative_position_embedding=False,
        gru_rel_pos=False,
    )


def test_hubert_layer_features_parity(hf_hubert):
    from tts_tpu.models.bark.hubert import convert_hf_hubert
    from tts_tpu.vc.modules.wavlm import WavLM

    m, cfg = hf_hubert
    wav = np.random.RandomState(1).randn(1, 800).astype(np.float32) * 0.1
    layer = 2
    with torch.no_grad():
        out = m(torch.from_numpy(wav), output_hidden_states=True)
    ref = out.hidden_states[layer].numpy()

    params = convert_hf_hubert({k: v.numpy() for k, v in m.state_dict().items()})
    jm = WavLM(_flax_cfg(cfg))
    got = np.asarray(jm.apply(params, jnp.asarray(wav), output_layer=layer))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_hubert_tokenizer_parity():
    from tts_tpu.models.bark.hubert import HubertTokenizer, convert_hubert_tokenizer

    class RefTok(torch.nn.Module):
        """Reference tokenizer.py:16 (version 0)."""

        def __init__(self, hidden_size=32, input_size=24, output_size=50):
            super().__init__()
            self.lstm = torch.nn.LSTM(input_size, hidden_size, 2, batch_first=True)
            self.fc = torch.nn.Linear(hidden_size, output_size)

        def forward(self, x):
            x, _ = self.lstm(x)
            return self.fc(x)

    torch.manual_seed(2)
    tm = RefTok()
    tm.eval()
    x = np.random.RandomState(3).randn(2, 9, 24).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params = convert_hubert_tokenizer({k: v.numpy() for k, v in tm.state_dict().items()})
    jt = HubertTokenizer(hidden_size=32, input_size=24, output_size=50)
    got = np.asarray(jt.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # argmax semantic tokens agree
    ref_tok = ref.argmax(-1)
    got_tok = np.asarray(jt.apply(params, jnp.asarray(x), method=jt.get_token))
    np.testing.assert_array_equal(got_tok, ref_tok)


def test_bark_generate_voice(tmp_path, hf_hubert):
    """Bark.generate_voice: wav → semantic-prompt dict through the flax
    HuBERT + tokenizer (EnCodec gated off)."""
    import jax

    from tts_tpu.models.bark import Bark, BarkConfig
    from tts_tpu.models.bark.hubert import (
        HubertTokenizer, convert_hf_hubert, hubert_base_config,
    )
    from tts_tpu.vc.modules.wavlm import WavLM

    m, cfg = hf_hubert
    hub_params = convert_hf_hubert({k: v.numpy() for k, v in m.state_dict().items()})

    # monkeypatch the base config to the tiny dims for the test
    import tts_tpu.models.bark.hubert as hub_mod

    tiny_cfg = _flax_cfg(cfg)
    orig = hub_mod.hubert_base_config
    hub_mod.hubert_base_config = lambda: tiny_cfg
    try:
        tok = HubertTokenizer(hidden_size=16, input_size=cfg.hidden_size, output_size=40)
        tok_params = tok.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, cfg.hidden_size)))

        bark = Bark(BarkConfig())
        wav = np.random.RandomState(5).randn(640).astype(np.float32) * 0.1
        prompt = bark.generate_voice(
            wav, hub_params, tok_params, output_path=str(tmp_path / "voice.npz"),
        )
        # the test tokenizer has input_size == hidden_size; layer-9 clamps
        assert prompt["semantic_prompt"].ndim == 1
        assert (tmp_path / "voice.npz").is_file()
    finally:
        hub_mod.hubert_base_config = orig
