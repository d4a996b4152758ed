"""FreeVC weight-compat parity: reference torch submodules (reduced dims)
vs the flax FreeVC + convert_freevc.
Reference: TTS/vc/models/freevc.py (Encoder/SpeakerEncoder) +
TTS/vc/modules/freevc/modules.py (WN/flow/Generator)."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from ref_stubs import import_reference, install_reference_stubs

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tts_tpu.vc.configs import FreeVCConfig  # noqa: E402
from tts_tpu.vc.models.freevc import FreeVCModule  # noqa: E402
from tts_tpu.utils.convert import convert_freevc  # noqa: E402

SSL, INTER, HID, GIN, SPEC = 12, 8, 16, 16, 21


def _ref_model():
    fv = import_reference("TTS.vc.models.freevc")
    mods = import_reference("TTS.vc.modules.freevc.modules")

    torch.manual_seed(0)

    class RefFreeVC(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.enc_p = fv.Encoder(SSL, INTER, HID, 5, 1, 16)
            self.enc_q = fv.Encoder(SPEC, INTER, HID, 5, 1, 16, gin_channels=GIN)
            self.flow = fv.ResidualCouplingBlock(INTER, HID, 5, 1, 4, gin_channels=GIN)
            self.dec = fv.Generator(
                INTER, "1", [3], [[1, 3, 5]], [4, 4], 32, [8, 8], gin_channels=GIN
            )
            self.enc_spk = fv.SpeakerEncoder(
                mel_n_channels=80, model_hidden_size=GIN, model_embedding_size=GIN
            )

    m = RefFreeVC()
    m.eval()
    return m


@pytest.fixture(scope="module")
def pair():
    ref = _ref_model()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_freevc(state)

    cfg = FreeVCConfig()
    a = cfg.model_args
    a.ssl_dim = SSL
    a.inter_channels = INTER
    a.hidden_channels = HID
    a.gin_channels = GIN
    a.spec_channels = SPEC
    a.resblock = "1"
    a.resblock_kernel_sizes = [3]
    a.resblock_dilation_sizes = [[1, 3, 5]]
    a.upsample_rates = [4, 4]
    a.upsample_kernel_sizes = [8, 8]
    a.upsample_initial_channel = 32
    a.use_spk = False
    module = FreeVCModule(args=a)
    return ref, module, params


def test_freevc_speaker_encoder_parity(pair):
    ref, module, params = pair
    rng = np.random.RandomState(0)
    mel = rng.randn(2, 9, 80).astype(np.float32)
    with torch.no_grad():
        want = ref.enc_spk(torch.from_numpy(mel)).numpy()
    got = module.apply(params, jnp.asarray(mel), method=lambda m, x: m.enc_spk(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_freevc_embed_utterance_partials(pair):
    """Partial-window averaging (reference embed_utterance, freevc.py:277)."""
    from tts_tpu.vc.models.freevc import embed_utterance_partials

    ref, module, params = pair
    rng = np.random.RandomState(1)
    mel = rng.randn(1, 300, 80).astype(np.float32)
    with torch.no_grad():
        want = ref.enc_spk.embed_utterance(torch.from_numpy(mel)).numpy()
    got = embed_utterance_partials(
        lambda windows: module.apply(params, windows, method=lambda m, x: m.enc_spk(x)),
        jnp.asarray(mel),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_freevc_vc_path_parity(pair):
    """Deterministic conversion chain: enc_p stats → fixed-noise latent →
    reverse flow → HiFiGAN, stage by stage vs torch."""
    ref, module, params = pair
    rng = np.random.RandomState(2)
    T = 13
    c = rng.randn(1, SSL, T).astype(np.float32)  # torch [B, C, T]
    g = rng.randn(1, GIN).astype(np.float32)
    noise = rng.randn(1, INTER, T).astype(np.float32)
    lens = torch.tensor([T])

    with torch.no_grad():
        mask = torch.ones(1, 1, T)
        _, m_p, logs_p, _ = ref.enc_p(torch.from_numpy(c), lens)
        z_p = m_p + torch.from_numpy(noise) * torch.exp(logs_p) * 0.5
        z = ref.flow(z_p, mask, g=torch.from_numpy(g)[:, :, None], reverse=True)
        want = ref.dec(z * mask, g=torch.from_numpy(g)[:, :, None]).numpy()

    def fn(m, cj, clens, gj, nj):
        m_pj, logs_pj, x_mask = m.enc_p(cj, clens)
        z_pj = m_pj + nj * jnp.exp(logs_pj) * 0.5
        zj = m.flow(z_pj * x_mask, x_mask, g=gj, reverse=True)
        return m_pj, logs_pj, m.dec(zj * x_mask, g=gj)

    m_pj, logs_pj, got = module.apply(
        params, jnp.asarray(np.swapaxes(c, 1, 2)), jnp.asarray([T]),
        jnp.asarray(g), jnp.asarray(np.swapaxes(noise, 1, 2)), method=fn,
    )
    np.testing.assert_allclose(
        np.asarray(m_pj), np.swapaxes(m_p.numpy(), 1, 2), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :, 0], want[:, 0], atol=5e-5, rtol=1e-4
    )


def test_freevc_posterior_parity(pair):
    """enc_q (conditioned posterior) sampling stats parity."""
    ref, module, params = pair
    rng = np.random.RandomState(3)
    T = 13
    spec = rng.randn(1, SPEC, T).astype(np.float32)
    g = rng.randn(1, GIN).astype(np.float32)
    with torch.no_grad():
        _, m_q, logs_q, _ = ref.enc_q(
            torch.from_numpy(spec), torch.tensor([T]), g=torch.from_numpy(g)[:, :, None]
        )

    def fn(m, sj, lens, gj):
        z, m_qj, logs_qj, y_mask = m.enc_q(sj, lens, g=gj)
        return m_qj, logs_qj

    m_qj, logs_qj = module.apply(
        params, jnp.asarray(np.swapaxes(spec, 1, 2)), jnp.asarray([T]),
        jnp.asarray(g), method=fn,
        rngs={"noise": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(m_qj), np.swapaxes(m_q.numpy(), 1, 2), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logs_qj), np.swapaxes(logs_q.numpy(), 1, 2), atol=3e-5, rtol=1e-4
    )
