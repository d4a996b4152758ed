"""Bark weight-compat parity: reference NanoGPT-style GPT / FineGPT
(random-init, reduced dims) vs BarkGPT/BarkFineGPT + converters.
Reference: TTS/tts/layers/bark/{model,model_fine}.py."""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo")

from ref_stubs import import_reference, install_reference_stubs

install_reference_stubs()

from tts_tpu.models.bark.config import BarkGPTArgs
from tts_tpu.models.bark.model import BarkFineGPT, BarkGPT
from tts_tpu.utils.convert import convert_bark_fine, convert_bark_gpt


def _gpt_cfg(RefCfg, bias):
    return RefCfg(
        block_size=300, input_vocab_size=50, output_vocab_size=40,
        n_layer=2, n_head=2, n_embd=32, dropout=0.0, bias=bias,
    )


@pytest.mark.parametrize("bias", [True, False])
def test_bark_gpt_parity(bias):
    mod = import_reference("TTS.tts.layers.bark.model")
    RefGPT, RefCfg = mod.GPT, mod.GPTConfig

    torch.manual_seed(0)
    ref = RefGPT(_gpt_cfg(RefCfg, bias)).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    args = BarkGPTArgs(
        block_size=300, input_vocab_size=50, output_vocab_size=40,
        n_layer=2, n_head=2, n_embd=32, bias=bias,
    )
    model = BarkGPT(args=args)
    params = convert_bark_gpt(state, n_layer=2)

    idx = np.random.RandomState(0).randint(0, 50, (2, 12))
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(idx))  # [B, 1, V] last position only
    logits, _ = model.apply(params, idx)
    diff = np.abs(np.asarray(logits[:, -1:]) - want.numpy()).max()
    assert diff < 5e-4, f"bark GPT parity {diff}"

    # merge_context semantic path (model.py:259)
    idx_mc = np.random.RandomState(1).randint(0, 50, (1, 256 + 256 + 3))
    with torch.no_grad():
        want_mc, _ = ref(torch.from_numpy(idx_mc), merge_context=True)
    logits_mc, _ = model.apply(params, idx_mc, merge_context=True)
    diff = np.abs(np.asarray(logits_mc[:, -1:]) - want_mc.numpy()).max()
    assert diff < 5e-4, f"bark GPT merge_context parity {diff}"


def test_bark_gpt_cached_decode_parity():
    """KV-cached decode vs the reference use_cache path (greedy)."""
    mod = import_reference("TTS.tts.layers.bark.model")
    RefGPT, RefCfg = mod.GPT, mod.GPTConfig

    torch.manual_seed(1)
    ref = RefGPT(_gpt_cfg(RefCfg, False)).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    args = BarkGPTArgs(
        block_size=300, input_vocab_size=50, output_vocab_size=40,
        n_layer=2, n_head=2, n_embd=32, bias=False,
    )
    model = BarkGPT(args=args)
    params = convert_bark_gpt(state, n_layer=2)

    prompt = np.random.RandomState(2).randint(0, 40, (1, 6))
    # torch greedy loop with kv cache
    toks_ref = []
    with torch.no_grad():
        logits, kv = ref(torch.from_numpy(prompt), use_cache=True)
        for i in range(5):
            tok = int(logits[0, -1].argmax())
            toks_ref.append(tok)
            pos = torch.tensor([[prompt.shape[1] + i]])
            logits, kv = ref(torch.tensor([[tok]]), past_kv=kv, position_ids=pos, use_cache=True)

    # ours: prefill + single-token steps through the functional cache
    import jax.numpy as jnp

    from tts_tpu.models.xtts.gpt_core import causal_mask

    from tts_tpu.models.xtts.gpt_core import GPT2Core

    max_len = prompt.shape[1] + 5
    caches = GPT2Core(layers=2, dim=32, heads=2).init_cache(1, max_len)
    pre_mask = np.pad(
        np.asarray(causal_mask(prompt.shape[1])),
        ((0, 0), (0, 0), (0, 0), (0, max_len - prompt.shape[1])),
    )
    logits, caches = model.apply(params, prompt, caches=caches, cache_index=0, attn_mask=pre_mask)
    toks = []
    cur = prompt.shape[1]
    for i in range(5):
        tok = int(np.asarray(logits)[0, -1].argmax())
        toks.append(tok)
        logits, caches = model.apply(
            params, np.asarray([[tok]]), caches=caches,
            cache_index=jnp.asarray(cur), position_offset=cur, cache_len=jnp.asarray(cur + 1),
        )
        cur += 1
    assert toks == toks_ref, f"{toks} != {toks_ref}"


def test_bark_generate_parity():
    """BarkGPT.generate (the scanned AR loop itself) vs the reference cached
    greedy loop — guards the position_offset advance inside the scan step."""
    mod = import_reference("TTS.tts.layers.bark.model")
    RefGPT, RefCfg = mod.GPT, mod.GPTConfig

    torch.manual_seed(3)
    ref = RefGPT(_gpt_cfg(RefCfg, False)).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    args = BarkGPTArgs(
        block_size=300, input_vocab_size=50, output_vocab_size=40,
        n_layer=2, n_head=2, n_embd=32, bias=False,
    )
    model = BarkGPT(args=args)
    params = convert_bark_gpt(state, n_layer=2)

    prompt = np.random.RandomState(4).randint(0, 40, (1, 6))
    n_new = 7
    toks_ref = []
    with torch.no_grad():
        logits, kv = ref(torch.from_numpy(prompt), use_cache=True)
        for i in range(n_new):
            tok = int(logits[0, -1].argmax())
            toks_ref.append(tok)
            pos = torch.tensor([[prompt.shape[1] + i]])
            logits, kv = ref(torch.tensor([[tok]]), past_kv=kv, position_ids=pos, use_cache=True)

    import jax

    out = model.apply(
        params, prompt, jax.random.PRNGKey(0), max_new_tokens=n_new,
        eos_token=999, temperature=1.0, top_k=1, top_p=1.0,
        method=model.generate,
    )
    got = [int(t) for t in np.asarray(out["tokens"][0])]
    assert got == toks_ref, f"{got} != {toks_ref}"


def test_bark_fine_parity():
    mod = import_reference("TTS.tts.layers.bark.model_fine")
    RefFine, RefCfg = mod.FineGPT, mod.FineGPTConfig

    torch.manual_seed(0)
    cfg = RefCfg(
        block_size=300, input_vocab_size=30, output_vocab_size=30,
        n_layer=2, n_head=2, n_embd=32, dropout=0.0, bias=True,
        n_codes_total=4, n_codes_given=1,
    )
    ref = RefFine(cfg).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    args = BarkGPTArgs(
        block_size=300, input_vocab_size=30, output_vocab_size=30,
        n_layer=2, n_head=2, n_embd=32, bias=True, n_codes_total=4, n_codes_given=1,
    )
    model = BarkFineGPT(args=args)
    params = convert_bark_fine(state, n_layer=2, n_codes_total=4, n_codes_given=1)

    idx = np.random.RandomState(0).randint(0, 30, (2, 10, 4))
    for k in (1, 2, 3):
        with torch.no_grad():
            want = ref(k, torch.from_numpy(idx)).numpy()
        got = np.asarray(model.apply(params, k, idx))
        diff = np.abs(got - want).max()
        assert diff < 5e-4, f"fine codebook {k} parity {diff}"


def test_bark_load_checkpoint_dir(tmp_path):
    """Zoo-layout loader: text_2.pt converted+cached on first use."""
    mod = import_reference("TTS.tts.layers.bark.model")
    RefGPT, RefCfg = mod.GPT, mod.GPTConfig

    torch.manual_seed(0)
    ref = RefGPT(_gpt_cfg(RefCfg, False)).eval()
    torch.save({"model": ref.state_dict()}, str(tmp_path / "text_2.pt"))

    from tts_tpu.models.bark import Bark, BarkConfig

    cfg = BarkConfig()
    cfg.semantic_config = BarkGPTArgs(
        block_size=300, input_vocab_size=50, output_vocab_size=40,
        n_layer=2, n_head=2, n_embd=32, bias=False,
    )
    model = Bark(cfg)
    model.load_checkpoint_dir(str(tmp_path))
    assert model.semantic_params is not None
    import os
    assert os.path.isfile(str(tmp_path / "text_2_flax.msgpack"))
