"""XTTS — multilingual zero-shot voice-cloning TTS
(reference ``TTS/tts/models/xtts.py:191``).

Pipeline: reference audio → (GPT conditioning latents via perceiver,
speaker d-vector via SE-ResNet) → KV-cached GPT decode of mel codes →
GPT latents → HiFi decoder → 24 kHz waveform.  Streaming yields
crossfaded chunks every ``stream_chunk_size`` tokens
(reference ``xtts.py:585-692``).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.audio import jax_transforms as jt
from tts_tpu.audio.mel import mel_filterbank
from tts_tpu.audio.numpy_transforms import load_wav, resample_wav

from .config import XttsArgs, XttsConfig
from .gpt import XttsGPT
from .hifi_decoder import HifiDecoder
from .tokenizer import VoiceBpeTokenizer


def wav_to_mel_cloning(
    wav: jnp.ndarray,
    mel_norms: Optional[jnp.ndarray] = None,
    n_fft: int = 2048,
    hop_length: int = 256,
    win_length: int = 1024,
    sample_rate: int = 22050,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    n_mels: int = 80,
) -> jnp.ndarray:
    """Power-2 HTK-mel + log + per-channel norm (reference ``xtts.py:21``).

    wav [B, T] → mel [B, T_frames, n_mels].
    """
    mag = jt.stft_magnitude(wav, n_fft, hop_length, win_length, center=True)
    power = mag**2
    basis = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, n_mels, fmin=f_min, fmax=f_max, htk=True, norm=None)
    )
    mel = jnp.einsum("mk,bkt->bmt", basis, power)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    if mel_norms is not None:
        mel = mel / mel_norms[None, :, None]
    return jnp.swapaxes(mel, 1, 2)


class Xtts:
    """Host wrapper (reference ``Xtts`` model class)."""

    def __init__(self, config: XttsConfig):
        self.config = config
        self.args = config.model_args
        a = self.args
        self.gpt = XttsGPT(
            layers=a.gpt_layers,
            model_dim=a.gpt_n_model_channels,
            heads=a.gpt_n_heads,
            number_text_tokens=a.gpt_number_text_tokens,
            num_audio_tokens=a.gpt_num_audio_tokens,
            start_audio_token=a.gpt_start_audio_token,
            stop_audio_token=a.gpt_stop_audio_token,
            start_text_token=a.gpt_start_text_token or 261,
            stop_text_token=a.gpt_stop_text_token or 0,
            max_text_tokens=a.gpt_max_text_tokens,
            max_mel_tokens=a.gpt_max_audio_tokens,
            code_stride_len=a.gpt_code_stride_len,
            use_perceiver_resampler=a.gpt_use_perceiver_resampler,
            use_remat=getattr(a, "gpt_use_remat", False),
        )
        self.hifigan_decoder = HifiDecoder(
            input_sample_rate=a.input_sample_rate,
            output_sample_rate=a.output_sample_rate,
            output_hop_length=a.output_hop_length,
            ar_mel_length_compression=a.gpt_code_stride_len,
            decoder_input_dim=a.decoder_input_dim,
            d_vector_dim=a.d_vector_dim,
            cond_d_vector_in_each_upsampling_layer=a.cond_d_vector_in_each_upsampling_layer,
        )
        self.tokenizer = VoiceBpeTokenizer()
        self.mel_stats: Optional[jnp.ndarray] = None
        self.gpt_params = None
        self.decoder_params = None
        self.speaker_manager: Dict[str, Dict[str, jnp.ndarray]] = {}

    @classmethod
    def init_from_config(cls, config: XttsConfig, samples=None):
        return cls(config)

    # ------------------------------------------------------------------
    def load_checkpoint(self, config: XttsConfig, checkpoint_dir: str, **kwargs):
        """Load an XTTS model directory (reference ``xtts.py:731``):
        ``vocab.json`` (BPE), ``model.pth``/``model_flax.msgpack`` (weights;
        torch checkpoints are converted once and cached beside the original),
        optional ``speakers_xtts.pth`` (named speaker latents)."""
        import os

        vocab = os.path.join(checkpoint_dir, "vocab.json")
        if os.path.isfile(vocab):
            self.tokenizer = VoiceBpeTokenizer(vocab_file=vocab)
            # reference reads the special-token ids from the vocab
            # (xtts.py:221-224) — rebuild the GPT module if they differ
            start = self.tokenizer.tokenizer.token_to_id("[START]")
            stop = self.tokenizer.tokenizer.token_to_id("[STOP]")
            if start is not None and stop is not None and (
                start != self.gpt.start_text_token or stop != self.gpt.stop_text_token
            ):
                self.args.gpt_start_text_token = start
                self.args.gpt_stop_text_token = stop
                self.gpt = self.gpt.clone(start_text_token=start, stop_text_token=stop)

        flax_path = os.path.join(checkpoint_dir, "model_flax.msgpack")
        torch_path = os.path.join(checkpoint_dir, "model.pth")
        if not os.path.isfile(flax_path) and os.path.isfile(torch_path):
            self._convert_and_cache(torch_path, flax_path)
        if os.path.isfile(flax_path):
            from tts_tpu.utils.io import load_checkpoint as load_msgpack

            params, _, _ = load_msgpack(flax_path)
            self.gpt_params = params["gpt"]
            self.decoder_params = params["decoder"]
            if "mel_stats" in params and params["mel_stats"] is not None:
                ms = np.asarray(params["mel_stats"])
                if ms.size:
                    self.mel_stats = jnp.asarray(ms)
        else:
            raise FileNotFoundError(
                f"No model weights found in {checkpoint_dir} "
                "(need model_flax.msgpack or model.pth)."
            )

        spk_file = os.path.join(checkpoint_dir, "speakers_xtts.pth")
        if os.path.isfile(spk_file):
            self._load_speaker_file(spk_file)

        if getattr(self.args, "gpt_int8_weights", False):
            self.quantize_weights_int8()

    def _convert_and_cache(self, torch_path: str, flax_path: str) -> None:
        from tts_tpu.utils.convert import convert_xtts, load_torch_checkpoint
        from tts_tpu.utils.io import save_checkpoint

        print(f" > Converting XTTS torch checkpoint {torch_path} → {flax_path}")
        state = load_torch_checkpoint(torch_path)
        mel_stats = state.pop("mel_stats", None)
        gpt_params, decoder_params = convert_xtts(
            state, layers=self.args.gpt_layers, heads=self.args.gpt_n_heads
        )
        payload = {
            "gpt": gpt_params,
            "decoder": decoder_params,
            "mel_stats": np.asarray(mel_stats) if mel_stats is not None else np.zeros((0,)),
        }
        save_checkpoint(flax_path, payload, config=self.config, meta={"format": "xtts"})

    def _load_speaker_file(self, path: str) -> None:
        import torch

        table = torch.load(path, map_location="cpu", weights_only=True)
        for name, entry in table.items():
            self.speaker_manager[name] = {
                "gpt_cond_latent": jnp.asarray(np.asarray(entry["gpt_cond_latent"])),
                "speaker_embedding": jnp.asarray(
                    np.asarray(entry["speaker_embedding"]).reshape(1, -1)
                ),
            }

    # ------------------------------------------------------------------
    def init_params(self, rng, t_text: int = 16, t_codes: int = 24, t_cond: int = 64):
        r1, r2 = jax.random.split(rng)
        # jit the inits: flax init executes eagerly op by op — at full XTTS
        # dims that is thousands of individual dispatches (measured 4.5 min
        # through a remote-TPU tunnel vs seconds as one compiled graph)
        self.gpt_params = jax.jit(
            lambda r: self.gpt.init(
                r,
                jnp.zeros((1, t_text), jnp.int32),
                jnp.asarray([t_text]),
                jnp.zeros((1, t_codes), jnp.int32),
                jnp.asarray([t_codes]),
                cond_mels=jnp.zeros((1, t_cond, 80)),
            )
        )(r1)
        self.decoder_params = jax.jit(
            lambda r: self.hifigan_decoder.init(
                r,
                jnp.zeros((1, t_codes, self.args.decoder_input_dim)),
                jnp.zeros((1, 512)),
                jnp.zeros((1, 32, 64)),
                method=self.hifigan_decoder.init_all,
            )
        )(r2)
        return self.gpt_params, self.decoder_params

    # ------------------------------------------------------------------
    def quantize_weights_int8(self, compute_dtype=None) -> None:
        """Serving optimization: store every GPT matmul kernel as int8 with
        per-channel scales (``ops/quant.py``). AR decode is HBM-bound — one
        token re-reads all weights — so int8 weights nearly halve step time
        on TPU. Dequantization happens inside the jitted steps where XLA
        fuses it into the consuming dot. No reference counterpart."""
        from tts_tpu.ops.quant import install_int8

        install_int8(self, ("gpt_params",), compute_dtype)

    def _dq(self, params):
        """Dequantize int8 GPT params (inside jit when called from a traced
        closure); identity when quantization is off."""
        from tts_tpu.ops.quant import maybe_dequantize

        return maybe_dequantize(self, params)

    # ------------------------------------------------------------------
    def get_gpt_cond_latents(
        self, audio: np.ndarray, sr: int, length: int = 30, chunk_length: int = 6
    ) -> jnp.ndarray:
        """(reference ``xtts.py:258``)"""
        if sr != 22050:
            audio = resample_wav(audio, sr, 22050)
        if length > 0:
            audio = audio[: 22050 * length]
        if not self.args.gpt_use_perceiver_resampler:
            # v1.x layout: one coarse mel over the whole clip (n_fft 4096 /
            # hop 1024), every frame a prompt latent (reference
            # xtts.py:299-314 else-branch, no chunking)
            mel = wav_to_mel_cloning(
                jnp.asarray(audio)[None],
                mel_norms=self.mel_stats,
                n_fft=4096,
                hop_length=1024,
                win_length=4096,
            )
            return self.gpt.apply(self._dq(self.gpt_params), mel, method=self.gpt.get_style_emb)
        style_embs = []
        step = 22050 * chunk_length
        for i in range(0, len(audio), step):
            chunk = audio[i : i + step]
            if len(chunk) < 22050 * 0.33:
                continue
            mel = wav_to_mel_cloning(jnp.asarray(chunk)[None], mel_norms=self.mel_stats)
            emb = self.gpt.apply(
                self._dq(self.gpt_params), mel, method=self.gpt.get_style_emb
            )
            style_embs.append(emb)
        if not style_embs:
            raise ValueError("Reference audio too short for conditioning.")
        return jnp.mean(jnp.stack(style_embs), axis=0)  # [1, 32, D]

    def get_speaker_embedding(self, audio: np.ndarray, sr: int) -> jnp.ndarray:
        """(reference ``xtts.py:317``)"""
        audio_16k = resample_wav(audio, sr, 16000)
        mel = jt.wav_to_mel(
            jnp.asarray(audio_16k)[None],
            n_fft=512,
            num_mels=64,
            sample_rate=16000,
            hop_length=160,
            win_length=400,
            fmax=8000.0,
            center=True,
        )
        # speaker encoder applies its own log; undo the log-mel here
        mel_lin = jnp.exp(mel)
        feats = jnp.swapaxes(mel_lin, 1, 2)
        return self.hifigan_decoder.apply(
            self.decoder_params, feats, method=self.hifigan_decoder.embed_speaker
        )

    def get_conditioning_latents(
        self,
        audio_path: Union[str, List[str]],
        max_ref_length: int = 30,
        gpt_cond_len: int = 30,
        gpt_cond_chunk_len: int = 6,
        librosa_trim_db=None,
        sound_norm_refs: bool = False,
        load_sr: int = 22050,
    ):
        """(reference ``xtts.py:326``)"""
        paths = [audio_path] if isinstance(audio_path, str) else audio_path
        speaker_embs, audios = [], []
        for path in paths:
            audio = load_wav(filename=path, sample_rate=load_sr, resample=True)
            audio = audio[: load_sr * max_ref_length]
            if sound_norm_refs:
                audio = (audio / np.abs(audio).max()) * 0.75
            speaker_embs.append(self.get_speaker_embedding(audio, load_sr))
            audios.append(audio)
        full_audio = np.concatenate(audios)
        gpt_cond_latent = self.get_gpt_cond_latents(
            full_audio, load_sr, length=gpt_cond_len, chunk_length=gpt_cond_chunk_len
        )
        speaker_embedding = jnp.mean(jnp.stack(speaker_embs), axis=0)
        return gpt_cond_latent, speaker_embedding

    # ------------------------------------------------------------------
    def inference(
        self,
        text: str,
        language: str,
        gpt_cond_latent: jnp.ndarray,
        speaker_embedding: jnp.ndarray,
        temperature: float = 0.75,
        top_k: int = 50,
        top_p: float = 0.85,
        repetition_penalty: float = 5.0,
        max_new_tokens: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        **kwargs,
    ) -> Dict[str, np.ndarray]:
        """Full (non-streaming) synthesis (reference ``xtts.py:503``)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        token_ids = self.tokenizer.encode(text, language)
        assert len(token_ids) < self.args.gpt_max_text_tokens, (
            "XTTS can only process ~250 characters per call; split the text."
        )
        text_tokens = jnp.asarray(token_ids, jnp.int32)[None]
        max_new = max_new_tokens or self.gpt.max_mel_tokens - 3

        gen = self.gpt.apply(
            self._dq(self.gpt_params),
            gpt_cond_latent,
            text_tokens,
            jnp.asarray([text_tokens.shape[1]]),
            rng,
            max_new_tokens=max_new,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            method=self.gpt.generate,
        )
        codes, code_len = gen["codes"], gen["code_lengths"]
        # latents are collected during the decode scan (no second GPT pass,
        # unlike the reference which re-runs teacher-forced for latents)
        latents = gen["latents"]
        wav = self.hifigan_decoder.apply(
            self.decoder_params, latents, speaker_embedding
        )
        n_valid = int(code_len[0])
        samples_per_code = wav.shape[1] // latents.shape[1]
        wav = np.asarray(wav[0, : n_valid * samples_per_code, 0], np.float32)
        return {"wav": wav, "gpt_codes": np.asarray(codes), "code_lengths": np.asarray(code_len)}

    def _stream_jits(self, chunk_size, n_chunks, temperature, top_k, top_p, repetition_penalty):
        """Jitted (prefill, decode_chunk, vocode) triple shared by the
        single-stream and batched streaming paths, cached per sampling
        config so concurrent serving never re-traces per request (the
        compiled executables are additionally shape-polymorphic across
        batch sizes via jit's own shape cache)."""
        key = (chunk_size, n_chunks, temperature, top_k, top_p, repetition_penalty)
        cache = getattr(self, "_stream_jit_cache", None)
        if cache is None:
            cache = self._stream_jit_cache = {}
        if key not in cache:

            def _prefill(p, c, t, tl):
                p = self._dq(p)
                # conditioning latents arrive in whatever dtype the caller
                # holds (resolve_conditioning returns fp32); cast to the
                # params' compute dtype or the decode_chunk scan carry
                # (last_logits/last_h) disagrees with the step outputs
                dt = next(
                    leaf.dtype
                    for leaf in jax.tree_util.tree_leaves(p)
                    if jnp.issubdtype(leaf.dtype, jnp.floating)
                )
                return self.gpt.apply(
                    p, c.astype(dt), t, tl,
                    max_new_tokens=n_chunks * chunk_size,
                    method=self.gpt.prefill,
                )

            prefill = jax.jit(_prefill)
            chunk_fn = jax.jit(
                lambda p, s, r: self.gpt.apply(
                    self._dq(p), s, r, chunk_size=chunk_size,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    repetition_penalty=repetition_penalty,
                    method=self.gpt.decode_chunk,
                ),
                # donate the decode state: the KV cache (tens of MB at full
                # dims) is updated in place instead of copied every chunk
                donate_argnums=(1,),
            )
            vocode = jax.jit(lambda p, lat, spk: self.hifigan_decoder.apply(p, lat, spk))

            # one fused [B, T_wav + chunk + 1] pull per chunk: audio, the
            # sampled token ids (exact in f32: ids < 2^24) and the done
            # flags ride ONE device→host transfer — separate np.asarray
            # calls are separate synchronous RPCs on the tunneled backend,
            # and the per-stream state["done"] reads were B more
            pack = jax.jit(
                lambda wav, toks, done: jnp.concatenate(
                    [
                        wav[:, :, 0].astype(jnp.float32),
                        toks.astype(jnp.float32),
                        done[:, None].astype(jnp.float32),
                    ],
                    axis=1,
                )
            )
            cache[key] = (prefill, chunk_fn, vocode, pack)
        return cache[key]

    def inference_stream(
        self,
        text: str,
        language: str,
        gpt_cond_latent: jnp.ndarray,
        speaker_embedding: jnp.ndarray,
        stream_chunk_size: int = 20,
        overlap_wav_len: int = 1024,
        max_new_tokens: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        temperature: float = 0.75,
        top_k: int = 50,
        top_p: float = 0.85,
        repetition_penalty: float = 5.0,
        **sampling_kwargs,
    ) -> Iterator[np.ndarray]:
        """TRUE incremental streaming (reference ``xtts.py:611``): prefill
        once, then decode ``stream_chunk_size`` tokens at a time, vocode
        each chunk's latents immediately and yield crossfaded audio.
        Time-to-first-audio = prefill + one chunk + one vocoder call."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        token_ids = self.tokenizer.encode(text, language)
        text_tokens = jnp.asarray(token_ids, jnp.int32)[None]
        max_new = max_new_tokens or self.gpt.max_mel_tokens - 3
        # round up to a whole number of chunks (static shapes per chunk)
        n_chunks = -(-max_new // stream_chunk_size)
        prefill, chunk_fn, vocode, pack = self._stream_jits(
            stream_chunk_size, n_chunks, temperature, top_k, top_p, repetition_penalty
        )

        state = prefill(
            self.gpt_params, gpt_cond_latent, text_tokens,
            jnp.asarray([text_tokens.shape[1]], jnp.int32),
        )
        last_tail: Optional[np.ndarray] = None
        stop = False
        pending = None  # device handle of the previous chunk's packed pull

        def _consume(packed):
            """One host-side chunk: crossfade + yield decision."""
            nonlocal last_tail, stop
            wav = packed[0, : -stream_chunk_size - 1]
            toks_np = packed[0, -stream_chunk_size - 1 : -1]
            done = packed[0, -1] > 0.5
            n_valid = int(np.sum(toks_np != float(self.gpt.stop_audio_token)))
            if n_valid == 0:
                stop = True
                return None
            chunk = wav[: n_valid * samples_per_code].copy()
            if last_tail is not None and len(chunk) >= overlap_wav_len:
                fade = np.linspace(0, 1, overlap_wav_len, dtype=np.float32)
                chunk[:overlap_wav_len] = (
                    chunk[:overlap_wav_len] * fade + last_tail * (1 - fade)
                )
            last_tail = (
                chunk[-overlap_wav_len:].copy() if len(chunk) >= overlap_wav_len else None
            )
            stop = stop or bool(done)
            return chunk

        # double-buffered from chunk 2 on: dispatch chunk k+1 (async) BEFORE
        # pulling chunk k's packed output, so the device computes the next
        # chunk while the host transfer for the previous one is in flight.
        # Chunk 1 is pulled immediately — time-to-first-audio must not wait
        # behind the next chunk's dispatch round-trips.
        samples_per_code = None
        for i in range(n_chunks):
            rng, sub = jax.random.split(rng)
            state, toks, latents = chunk_fn(self.gpt_params, state, sub)
            n_lat = latents.shape[1]
            packed_dev = pack(
                vocode(self.decoder_params, latents, speaker_embedding),
                toks,
                state["done"],
            )
            if i == 0:
                pending = packed_dev  # pulled right away below
            if pending is not None:
                packed = np.asarray(pending, np.float32)
                pending = None
                if samples_per_code is None:
                    samples_per_code = (packed.shape[1] - stream_chunk_size - 1) // n_lat
                chunk = _consume(packed)
                if chunk is not None:
                    yield chunk
                if stop:
                    break
            if i > 0:
                pending = packed_dev
        if pending is not None and not stop:
            packed = np.asarray(pending, np.float32)
            if samples_per_code is None:
                samples_per_code = (packed.shape[1] - stream_chunk_size - 1) // n_lat
            chunk = _consume(packed)
            if chunk is not None:
                yield chunk

    def inference_stream_batched(
        self,
        texts: List[str],
        language: str,
        gpt_cond_latent: jnp.ndarray,  # [1|B, L, D]
        speaker_embedding: jnp.ndarray,  # [1|B, 512]
        stream_chunk_size: int = 20,
        overlap_wav_len: int = 1024,
        max_new_tokens: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        temperature: float = 0.75,
        top_k: int = 50,
        top_p: float = 0.85,
        repetition_penalty: float = 5.0,
    ) -> Iterator[List[Optional[np.ndarray]]]:
        """Serving-capacity streaming: decode B utterances in ONE KV-cached
        scan (shared weight reads — AR decode is HBM-bound, so tokens/s
        scales nearly with B until compute saturates). Yields one list per
        chunk: item i is utterance i's crossfaded audio chunk, or None once
        that stream has finished. No reference counterpart (the reference
        streams batch-1 only, ``xtts.py:611``)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B = len(texts)
        token_rows = [self.tokenizer.encode(t, language) for t in texts]
        T = max(len(r) for r in token_rows)
        text_tokens = jnp.asarray(
            [r + [0] * (T - len(r)) for r in token_rows], jnp.int32
        )
        text_lengths = jnp.asarray([len(r) for r in token_rows], jnp.int32)
        cond = jnp.broadcast_to(
            gpt_cond_latent, (B,) + tuple(gpt_cond_latent.shape[1:])
        )
        spk = jnp.broadcast_to(
            speaker_embedding, (B,) + tuple(speaker_embedding.shape[1:])
        )
        max_new = max_new_tokens or self.gpt.max_mel_tokens - 3
        n_chunks = -(-max_new // stream_chunk_size)
        prefill, chunk_fn, vocode, pack = self._stream_jits(
            stream_chunk_size, n_chunks, temperature, top_k, top_p, repetition_penalty
        )

        state = prefill(self.gpt_params, cond, text_tokens, text_lengths)
        tails: List[Optional[np.ndarray]] = [None] * B
        finished = [False] * B

        def _consume(packed, n_lat):
            """Split one fused pull into per-stream crossfaded chunks."""
            wavs = packed[:, : -stream_chunk_size - 1]
            toks_np = packed[:, -stream_chunk_size - 1 : -1]
            done_np = packed[:, -1] > 0.5
            samples_per_code = wavs.shape[1] // n_lat
            out: List[Optional[np.ndarray]] = []
            for i in range(B):
                if finished[i]:
                    out.append(None)
                    continue
                n_valid = int(np.sum(toks_np[i] != float(self.gpt.stop_audio_token)))
                if n_valid == 0:
                    finished[i] = True
                    out.append(None)
                    continue
                chunk = wavs[i, : n_valid * samples_per_code].copy()
                if tails[i] is not None and len(chunk) >= overlap_wav_len:
                    fade = np.linspace(0, 1, overlap_wav_len, dtype=np.float32)
                    chunk[:overlap_wav_len] = (
                        chunk[:overlap_wav_len] * fade + tails[i] * (1 - fade)
                    )
                tails[i] = (
                    chunk[-overlap_wav_len:].copy()
                    if len(chunk) >= overlap_wav_len
                    else None
                )
                out.append(chunk)
                if done_np[i]:
                    finished[i] = True
            return out

        # double-buffered: ONE fused device→host pull per chunk (audio +
        # token ids + done flags for ALL streams — separate np.asarray
        # calls were separate synchronous RPCs), dispatched one chunk ahead
        # so the transfer overlaps the next chunk's decode (617 → measured
        # higher aggregate tok/s through the StreamBatcher on one v5e)
        pending = None
        n_lat = stream_chunk_size
        for i in range(n_chunks):
            rng, sub = jax.random.split(rng)
            state, toks, latents = chunk_fn(self.gpt_params, state, sub)
            n_lat = latents.shape[1]
            packed_dev = pack(
                vocode(self.decoder_params, latents, spk), toks, state["done"]
            )
            if i == 0:
                pending = packed_dev  # first chunk pulled right away (TTFA)
            if pending is not None:
                out = _consume(np.asarray(pending, np.float32), n_lat)
                pending = None
                if any(c is not None for c in out):
                    yield out
                if all(finished):
                    break
            if i > 0:
                pending = packed_dev
        if pending is not None and not all(finished):
            out = _consume(np.asarray(pending, np.float32), n_lat)
            if any(c is not None for c in out):
                yield out

    def resolve_conditioning(self, config, speaker_id: Optional[str] = None, speaker_wav=None):
        """Conditioning for synthesis: a known ``speaker_id`` resolves through
        the bundled speaker bank, otherwise ``speaker_wav`` is encoded on the
        fly (reference ``xtts.py:382`` inlines this in every synthesize
        variant). Returns ``(gpt_cond_latent [1,L,D], speaker_embedding)``."""
        if speaker_wav is None and speaker_id is not None:
            if speaker_id not in self.speaker_manager:
                raise ValueError(
                    f" [!] Unknown XTTS speaker {speaker_id!r}; known: "
                    f"{sorted(self.speaker_manager)[:16]}…"
                )
            entry = self.speaker_manager[speaker_id]
            return entry["gpt_cond_latent"], entry["speaker_embedding"]
        if speaker_wav is None:
            raise ValueError(
                " [!] XTTS needs a `speaker_wav` reference clip (or a known "
                "`speaker_id` from speakers_xtts.pth) for voice cloning."
            )
        return self.get_conditioning_latents(
            speaker_wav,
            gpt_cond_len=config.gpt_cond_len,
            gpt_cond_chunk_len=config.gpt_cond_chunk_len,
            max_ref_length=config.max_ref_len,
            sound_norm_refs=config.sound_norm_refs,
        )

    def synthesize(
        self,
        text: str,
        config,
        speaker_wav=None,
        language: str = "en",
        speaker_id: Optional[str] = None,
        voice_dirs=None,
        **kwargs,
    ):
        """(reference ``xtts.py:382``)"""
        gpt_cond_latent, speaker_embedding = self.resolve_conditioning(
            config, speaker_id=speaker_id, speaker_wav=speaker_wav
        )
        return self.inference(
            text,
            language,
            gpt_cond_latent,
            speaker_embedding,
            temperature=config.temperature,
            top_k=config.top_k,
            top_p=config.top_p,
            repetition_penalty=config.repetition_penalty,
            **kwargs,
        )

    def synthesize_stream(
        self,
        text: str,
        config,
        speaker_wav=None,
        language: str = "en",
        speaker_id: Optional[str] = None,
        stream_chunk_size: int = 20,
        **kwargs,
    ) -> Iterator[np.ndarray]:
        """Streaming twin of :meth:`synthesize`: resolve conditioning the
        same way, then yield audio chunks from :meth:`inference_stream`
        (serving path; reference exposes streaming only at the model level,
        ``xtts.py:611``)."""
        gpt_cond_latent, speaker_embedding = self.resolve_conditioning(
            config, speaker_id=speaker_id, speaker_wav=speaker_wav
        )
        return self.inference_stream(
            text,
            language,
            gpt_cond_latent,
            speaker_embedding,
            stream_chunk_size=stream_chunk_size,
            temperature=config.temperature,
            top_k=config.top_k,
            top_p=config.top_p,
            repetition_penalty=config.repetition_penalty,
            **kwargs,
        )
