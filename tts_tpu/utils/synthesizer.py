"""Synthesizer — loads TTS + vocoder + VC models and renders text to audio
(reference ``TTS/utils/synthesizer.py:25``).

Differences from the reference: checkpoints are flax msgpack (with config
embedded), sentence splitting is a small regex splitter (pysbd-free), and
model inference is jitted with bucketed frame budgets so repeated calls
hit compiled graphs.
"""

from __future__ import annotations

import os
import re
import time
from typing import List, Optional

import numpy as np

from tts_tpu.audio.processor import AudioProcessor
from tts_tpu.config import load_config, register_config
from tts_tpu.models import setup_model
from tts_tpu.utils.io import load_checkpoint
from tts_tpu.utils.synthesis import synthesis, trim_silence

_SENTENCE_RE = re.compile(r"(?<=[.!?;:])\s+(?=[^\s])")


def split_into_sentences(text: str) -> List[str]:
    """Sentence segmentation (replaces pysbd, ``synthesizer.py:216``)."""
    text = text.strip()
    if not text:
        return []
    parts = _SENTENCE_RE.split(text)
    return [p.strip() for p in parts if p.strip()]


class Synthesizer:
    """Load models once, synthesize many times (reference ``synthesizer.py:25``)."""

    def __init__(
        self,
        tts_checkpoint: str = "",
        tts_config_path: str = "",
        tts_speakers_file: str = "",
        tts_languages_file: str = "",
        vocoder_checkpoint: str = "",
        vocoder_config: str = "",
        encoder_checkpoint: str = "",
        encoder_config: str = "",
        vc_checkpoint: str = "",
        vc_config: str = "",
        model_dir: str = "",
        voice_dir: Optional[str] = None,
        use_griffin_lim: bool = True,
    ):
        self.tts_model = None
        self.tts_params = None
        self.tts_config = None
        self.vocoder_params = None
        self.vocoder_model = None
        self.vocoder_config = None
        self.vocoder_ap = None
        self.vc_model = None
        self.vc_params = None
        self.tts_speakers_file = tts_speakers_file
        self.tts_languages_file = tts_languages_file
        self.voice_dir = voice_dir
        self.use_griffin_lim = use_griffin_lim
        self.output_sample_rate = 22050
        if model_dir:
            self._load_tts_from_dir(model_dir)
        elif tts_checkpoint:
            self._load_tts(tts_checkpoint, tts_config_path)
            if encoder_checkpoint and getattr(self.tts_model, "speaker_manager", None):
                self.tts_model.speaker_manager.init_encoder(
                    encoder_checkpoint, encoder_config
                )
        if vocoder_checkpoint:
            self._load_vocoder(vocoder_checkpoint, vocoder_config)
        if vc_checkpoint:
            self._load_vc(vc_checkpoint, vc_config)

    # ------------------------------------------------------------------
    def _load_tts(self, checkpoint_path: str, config_path: str = "") -> None:
        """(reference ``synthesizer.py:168``)"""
        if os.path.isdir(checkpoint_path):
            self._load_tts_from_dir(checkpoint_path)
            return
        params, config_dict, _ = load_checkpoint(checkpoint_path)
        if config_path:
            config = load_config(config_path)
        else:
            model_name = config_dict.get("model", "")
            config = register_config(model_name.lower()).from_dict(config_dict)
        # external speakers/languages files override the checkpoint-embedded
        # ones (reference CLI --speakers_file_path / --language_ids_file_path)
        for tgt in (config, getattr(config, "model_args", None)):
            if tgt is None:
                continue
            if self.tts_speakers_file and hasattr(tgt, "speakers_file"):
                tgt.speakers_file = self.tts_speakers_file
            if self.tts_languages_file and hasattr(tgt, "language_ids_file"):
                tgt.language_ids_file = self.tts_languages_file
        self.tts_config = config
        self.tts_model = setup_model(config)
        # trainer checkpoints hold named param groups; inference wants the
        # generator group
        if isinstance(params, dict) and set(params) <= {"model", "gen", "disc"}:
            params = params.get("model") or params.get("gen")
        self.tts_params = params
        self.ap = AudioProcessor.init_from_config(config.audio, verbose=False)
        self.output_sample_rate = self.ap.sample_rate

    def _load_tts_from_dir(self, model_dir: str) -> None:
        """Multi-file model directory — XTTS and friends
        (reference ``synthesizer.py:156 _load_tts_from_dir``)."""
        config = load_config(os.path.join(model_dir, "config.json"))
        self.tts_config = config
        self.tts_model = setup_model(config)
        self.tts_model.load_checkpoint(config, checkpoint_dir=model_dir)
        self.tts_params = getattr(self.tts_model, "params", None)
        sr = getattr(getattr(config, "model_args", None), "output_sample_rate", None)
        if sr is None:
            audio = config.audio
            sr = (audio.get("output_sample_rate") or audio.get("sample_rate", 24000)) if isinstance(
                audio, dict
            ) else getattr(audio, "output_sample_rate", None) or getattr(audio, "sample_rate", 24000)
        self.output_sample_rate = sr
        self.ap = None

    def _load_vocoder(self, checkpoint_path: str, config_path: str = "") -> None:
        """Generic vocoder loading — any registered generator, with its own
        AudioProcessor for the mel renorm bridge (reference
        ``synthesizer.py:207``)."""
        from tts_tpu.vocoder.utils import make_generator_from_config

        params, config_dict, meta = load_checkpoint(checkpoint_path)
        if config_path:
            config = load_config(config_path)
        else:
            from tts_tpu.config import _process_model_name

            name = _process_model_name(config_dict)
            config = register_config(name.lower()).from_dict(config_dict)
        self.vocoder_config = config
        self.vocoder_ap = AudioProcessor.init_from_config(config.audio, verbose=False)
        self.vocoder_model = make_generator_from_config(config)
        # trainer checkpoints carry gen+disc groups
        if isinstance(params, dict) and set(params) <= {"model", "gen", "disc"}:
            params = params.get("gen") or params.get("model")
        self.vocoder_params = params
        self.output_sample_rate = self.vocoder_ap.sample_rate

    def _load_vc(self, checkpoint_path: str, config_path: str = "") -> None:
        """(reference ``synthesizer.py:140 _load_vc``)"""
        from tts_tpu.vc.models import setup_model as setup_vc_model

        params, config_dict, _ = load_checkpoint(checkpoint_path)
        if config_path:
            config = load_config(config_path)
        else:
            config = register_config(config_dict.get("model", "freevc").lower()).from_dict(
                config_dict
            )
        self.vc_config = config
        self.vc_model = setup_vc_model(config)
        self.vc_params = params
        if hasattr(self.vc_model, "set_params"):
            self.vc_model.set_params(params)

    # ------------------------------------------------------------------
    def _resolve_speaker(self, speaker_name, speaker_wav):
        """speaker name/wav → (speaker_id, d_vector), with the reference's
        error surface (``synthesizer.py:305-363``)."""
        speaker_id = None
        d_vector = None
        sm = getattr(self.tts_model, "speaker_manager", None)
        if sm is not None and getattr(sm, "name_to_id", None):
            if speaker_name and isinstance(speaker_name, str):
                if getattr(self.tts_config, "use_d_vector_file", False) or getattr(
                    getattr(self.tts_config, "model_args", None), "use_d_vector_file", False
                ):
                    d_vector = np.asarray(sm.get_mean_embedding(speaker_name, num_samples=None))
                else:
                    if speaker_name not in sm.name_to_id:
                        raise ValueError(
                            f" [!] Speaker {speaker_name!r} not in the available "
                            f"speakers: {sorted(sm.name_to_id)[:16]}…"
                        )
                    speaker_id = sm.name_to_id[speaker_name]
            elif len(sm.name_to_id) == 1:
                speaker_id = list(sm.name_to_id.values())[0]
            elif speaker_wav is None:
                raise ValueError(
                    " [!] Looks like you are using a multi-speaker model. "
                    "You need to define either a `speaker_idx` or a `speaker_wav`."
                )
        # compute a fresh d-vector from the given clip (reference :368-374)
        if speaker_wav is not None and sm is not None and getattr(sm, "encoder", None) is not None:
            d_vector = np.asarray(sm.compute_embedding_from_clip(speaker_wav))
        return speaker_id, d_vector

    def _resolve_language(self, language_name):
        language_id = None
        lm = getattr(self.tts_model, "language_manager", None)
        if lm is not None and getattr(lm, "name_to_id", None) and self.tts_config.model != "xtts":
            if len(lm.name_to_id) == 1:
                language_id = list(lm.name_to_id.values())[0]
            elif language_name and isinstance(language_name, str):
                if language_name not in lm.name_to_id:
                    raise ValueError(
                        f" [!] Language {language_name!r} is not in the available "
                        f"languages: {sorted(lm.name_to_id)}."
                    )
                language_id = lm.name_to_id[language_name]
            else:
                raise ValueError(
                    " [!] Looks like you are using a multi-lingual model. "
                    "You need to define a `language_name`."
                )
        return language_id

    def _vocode(self, mel_tts_norm: np.ndarray) -> np.ndarray:
        """TTS mel [T, C] (tts-normalized) → waveform via the loaded vocoder.

        Implements the reference's denorm→renorm bridge and sample-rate
        interpolation (``synthesizer.py:412-429``)."""
        import jax
        import jax.numpy as jnp

        from tts_tpu.vocoder.utils import interpolate_vocoder_input

        mel = self.ap.denormalize(mel_tts_norm.T)  # [C, T] in dB domain
        voc_in = self.vocoder_ap.normalize(mel)
        scale_factor = self.vocoder_ap.sample_rate / self.ap.sample_rate
        if scale_factor != 1.0:
            print(" > interpolating tts model output.")
            voc_in = interpolate_vocoder_input([1, scale_factor], voc_in)
        c = jnp.asarray(voc_in.T[None], jnp.float32)  # [1, T, C]

        name = self.vocoder_config.generator_model.lower()
        rngs = {"noise": jax.random.PRNGKey(0)}
        m = self.vocoder_model
        if name == "wavegrad":
            from tts_tpu.vocoder.models.wavegrad import (
                compute_noise_schedule,
                wavegrad_inference,
            )

            sched_cfg = getattr(self.vocoder_config, "test_noise_schedule", None) or {}
            schedule = compute_noise_schedule(
                int(sched_cfg.get("num_steps", 50)),
                float(sched_cfg.get("min_val", 1e-6)),
                float(sched_cfg.get("max_val", 1e-2)),
            )
            wav = wavegrad_inference(m, self.vocoder_params, c, jax.random.PRNGKey(0), schedule)
            return np.asarray(wav, np.float32).reshape(-1)
        if name == "wavernn":
            wav = m.apply(self.vocoder_params, c, jax.random.PRNGKey(0), method=m.generate)
            return np.asarray(wav, np.float32).reshape(-1)
        wav = m.apply(self.vocoder_params, c, method=m.inference, rngs=rngs)
        return np.asarray(wav, np.float32).reshape(-1)

    # ------------------------------------------------------------------
    def tts(
        self,
        text: str = "",
        speaker_name: Optional[str] = None,
        language_name: Optional[str] = None,
        speaker_wav=None,
        style_wav=None,
        style_text=None,
        reference_wav=None,
        reference_speaker_name=None,
        split_sentences: bool = True,
        **kwargs,
    ) -> List[float]:
        """Render text to a waveform list (reference ``synthesizer.py:257``)."""
        start = time.time()
        if not text and not reference_wav:
            raise ValueError(
                "You need to define either `text` (for synthesis) or a "
                "`reference_wav` (for voice conversion) to use the TTS API."
            )
        if reference_wav is not None:
            wavs = self._voice_transfer(reference_wav, speaker_name, reference_speaker_name)
        else:
            sens = split_into_sentences(text) if split_sentences else [text.strip()]
            if not sens:
                raise ValueError("No text to speak.")
            wavs = self._tts_sentences(
                sens, speaker_name, language_name, speaker_wav,
                style_wav=style_wav, style_text=style_text, **kwargs,
            )

        process_time = time.time() - start
        audio_time = len(wavs) / self.output_sample_rate
        print(f" > Processing time: {process_time}")
        print(f" > Real-time factor: {process_time / max(audio_time, 1e-9)}")
        return wavs

    def tts_stream(
        self,
        text: str,
        speaker_name: Optional[str] = None,
        language_name: Optional[str] = None,
        speaker_wav=None,
        split_sentences: bool = True,
        **kwargs,
    ):
        """Incremental synthesis: yield float32 audio chunks as they decode
        (serving path; no reference equivalent above the model layer). Only
        models with a ``synthesize_stream`` method (XTTS) support this —
        others raise so callers can fall back to :meth:`tts`."""
        model = self.tts_model
        if not hasattr(model, "synthesize_stream"):
            raise NotImplementedError(
                f"Model {getattr(self.tts_config, 'model', '?')!r} has no streaming path; "
                "use tts() instead."
            )
        sens = split_into_sentences(text) if split_sentences else [text.strip()]
        if not any(sens):
            raise ValueError("No text to speak.")
        for sen in sens:
            yield from model.synthesize_stream(
                text=sen,
                config=self.tts_config,
                speaker_id=speaker_name,
                speaker_wav=speaker_wav,
                language=language_name,
                **kwargs,
            )

    def _tts_sentences(
        self, sens, speaker_name, language_name, speaker_wav, style_wav=None,
        style_text=None, **kwargs,
    ) -> List[float]:
        wavs: List[float] = []
        use_gl = self.vocoder_model is None and self.use_griffin_lim

        # models with their own synthesize() (XTTS/Tortoise/Bark) take raw
        # names + reference wavs (reference dispatch synthesizer.py:385-395)
        if hasattr(self.tts_model, "synthesize"):
            for sen in sens:
                outputs = self.tts_model.synthesize(
                    text=sen,
                    config=self.tts_config,
                    speaker_id=speaker_name,
                    speaker_wav=speaker_wav,
                    language=language_name,
                    voice_dirs=self.voice_dir,
                    **kwargs,
                )
                wav = np.asarray(outputs["wav"], np.float32)
                wavs += list(wav)
                wavs += [0] * 10000
            return wavs

        speaker_id, d_vector = self._resolve_speaker(speaker_name, speaker_wav)
        language_id = self._resolve_language(language_name)

        # multi-sentence requests on end-to-end waveform models decode as
        # ONE sequence-packed grid instead of a per-sentence loop (the
        # reference loops, synthesizer.py:407; under XLA each per-sentence
        # decode would also pay its own frame-bucket padding)
        if (
            len(sens) > 1
            and style_wav is None
            and style_text is None
            and self.vocoder_model is None
            and not use_gl
            and hasattr(self.tts_model, "inference_packed")
            and getattr(self.tts_model, "supports_packed_decode", False)
        ):
            packed = self._tts_sentences_packed(sens, speaker_id, d_vector, language_id)
            if packed is not None:
                return packed

        for sen in sens:
            out = synthesis(
                self.tts_model,
                sen,
                self.tts_params,
                use_griffin_lim=use_gl,
                ap=self.ap,
                speaker_id=speaker_id,
                d_vector=d_vector,
                language_id=language_id,
                style_wav=style_wav,
                style_text=style_text,
            )
            if out["wav"] is not None:
                wav = np.asarray(out["wav"], np.float32)
            elif self.vocoder_model is not None:
                wav = self._vocode(out["model_outputs"])
            else:
                raise RuntimeError("No vocoder or Griffin-Lim available.")
            if self.ap is not None and getattr(self.tts_config.audio, "do_trim_silence", False):
                wav = trim_silence(np.asarray(wav), self.ap)
            wavs += list(wav)
            wavs += [0] * 10000  # inter-sentence silence (reference :441)
        return wavs

    def _tts_sentences_packed(self, sens, speaker_id, d_vector, language_id):
        """All sentences of one request in ONE sequence-packed decode
        (``utils/packing.py``): tokenize each sentence, predict frame
        counts with the cheap DP pass, pack the latent frames into a few
        dense rows, decode once, slice per-sentence waveforms back out.
        Returns ``None`` when anything prevents the packed path — the
        caller then falls back to the serial per-sentence loop."""
        import jax.numpy as jnp

        from tts_tpu.utils.packing import plan_pack_layout, unpack_outputs
        from tts_tpu.utils.synthesis import (
            _frame_budget,
            get_jitted_durations,
            get_jitted_packed,
        )

        model = self.tts_model
        try:
            rows = [model.tokenizer.text_to_ids(s) for s in sens]
            bucket = int(getattr(self.tts_config, "pad_to_multiple_text", 16) or 16)
            T = max(max(len(r) for r in rows), 1)
            T = ((T + bucket - 1) // bucket) * bucket
            B = len(rows)
            x = np.zeros((B, T), np.int32)
            xl = np.ones((B,), np.int32)
            for i, r in enumerate(rows):
                x[i, : len(r)] = r
                xl[i] = max(1, len(r))

            aux = {}
            if d_vector is not None:
                dv = np.asarray(d_vector, np.float32).reshape(1, -1)
                aux["d_vectors"] = jnp.asarray(np.broadcast_to(dv, (B, dv.shape[1])))
            elif speaker_id is not None:
                aux["speaker_ids"] = jnp.full((B,), int(speaker_id), jnp.int32)
            if language_id is not None:
                aux["language_ids"] = jnp.full((B,), int(language_id), jnp.int32)

            xj, xlj = jnp.asarray(x), jnp.asarray(xl)
            budget = _frame_budget(T)
            dur = get_jitted_durations(model)(self.tts_params, xj, xlj, aux_input=aux or None)
            lens = np.minimum(np.asarray(dur)[:B], budget)
            plan = plan_pack_layout(lens)
            out = get_jitted_packed(model)(
                self.tts_params,
                xj,
                xlj,
                jnp.asarray(plan.seg_sample),
                jnp.asarray(plan.seg_pos),
                aux_input=aux or None,
                noise_frames=int(budget),
                noise_layout="packed",
            )
            grid = np.asarray(out["model_outputs"], np.float32)  # [R, L*hop, 1]
            upsample = grid.shape[1] // plan.row_len
            pieces = unpack_outputs(grid, plan, upsample=upsample)
        except Exception as e:  # pragma: no cover - serial loop still works
            print(f" [!] packed sentence decode unavailable ({e}); decoding serially")
            return None

        wavs: List[float] = []
        for piece in pieces:
            wav = piece[:, 0]
            if self.ap is not None and getattr(self.tts_config.audio, "do_trim_silence", False):
                wav = trim_silence(np.asarray(wav), self.ap)
            wavs += list(wav)
            wavs += [0] * 10000  # inter-sentence silence (reference :441)
        return wavs

    def _voice_transfer(self, reference_wav, speaker_name, reference_speaker_name):
        """Same-model voice transfer — VITS ``voice_conversion``
        (reference ``synthesizer.py:443-490 transfer_voice path``)."""
        import jax.numpy as jnp

        model = self.tts_model
        if not hasattr(model, "voice_conversion"):
            raise NotImplementedError(
                f"Model {self.tts_config.model!r} has no voice_conversion path."
            )
        from tts_tpu.audio.numpy_transforms import load_wav

        wav = load_wav(filename=reference_wav, sample_rate=self.ap.sample_rate, resample=True)
        enc_sr = getattr(getattr(model, "args", None), "encoder_sample_rate", None)
        if enc_sr and enc_sr != self.ap.sample_rate:
            # encoder_sample_rate models: the posterior encoder consumes
            # spectrograms at the (lower) encoder rate
            from tts_tpu.audio.numpy_transforms import resample_wav

            wav = resample_wav(wav, self.ap.sample_rate, enc_sr)
        spec = self.ap.spectrogram(wav)  # [C, T]
        y = jnp.asarray(spec.T[None])
        y_lengths = jnp.asarray([spec.shape[1]])

        sm = getattr(model, "speaker_manager", None)
        def _cond(name):
            if name is None:
                raise ValueError(
                    " [!] Voice transfer needs both `speaker_name` (target) and "
                    "`reference_speaker_name` (source)."
                )
            if getattr(self.tts_config, "use_d_vector_file", False):
                return jnp.asarray(np.asarray(sm.get_mean_embedding(name))[None])
            return jnp.asarray([sm.name_to_id[name]], jnp.int32)

        src, tgt = _cond(reference_speaker_name), _cond(speaker_name)
        out = model.voice_conversion(self.tts_params, y, y_lengths, src, tgt)
        return list(np.asarray(out, np.float32).reshape(-1))

    def voice_conversion(self, source_wav: str, target_wav) -> List[float]:
        """Any-to-any VC through the loaded VC model (FreeVC)
        (reference ``synthesizer.py:250 voice_conversion``)."""
        if self.vc_model is None:
            raise RuntimeError("No voice-conversion model loaded (vc_checkpoint).")
        wav = self.vc_model.voice_conversion_from_files(source_wav, target_wav)
        self.output_sample_rate = self.vc_config.audio.output_sample_rate
        return list(np.asarray(wav, np.float32).reshape(-1))

    def save_wav(self, wav: List[float], path: str, pipe_out=None) -> None:
        from tts_tpu.audio.numpy_transforms import save_wav as _save

        _save(wav=np.asarray(wav), path=path, sample_rate=self.output_sample_rate, pipe_out=pipe_out)
