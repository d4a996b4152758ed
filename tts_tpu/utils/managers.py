"""Speaker / language / embedding managers
(reference ``TTS/tts/utils/managers.py``, ``speakers.py``, ``languages.py``).

Embeddings files are JSON (``.json``) or numpy archives (``.npz`` — replaces
the reference's torch ``.pth`` d-vector files; the torch converter rewrites
zoo ``speakers.pth`` into ``.npz``).
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

__all__ = ["BaseIDManager", "EmbeddingManager", "SpeakerManager", "LanguageManager"]


def load_file(path: str) -> Dict:
    if path.endswith(".json"):
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=True)
        return data["data"].item()
    raise ValueError(f" [!] Unsupported embedding file format {path}")


def save_file(obj: Any, path: str) -> None:
    if path.endswith(".json"):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(obj, f, default=lambda o: np.asarray(o).tolist())
    elif path.endswith(".npz"):
        np.savez_compressed(path, data=np.asarray(obj, dtype=object))
    else:
        raise ValueError(f" [!] Unsupported embedding file format {path}")


class BaseIDManager:
    """name → id mapping (reference ``managers.py:36``)."""

    def __init__(self, id_file_path: str = ""):
        self.name_to_id: Dict[str, int] = {}
        if id_file_path:
            self.load_ids_from_file(id_file_path)

    def set_ids_from_data(self, items: List, parse_key: str) -> None:
        self.name_to_id = self.parse_ids_from_data(items, parse_key)

    def load_ids_from_file(self, file_path: str) -> None:
        self.name_to_id = load_file(file_path)

    def save_ids_to_file(self, file_path: str) -> None:
        save_file(self.name_to_id, file_path)

    def get_random_id(self) -> Any:
        if self.name_to_id:
            return self.name_to_id[random.choice(list(self.name_to_id))]
        return None

    @staticmethod
    def parse_ids_from_data(items: List, parse_key: str) -> Dict:
        classes = sorted({item[parse_key] for item in items})
        return {name: i for i, name in enumerate(classes)}


class EmbeddingManager(BaseIDManager):
    """d-vector storage + encoder plumbing (reference ``managers.py:109``)."""

    def __init__(
        self,
        embedding_file_path: Union[str, List[str]] = "",
        id_file_path: str = "",
        encoder_model_path: str = "",
        encoder_config_path: str = "",
    ):
        super().__init__(id_file_path)
        self.embeddings: Dict[str, Dict] = {}
        self.embeddings_by_names: Dict[str, List] = {}
        self.clip_ids: List[str] = []
        self.encoder = None
        self.encoder_ap = None
        if embedding_file_path:
            if isinstance(embedding_file_path, list):
                self.load_embeddings_from_list_of_files(embedding_file_path)
            else:
                self.load_embeddings_from_file(embedding_file_path)
        if encoder_model_path and encoder_config_path:
            self.init_encoder(encoder_model_path, encoder_config_path)

    # ------------------------------------------------------------------
    @property
    def num_embeddings(self) -> int:
        return len(self.embeddings)

    @property
    def embedding_dim(self) -> int:
        if self.embeddings:
            return len(list(self.embeddings.values())[0]["embedding"])
        return 0

    @property
    def embedding_names(self) -> List[str]:
        return list(self.embeddings_by_names.keys())

    def save_embeddings_to_file(self, file_path: str) -> None:
        save_file(self.embeddings, file_path)

    def load_embeddings_from_file(self, file_path: str) -> None:
        self._merge_embeddings(load_file(file_path))

    def load_embeddings_from_list_of_files(self, file_paths: List[str]) -> None:
        self.name_to_id = {}
        self.clip_ids = []
        self.embeddings = {}
        self.embeddings_by_names = {}
        for path in file_paths:
            self._merge_embeddings(load_file(path))

    def _merge_embeddings(self, embeddings: Dict) -> None:
        self.embeddings.update(embeddings)
        self.clip_ids = list(set(self.clip_ids + [e["name"] for e in embeddings.values()]))
        names = sorted({x["name"] for x in self.embeddings.values()})
        self.name_to_id = {name: i for i, name in enumerate(names)}
        self.embeddings_by_names = {}
        for x in self.embeddings.values():
            self.embeddings_by_names.setdefault(x["name"], []).append(x["embedding"])

    def get_embedding_by_clip(self, clip_idx: str) -> List:
        return self.embeddings[clip_idx]["embedding"]

    def get_embeddings_by_name(self, idx: str) -> List[List]:
        return self.embeddings_by_names[idx]

    def get_mean_embedding(self, idx: str, num_samples: Optional[int] = None, randomize: bool = False) -> np.ndarray:
        embeddings = np.array(self.get_embeddings_by_name(idx))
        if num_samples is None:
            return embeddings.mean(0)
        assert len(embeddings) >= num_samples, f" [!] {idx} has <{num_samples} embeddings."
        if randomize:
            embeddings = np.random.permutation(embeddings)[:num_samples]
        else:
            embeddings = embeddings[:num_samples]
        return embeddings.mean(0)

    def get_random_embedding(self) -> Any:
        if self.embeddings:
            return self.embeddings[random.choice(list(self.embeddings))]["embedding"]
        return None

    def get_clips(self) -> List:
        return sorted(self.embeddings.keys())

    # ------------------------------------------------------------------
    def init_encoder(self, model_path: str, config_path: str, use_cuda: bool = False) -> None:
        """Load a speaker encoder for d-vector extraction
        (reference ``managers.py:315``)."""
        from tts_tpu.encoder.model import load_speaker_encoder

        self.encoder, self.encoder_ap = load_speaker_encoder(model_path, config_path)

    def compute_embedding_from_clip(self, wav_file: Union[str, List[str]]) -> List:
        """wav file(s) → d-vector via the loaded encoder
        (reference ``managers.py:331``)."""
        assert self.encoder is not None, " [!] init_encoder first."

        def _compute(path: str) -> np.ndarray:
            wav = self.encoder_ap.load_wav(path, sr=self.encoder_ap.sample_rate)
            return self.encoder.compute_embedding_from_wav(wav)

        if isinstance(wav_file, list):
            embeddings = [np.asarray(_compute(f)) for f in wav_file]
            return np.stack(embeddings).mean(0).tolist()
        return np.asarray(_compute(wav_file)).flatten().tolist()


class SpeakerManager(EmbeddingManager):
    """(reference ``speakers.py:14``)"""

    def __init__(
        self,
        data_items: Optional[List] = None,
        d_vectors_file_path: str = "",
        speaker_id_file_path: str = "",
        encoder_model_path: str = "",
        encoder_config_path: str = "",
        use_cuda: bool = False,
    ):
        super().__init__(
            embedding_file_path=d_vectors_file_path,
            id_file_path=speaker_id_file_path,
            encoder_model_path=encoder_model_path,
            encoder_config_path=encoder_config_path,
        )
        if data_items:
            self.set_ids_from_data(data_items, parse_key="speaker_name")

    @property
    def num_speakers(self) -> int:
        return len(self.name_to_id)

    @property
    def speaker_names(self) -> List[str]:
        return list(self.name_to_id.keys())

    @staticmethod
    def init_from_config(config, samples: Optional[List] = None) -> Optional["SpeakerManager"]:
        """(reference ``speakers.py:86``)"""
        speaker_manager = None
        if getattr(config, "use_speaker_embedding", False):
            if samples:
                speaker_manager = SpeakerManager(data_items=samples)
            if getattr(config, "speaker_file", None):
                speaker_manager = SpeakerManager(speaker_id_file_path=config.speaker_file)
            if getattr(config, "speakers_file", None):
                speaker_manager = SpeakerManager(speaker_id_file_path=config.speakers_file)
        if getattr(config, "use_d_vector_file", False):
            speaker_manager = SpeakerManager()
            if getattr(config, "d_vector_file", None):
                speaker_manager = SpeakerManager(d_vectors_file_path=config.d_vector_file)
        return speaker_manager


class LanguageManager(BaseIDManager):
    """(reference ``languages.py:13``)"""

    def __init__(self, language_ids_file_path: str = "", config=None):
        super().__init__(id_file_path=language_ids_file_path)
        if config:
            self.set_language_ids_from_config(config)

    @property
    def num_languages(self) -> int:
        return len(self.name_to_id)

    @property
    def language_names(self) -> List[str]:
        return list(self.name_to_id.keys())

    def set_language_ids_from_config(self, c) -> None:
        languages = set()
        for dataset in c.datasets:
            lang = dataset["language"] if isinstance(dataset, dict) else dataset.language
            if lang:
                languages.add(lang)
            else:
                raise ValueError(f" [!] Dataset {dataset} has no language specified.")
        self.name_to_id = {name: i for i, name in enumerate(sorted(languages))}

    @staticmethod
    def init_from_config(config) -> Optional["LanguageManager"]:
        if getattr(config, "language_ids_file", None):
            return LanguageManager(language_ids_file_path=config.language_ids_file)
        if getattr(config, "use_language_embedding", False) and getattr(config, "datasets", None):
            return LanguageManager(config=config)
        return None
