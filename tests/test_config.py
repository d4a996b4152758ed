import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

from tts_tpu.config import (
    BaseAudioConfig,
    BaseDatasetConfig,
    BaseTrainingConfig,
    Config,
    load_config,
    read_json_with_comments,
)


@dataclass
class _Inner(Config):
    a: int = 1
    b: str = "x"


@dataclass
class _Outer(Config):
    inner: _Inner = field(default_factory=_Inner)
    items: List[_Inner] = field(default_factory=list)
    n: float = 2.0
    name: Optional[str] = None


def test_round_trip():
    c = _Outer(inner=_Inner(a=5), items=[_Inner(b="y"), _Inner(a=7)], n=3.5)
    d = c.to_dict()
    c2 = _Outer.from_dict(d)
    assert c2.inner.a == 5
    assert c2.items[1].a == 7
    assert isinstance(c2.items[0], _Inner)
    assert c2.n == 3.5
    # json round trip
    c3 = _Outer.from_json(c.to_json())
    assert c3.to_dict() == d


def test_dict_access():
    c = _Outer()
    assert "inner" in c
    assert c["n"] == 2.0
    c["n"] = 4.0
    assert c.n == 4.0


def test_dotted_overrides():
    c = _Outer(items=[_Inner(), _Inner()])
    rest = c.parse_args(
        [
            "--coqpit.inner.a", "42",
            "--coqpit.items.1.b=zzz",
            "--coqpit.n", "9.5",
            "--other", "keepme",
        ]
    )
    assert c.inner.a == 42
    assert c.items[1].b == "zzz"
    assert c.n == 9.5
    assert rest == ["--other", "keepme"]


def test_audio_config_defaults():
    a = BaseAudioConfig()
    assert a.fft_size == 1024
    assert a.hop_length == 256
    assert a.max_norm == 4.0
    assert a.symmetric_norm is True


def test_training_config_nested_datasets():
    t = BaseTrainingConfig.from_dict(
        {"model": "glow_tts", "datasets": [{"formatter": "ljspeech", "path": "/x"}], "batch_size": 4}
    )
    assert isinstance(t.datasets[0], BaseDatasetConfig)
    assert t.datasets[0].formatter == "ljspeech"
    assert t.batch_size == 4


def test_json_with_comments(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{\n // comment\n "a": 1, /* block */ "b": 2\n}')
    d = read_json_with_comments(str(p))
    assert d == {"a": 1, "b": 2}


def test_remote_checkpoint_io_roundtrip(tmp_path):
    """fsspec-routed checkpoint save/load via a URL path (memory://) —
    reference parity for TTS/utils/io.py:27-54 load_fsspec (S3/GCS/HTTP)."""
    import numpy as np

    from tts_tpu.utils.io import (
        load_checkpoint,
        load_checkpoint_full,
        save_checkpoint,
    )

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    url = "memory://ckpts/model.msgpack"
    save_checkpoint(url, params, config={"model": "vits"}, meta={"step": 7})
    got, cfg, meta = load_checkpoint(url, cache=False)
    np.testing.assert_array_equal(got["w"], params["w"])
    assert cfg["model"] == "vits" and meta["step"] == 7
    assert load_checkpoint_full(url, cache=False)["meta"]["step"] == 7

    # local paths still use the plain filesystem
    local = tmp_path / "m.msgpack"
    save_checkpoint(str(local), params)
    assert local.is_file()
    got2, _, _ = load_checkpoint(str(local))
    np.testing.assert_array_equal(got2["w"], params["w"])
