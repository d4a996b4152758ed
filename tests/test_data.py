"""Data layer tests on the miniature LJSpeech fixture
(reference model: tests/data_tests/test_loader.py)."""

import numpy as np
import pytest

from tts_tpu.config import BaseAudioConfig, BaseTTSConfig
from tts_tpu.data import load_tts_samples, split_dataset
from tts_tpu.data.dataset import TTSDataset
from tts_tpu.data.samplers import (
    BucketBatchSampler,
    PerfectBatchSampler,
    get_language_balancer_weights,
    get_speaker_balancer_weights,
)
from tts_tpu.audio.processor import AudioProcessor
from tts_tpu.text import TTSTokenizer


def _dataset_cfg(path):
    return {
        "formatter": "ljspeech",
        "dataset_name": "ljspeech",
        "path": path,
        "meta_file_train": "metadata.csv",
        "meta_file_val": "",
        "ignored_speakers": None,
        "language": "en",
    }


def test_load_tts_samples(ljspeech_fixture_path):
    train, eval_ = load_tts_samples(
        _dataset_cfg(ljspeech_fixture_path), eval_split=True, eval_split_size=0.25
    )
    assert len(train) > 0 and len(eval_) > 0
    item = train[0]
    assert set(["text", "audio_file", "speaker_name", "language", "audio_unique_name"]).issubset(
        item.keys()
    )
    assert item["audio_unique_name"].startswith("ljspeech#")


def test_split_dataset_multispeaker():
    items = [
        {"speaker_name": f"spk{i % 4}", "audio_file": f"{i}.wav", "text": "x"} for i in range(40)
    ]
    eval_, train = split_dataset(items, eval_split_size=0.25)
    assert len(eval_) == 10
    assert len(train) == 30


@pytest.fixture(scope="module")
def ljspeech_dataset(ljspeech_fixture_path):
    train, _ = load_tts_samples(_dataset_cfg(ljspeech_fixture_path), eval_split=False)
    cfg = BaseTTSConfig(text_cleaner="english_cleaners", use_phonemes=False)
    tokenizer, _ = TTSTokenizer.init_from_config(cfg)
    ap = AudioProcessor.init_from_config(BaseAudioConfig(), verbose=False)
    ds = TTSDataset(
        samples=train[:8],
        ap=ap,
        tokenizer=tokenizer,
        compute_linear_spec=True,
        return_wav=True,
    )
    ds.preprocess_samples()
    return ds


def test_dataset_item(ljspeech_dataset):
    item = ljspeech_dataset[0]
    assert item["mel"].ndim == 2 and item["mel"].shape[1] == 80
    assert item["linear"].shape[1] == 513
    assert item["token_ids"].dtype == np.int32


def test_dataset_batches_static_shapes(ljspeech_dataset):
    shapes = set()
    n = 0
    for batch in ljspeech_dataset.batches(batch_size=4, shuffle=False):
        B, T_en = batch["text_input"].shape
        _, T_de, M = batch["mel_input"].shape
        assert T_en % 16 == 0 and T_de % 32 == 0  # bucket boundaries
        assert M == 80
        assert batch["waveform"].shape == (B, T_de * 256, 1)
        assert batch["spec"].shape == (B, T_de, 513)
        # valid region is non-trivial
        assert (batch["mel_lengths"] <= T_de).all()
        assert (batch["text_lengths"] <= T_en).all()
        # stop targets end with 1
        assert batch["stop_targets"][0, -1] == 1.0
        shapes.add((T_en, T_de))
        n += 1
    assert n == 2  # 8 samples / batch_size 4
    assert len(shapes) <= 2  # bucketing keeps shape count low


def test_balancer_weights():
    items = [{"language": "en", "speaker_name": "a"}] * 3 + [
        {"language": "fr", "speaker_name": "b"}
    ] * 1
    w_lang = get_language_balancer_weights(items)
    assert w_lang[-1] > w_lang[0]  # rare language upweighted
    w_spk = get_speaker_balancer_weights(items)
    assert w_spk[-1] > w_spk[0]


def test_perfect_batch_sampler():
    items = [{"class_name": f"c{i % 4}"} for i in range(64)]
    sampler = PerfectBatchSampler(items, [f"c{i}" for i in range(4)], batch_size=8, num_classes_in_batch=4)
    batch = next(iter(sampler))
    classes = [items[i]["class_name"] for i in batch]
    assert len(batch) == 8
    assert all(classes.count(c) == 2 for c in set(classes))


def test_bucket_batch_sampler():
    lengths = list(range(100))
    sampler = BucketBatchSampler(lengths, batch_size=8, num_buckets=5, shuffle=False)
    batches = list(sampler)
    # within a batch, lengths are close (same bucket)
    for b in batches:
        assert max(lengths[i] for i in b) - min(lengths[i] for i in b) <= 20


def test_process_pool_prefetch(ljspeech_dataset):
    """worker_mode="process": batches built in forked workers match the
    single-process path exactly (GIL-free loader, reference DataLoader
    worker-process parity)."""
    ds = ljspeech_dataset
    want = list(ds.batches(2, shuffle=False, num_workers=0))
    got = list(ds.batches(2, shuffle=False, num_workers=2, worker_mode="process"))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a["text_input"], b["text_input"])
        np.testing.assert_allclose(a["mel_input"], b["mel_input"], atol=1e-6)


# slow tier: spawns worker interpreters (~8s on the 1-core box); the
# process-prefetch contract itself is covered fast by the test above
@pytest.mark.slow
def test_benchmark_loader_tool(capsys):
    """The loader-overlap measurement tool emits one JSON line covering all
    three worker modes (serial / thread pool / forked processes)."""
    import json
    import sys

    from tts_tpu.bin import benchmark_loader

    old = sys.argv
    sys.argv = ["benchmark_loader", "--num_samples", "8", "--batch_size", "4",
                "--step_ms", "5", "--workers", "2"]
    try:
        benchmark_loader.main()
    finally:
        sys.argv = old
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for mode in ("serial", "thread", "process"):
        assert out[mode]["batches_s"] > 0
        assert 0 < out[mode]["overlap_efficiency"] <= 1
