"""CLI surface parity: every reference `tts` flag is accepted
(reference ``TTS/bin/synthesize.py:144-320``)."""

import io
import contextlib

from tts_tpu.bin.synthesize import make_parser
from tts_tpu.utils.manage import ModelManager

# every --flag the reference CLI defines (grepped from the reference
# argparse block; --text etc. included for completeness)
REFERENCE_FLAGS = [
    "--list_models", "--model_info_by_idx", "--model_info_by_name", "--text",
    "--model_name", "--vocoder_name", "--config_path", "--model_path",
    "--out_path", "--use_cuda", "--device", "--vocoder_path",
    "--vocoder_config_path", "--encoder_path", "--encoder_config_path",
    "--pipe_out", "--speakers_file_path", "--language_ids_file_path",
    "--speaker_idx", "--language_idx", "--speaker_wav", "--gst_style",
    "--capacitron_style_wav", "--capacitron_style_text", "--list_speaker_idxs",
    "--list_language_idxs", "--save_spectogram", "--reference_wav",
    "--reference_speaker_idx", "--progress_bar", "--source_wav",
    "--target_wav", "--voice_dir",
]


def test_parser_accepts_every_reference_flag():
    parser = make_parser()
    known = set()
    for action in parser._actions:
        known.update(action.option_strings)
    missing = [f for f in REFERENCE_FLAGS if f not in known]
    assert not missing, f"reference CLI flags not accepted: {missing}"


def test_style_flag_aliases_share_dest():
    parser = make_parser()
    a = parser.parse_args(["--gst_style", "x.wav"])
    b = parser.parse_args(["--capacitron_style_wav", "x.wav"])
    c = parser.parse_args(["--style_wav", "x.wav"])
    assert a.style_wav == b.style_wav == c.style_wav == "x.wav"


def _capture(fn, *args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(*args)
    return buf.getvalue()


def test_model_info_by_idx_and_name():
    m = ModelManager()
    first = m.list_tts_models()[0]
    out = _capture(m.model_info_by_idx, "tts_models/1")
    assert f"> model name : {first.split('/')[-1]}" in out
    out = _capture(m.model_info_by_name, first)
    assert "> model type : tts_models" in out
    # graceful errors, no exceptions (reference prints and returns)
    assert "positive integer" in _capture(m.model_info_by_idx, "tts_models/0")
    assert "integer" in _capture(m.model_info_by_idx, "tts_models/x")
    assert "exceeds" in _capture(m.model_info_by_idx, "tts_models/99999")
    assert "does not exist" in _capture(m.model_info_by_idx, "nope_models/1")
    assert "does not exist" in _capture(m.model_info_by_name, "tts_models/xx/yy/zz")
    assert "format" in _capture(m.model_info_by_name, "bad-name")
