"""Belarusian GlowTTS recipe (reference recipes/bel-alex73/train_glowtts.py):
grapheme/IPA vocabulary defined inline, stats-file normalisation, blank
tokens; dataset produced by the bel-alex73 corpus-preparation pipeline."""

import os

from tts_tpu.config.shared import BaseDatasetConfig, CharactersConfig
from tts_tpu.data import load_tts_samples
from tts_tpu.models import setup_model
from tts_tpu.models.glow_tts import GlowTTSConfig
from tts_tpu.trainer.trainer import Trainer, TrainerArgs

output_path = os.environ.get("BEL_OUTPUT_PATH", os.path.dirname(os.path.abspath(__file__)))
dataset_path = os.environ.get("BEL_DATASET_PATH", os.path.join(output_path, "filtered_dataset"))

dataset_config = BaseDatasetConfig(
    formatter="bel_tts_formatter",
    dataset_name="bel",
    meta_file_train="ipa_final_dataset.csv",
    path=dataset_path,
    language="be",
)

characters = CharactersConfig(
    characters_class="tts_tpu.text.characters.Graphemes",
    pad="_",
    eos="~",
    bos="^",
    blank="@",
    characters="Iabdfgijklmnprstuvxzɔɛɣɨɫɱʂʐʲˈː̯͡β",
    punctuations="!,.?: -‒–—…",
)

config = GlowTTSConfig(
    batch_size=96,
    eval_batch_size=32,
    use_noise_augment=True,
    run_eval=True,
    test_delay_epochs=-1,
    epochs=1000,
    print_step=50,
    print_eval=True,
    output_path=output_path,
    add_blank=True,
    datasets=[dataset_config],
    characters=characters,
    enable_eos_bos_chars=True,
    save_step=10000,
    save_n_checkpoints=2,
    save_best_after=5000,
    text_cleaner="no_cleaners",
    test_sentences=[],
    use_phonemes=True,
    phoneme_language="be",
)
config.audio.mel_fmin = 50
config.audio.mel_fmax = 8000
config.audio.hop_length = 256
config.audio.stats_path = os.path.join(dataset_path, "scale_stats.npy")

if __name__ == "__main__":
    train_samples, eval_samples = load_tts_samples(
        [dataset_config.to_dict()], eval_split=True, eval_split_size=config.eval_split_size
    )
    model = setup_model(config)
    trainer = Trainer(TrainerArgs(), config, output_path, model, train_samples, eval_samples)
    trainer.fit()
