"""Vocoders: mel → waveform (reference ``TTS/vocoder/``).

GAN vocoders (HiFiGAN, MelGAN family, ParallelWaveGAN, UnivNet), diffusion
(WaveGrad) and AR (WaveRNN) models, their discriminators and losses, built
TPU-native: channels-last convs on the MXU, transposed convs expressed as
input-dilated convs matching torch semantics for checkpoint conversion.
"""
