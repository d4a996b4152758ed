"""Speaker/emotion encoders (reference ``TTS/encoder/``): d-vector models
(LSTM, SE-ResNet) + contrastive losses (GE2E, AngleProto)."""
