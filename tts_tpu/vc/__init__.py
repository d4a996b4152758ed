"""Voice conversion models (reference ``TTS/vc/``)."""
