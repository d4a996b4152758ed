"""VC auxiliary modules (WavLM content encoder)."""
