"""End-to-end pipelines composed from the engine's stages."""
