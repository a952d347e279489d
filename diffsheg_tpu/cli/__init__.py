"""CLI: train / generate / eval / build-cache entry points."""
