"""Corpus readers + deterministic fixture generation (no network)."""
