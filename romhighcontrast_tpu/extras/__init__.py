"""Presentation assets (reference: src/extras/plots4presentation.py)."""
