"""Multimodal binary-column pipeline (see columns.py)."""
