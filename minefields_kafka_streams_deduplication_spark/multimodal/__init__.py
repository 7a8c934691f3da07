"""Multimodal (binary) column plumbing (BASELINE.json:6)."""

from . import binary_ops  # noqa: F401
