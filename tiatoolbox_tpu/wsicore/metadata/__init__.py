"""Typed metadata schemas for WSI container formats."""

from tiatoolbox_tpu.wsicore.metadata import ngff  # noqa: F401
