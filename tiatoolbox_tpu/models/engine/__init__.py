"""Inference engines: the compute core orchestration layer."""
