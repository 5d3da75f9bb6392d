"""Visualization and serving (host plane)."""
