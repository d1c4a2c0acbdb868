"""Visualization tools (2-D replay viewer)."""
