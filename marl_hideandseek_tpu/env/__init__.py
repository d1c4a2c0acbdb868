"""Batched hide-and-seek environment (pure JAX)."""
