"""Utilities: native IO bindings, profiling helpers."""
