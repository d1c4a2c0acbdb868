"""Batched hide-and-seek environment (pure JAX)."""

from marl_hideandseek_tpu.env.env import HideAndSeekEnv

__all__ = ["HideAndSeekEnv"]
