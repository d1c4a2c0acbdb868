"""Mesh / sharding helpers for multi-chip and multi-host scaling."""

from marl_hideandseek_tpu.parallel.mesh import (
    make_mesh,
    shard_training_manager,
    training_state_shardings,
)

__all__ = ["make_mesh", "training_state_shardings",
           "shard_training_manager"]
