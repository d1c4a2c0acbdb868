"""Environment configuration.

Mirrors the capability surface of the reference's layered config system
(reference: src/sim_flags.hpp:7-13, src/mgr.hpp:16-32, src/sim.hpp:37-43,
src/sim.cpp:14-17) as one frozen dataclass tree. All counts are static so the
whole environment compiles to a single fixed-shape XLA program.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class SimFlags(enum.IntFlag):
    """Bit-compatible with the reference enum (src/sim_flags.hpp:7-13)."""

    Default = 0
    UseFixedWorld = 1 << 0
    IgnoreEpisodeLength = 1 << 1
    RandomFlipTeams = 1 << 2
    ZeroAgentVelocity = 1 << 3


# World capacity constants (reference: src/sim.hpp:39-41).
MAX_BOXES = 9
MAX_RAMPS = 2
MAX_AGENTS = 6
# Wall grammar bounds (reference: src/geo_gen.cpp:430-431 — maxAddDoors=7,
# maxConnect=6; 4 seed walls + 6 connect ops x 4 walls + 6 door ops x 1 wall
# = 34 maximum live wall segments; we round up for slack).
MAX_WALLS = 36
# Episode constants (reference: src/sim.cpp:14-17).
DT = 1.0 / 30.0
NUM_PHYSICS_SUBSTEPS = 4
NUM_PREP_STEPS = 96
EPISODE_LEN = 240

# Arena half-extent: levels are scaled into [-18, 18]^2
# (reference: src/level_gen.cpp:94, src/geo_gen.cpp:474).
ARENA_HALF = 18.0

# Lidar constants (reference: src/sim.cpp:712-759).
NUM_LIDAR_SAMPLES = 30
LIDAR_MAX_RANGE = 200.0

# Visibility cone half-angle cosine: 135 degree FOV
# (reference: src/sim.cpp:582).
VIS_FOV_DEGREES = 135.0

# Grab / lock interaction ray length (reference: src/sim.cpp:288-289).
INTERACT_RAY_LEN = 2.5

# Out-of-bounds penalty threshold and magnitude (reference: src/sim.cpp:834-838).
OOB_LIMIT = 18.0
OOB_PENALTY = 10.0


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration.

    Equivalent capability to Manager::Config (reference: src/mgr.hpp:16-32)
    minus the GPU/batch-renderer knobs that have no TPU analogue.
    """

    num_worlds: int = 2
    min_hiders: int = 2
    max_hiders: int = 2
    min_seekers: int = 2
    max_seekers: int = 2
    sim_flags: SimFlags = SimFlags.Default
    rand_seed: int = 5
    num_pbt_policies: int = 0

    # Static capacities; keep at reference values for tensor-shape parity.
    max_boxes: int = MAX_BOXES
    max_ramps: int = MAX_RAMPS
    max_walls: int = MAX_WALLS

    # Staggered-reset budget: when 0 < budget < num_worlds and at most
    # `budget` worlds reset on a step, only those worlds are gathered,
    # regenerated, and scattered back instead of regenerating the whole
    # batch (the reference regenerates per-world inside the megakernel,
    # src/sim.cpp:172-200; a full-batch regen made 1%-per-step reset
    # workloads ~75x slower). Synchronized end-of-episode bursts (> budget
    # worlds at once) still take the full-batch path. Must be a multiple
    # of 128 so the compact re-sweep can use the Pallas raycast kernel.
    reset_budget: int = 256

    # Episode structure.
    episode_len: int = EPISODE_LEN
    num_prep_steps: int = NUM_PREP_STEPS
    dt: float = DT
    num_physics_substeps: int = NUM_PHYSICS_SUBSTEPS

    # Contact restitution coefficient (0 = perfectly inelastic, the
    # reference's effective behavior). Nonzero values enable the XPBD
    # restitution velocity pass (env/physics.py); the default costs
    # nothing (statically compiled out).
    restitution: float = 0.0

    def __post_init__(self):
        max_agents = self.max_hiders + self.max_seekers
        if not (0 < max_agents <= MAX_AGENTS):
            raise ValueError(
                f"max_hiders + max_seekers must be in (0, {MAX_AGENTS}]; "
                f"got {max_agents}"
            )
        if self.min_hiders > self.max_hiders:
            raise ValueError("min_hiders > max_hiders")
        if self.min_seekers > self.max_seekers:
            raise ValueError("min_seekers > max_seekers")
        # Values >= 128 must be lane-aligned so the compact re-sweep can
        # run the Pallas raycast kernel; smaller values stay allowed for
        # CPU tests (and 0 disables the compact path entirely).
        if self.reset_budget >= 128 and self.reset_budget % 128 != 0:
            raise ValueError(
                f"reset_budget must be a multiple of 128 (TPU lane width) "
                f"when >= 128; got {self.reset_budget}"
            )

    # ---- derived static quantities -------------------------------------

    @property
    def max_agents(self) -> int:
        """Max agents per world = maxHiders + maxSeekers (src/sim.cpp:1383)."""
        return self.max_hiders + self.max_seekers

    @property
    def num_dyn_bodies(self) -> int:
        """Dynamic rigid bodies per world: boxes + ramps + agents."""
        return self.max_boxes + self.max_ramps + self.max_agents

    @property
    def use_fixed_world(self) -> bool:
        return bool(self.sim_flags & SimFlags.UseFixedWorld)

    @property
    def ignore_episode_length(self) -> bool:
        return bool(self.sim_flags & SimFlags.IgnoreEpisodeLength)

    @property
    def random_flip_teams(self) -> bool:
        return bool(self.sim_flags & SimFlags.RandomFlipTeams)

    @property
    def zero_agent_velocity(self) -> bool:
        return bool(self.sim_flags & SimFlags.ZeroAgentVelocity)

    def replace(self, **kwargs) -> "EnvConfig":
        return dataclasses.replace(self, **kwargs)
