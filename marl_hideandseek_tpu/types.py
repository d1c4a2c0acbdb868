"""Core pytree types: environment state, step results.

TPU-first replacement for the reference's ECS archetypes (src/sim.hpp:101-313):
fixed-capacity struct-of-arrays with active masks instead of entity
create/destroy — static shapes end to end, so the whole sim compiles once.

Dynamic rigid bodies live in one unified slot array per world:

  slot [0, max_boxes)                      -> boxes (OBBs; elongated or cube)
  slot [max_boxes, max_boxes+max_ramps)    -> ramps (wedges)
  slot [.., .. + max_agents)               -> agents (OBBs, half-extent 1)

Static collision geometry (walls + planes) is stored separately since it
needs no integration: walls are axis-aligned boxes in the procedural levels
(reference: src/geo_gen.cpp:499-501 always uses identity rotation) but we
keep a quaternion per static slot so debug levels (rotated static ramp in
level 8, src/level_gen.cpp:482-489) fit the same layout.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

from marl_hideandseek_tpu.config import EnvConfig

# Owner-team encoding (reference: src/sim.hpp:127-132).
OWNER_NONE = 0
OWNER_SEEKER = 1
OWNER_HIDER = 2
OWNER_UNOWNABLE = 3

# Agent type encoding (reference: src/sim.hpp:138-141).
AGENT_SEEKER = 0
AGENT_HIDER = 1

# Body-slot shape kinds (static per slot; ramps are wedges, rest are boxes).
SHAPE_BOX = 0
SHAPE_WEDGE = 1

# Inverse masses per object class (reference: src/mgr.cpp:521-559 —
# cube/ramp/elongated 0.5, agents 1.0, walls/plane 0).
INV_MASS_BOX = 0.5
INV_MASS_RAMP = 0.5
INV_MASS_AGENT = 1.0

# Dynamic friction coefficients per object class
# (reference: src/mgr.cpp:476-559 — plane muD=2, cube 2, wall 2, agent 16,
# ramp 1, elongated box 4).
MU_D_CUBE = 2.0
MU_D_ELONGATED = 4.0
MU_D_RAMP = 1.0
MU_D_AGENT = 16.0
MU_D_WALL = 2.0
MU_D_PLANE = 2.0


@struct.dataclass
class RigidBodies:
    """Batched dynamic rigid bodies, [..., B, k] arrays."""

    pos: jnp.ndarray        # [..., B, 3] f32
    quat: jnp.ndarray       # [..., B, 4] f32 (w, x, y, z)
    vel: jnp.ndarray        # [..., B, 3] f32 linear velocity (world)
    omega: jnp.ndarray      # [..., B, 3] f32 angular velocity (world)
    half_ext: jnp.ndarray   # [..., B, 3] f32 box/wedge-OBB half extents
    inv_mass: jnp.ndarray   # [..., B] f32 (0 when static/locked-by-solver)
    inv_inertia: jnp.ndarray  # [..., B, 3] f32 body-frame diagonal
    friction_mu: jnp.ndarray  # [..., B] f32 dynamic friction coefficient
    active: jnp.ndarray     # [..., B] bool
    locked: jnp.ndarray     # [..., B] bool (ResponseType::Static toggle)
    owner: jnp.ndarray      # [..., B] i32 OwnerTeam encoding


@struct.dataclass
class StaticGeom:
    """Walls and planes per world.

    Walls are axis-aligned boxes: the reference's procedural generator only
    ever instantiates walls with identity rotation
    (src/geo_gen.cpp:499-501), which lets the hot raycast/contact paths use
    cheap slab tests. The one rotated static obstacle in the debug levels
    (level 8's static ramp) lives in a locked dynamic ramp slot instead.
    """

    wall_pos: jnp.ndarray       # [..., MW, 3] f32 box centre
    wall_half_ext: jnp.ndarray  # [..., MW, 3] f32
    wall_active: jnp.ndarray    # [..., MW] bool
    # Planes: slot 0 is the ground plane z=0, extra slots for debug levels
    # (reference: src/level_gen.cpp:455-459, 491-496 side planes).
    plane_point: jnp.ndarray    # [..., P, 3] f32
    plane_normal: jnp.ndarray   # [..., P, 3] f32
    plane_active: jnp.ndarray   # [..., P] bool


@struct.dataclass
class GrabState:
    """Per-agent grab joints, the TPU equivalent of the XPBD fixed joint
    created in actionSystem (reference: src/sim.cpp:313-361)."""

    target: jnp.ndarray   # [..., A] i32 dyn-body slot index, -1 = none
    r2: jnp.ndarray       # [..., A, 3] f32 attach point in target local frame
    rel_q: jnp.ndarray    # [..., A, 4] f32 target-frame attach rotation
    sep: jnp.ndarray      # [..., A] f32 separation along agent forward


@struct.dataclass
class EnvState:
    """Full per-world simulation state, leading axis = worlds."""

    bodies: RigidBodies
    statics: StaticGeom
    grab: GrabState

    # Agent bookkeeping (A = cfg.max_agents slots).
    agent_type: jnp.ndarray     # [W, A] i32 (AGENT_SEEKER / AGENT_HIDER)
    agent_active: jnp.ndarray   # [W, A] bool

    # Active entity counters (reference Sim:: members, src/sim.hpp:336-352).
    num_hiders: jnp.ndarray       # [W] i32
    num_seekers: jnp.ndarray      # [W] i32
    num_active_boxes: jnp.ndarray  # [W] i32
    num_active_ramps: jnp.ndarray  # [W] i32

    # Episode bookkeeping.
    step: jnp.ndarray            # [W] i32 curEpisodeStep
    episode_counter: jnp.ndarray  # [W] u32 curWorldEpisode
    ep_key: jnp.ndarray          # [W, 2] u32 episode PRNG key data
    level_key: jnp.ndarray       # [W, 2] u32 level-gen PRNG key data (stored
    #                              explicitly; replaces the reference's
    #                              RNG-burn checkpoint hack, src/sim.cpp:976-980)
    seekers_first: jnp.ndarray   # [W] bool TeamState.seekersFirst
    running_scores: jnp.ndarray  # [W, 2] i32 EpisodeStats
    finished_scores: jnp.ndarray  # [W, 2] f32 EpisodeResult
    hider_team_reward: jnp.ndarray  # [W] f32 (the AtomicFloat flag,
    #                              src/sim.hpp:362, as a plain per-world scalar)

    # Carried grab/lock interaction-ray hits, traced on THIS state at the
    # end of the step that produced it (the reference traces them at the
    # start of the next step on the identical pre-physics state,
    # src/sim.cpp:285-331; carrying them lets the whole per-step ray sweep
    # run fused with the physics kernel).
    act_hit_t: jnp.ndarray      # [W, A] f32 (+inf miss)
    act_hit_id: jnp.ndarray     # [W, A] i32 (-1 miss)

    @property
    def num_worlds(self) -> int:
        return self.step.shape[0]


def body_slot_ranges(cfg: EnvConfig):
    """(box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi)."""
    b0 = 0
    b1 = cfg.max_boxes
    r1 = b1 + cfg.max_ramps
    a1 = r1 + cfg.max_agents
    return (b0, b1), (b1, r1), (r1, a1)


Obs = Dict[str, jnp.ndarray]


@struct.dataclass
class StepResult:
    """Outputs of one env step, mirroring the reference train interface
    (reference: src/mgr.cpp:1338-1375)."""

    obs: Any                     # dict of named observation arrays
    rewards: jnp.ndarray         # [W, A, 1] f32
    dones: jnp.ndarray           # [W, A, 1] i32
    episode_results: jnp.ndarray  # [W, 2] f32
