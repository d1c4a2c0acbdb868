"""Level generation: procedural training arena + debug levels 2-8.

TPU-native re-design of the reference generator (src/level_gen.cpp): instead
of entity create/destroy, generation *fills a fixed-capacity world state* —
box slots, ramp slots, agent slots, wall slots — with active masks. Every
loop is bounded so the generator traces into a static-shape XLA program and
runs under `vmap` across worlds, gated by `lax.cond` inside the env step so
its cost is only paid on reset steps.

Rejection placement (reference: src/level_gen.cpp:125-292) is vectorized:
all 21 candidate poses (20 rejections + forced accept, reference
max_rejections=20 at :123) are sampled at once and the first non-overlapping
candidate wins, which is semantically identical to the reference's
sequential accept loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import (
    ARENA_HALF,
    EnvConfig,
    MAX_WALLS,
)
from marl_hideandseek_tpu.env import geometry
from marl_hideandseek_tpu.types import (
    AGENT_HIDER,
    AGENT_SEEKER,
    INV_MASS_AGENT,
    INV_MASS_BOX,
    INV_MASS_RAMP,
    MU_D_AGENT,
    MU_D_CUBE,
    MU_D_ELONGATED,
    MU_D_RAMP,
    OWNER_NONE,
    OWNER_UNOWNABLE,
    EnvState,
    GrabState,
    RigidBodies,
    StaticGeom,
    body_slot_ranges,
)

# Shape half-extents, from the collision OBJs
# (reference: data/*_collision.obj; cube/agent are unit boxes, the elongated
# box is (4, 0.75, 1), the ramp hull is x in [-1,1], y in [-2,1], z in [-1,1]).
CUBE_HALF = jnp.array([1.0, 1.0, 1.0])
ELONGATED_HALF = jnp.array([4.0, 0.75, 1.0])
AGENT_HALF = jnp.array([1.0, 1.0, 1.0])
RAMP_HALF = jnp.array([1.0, 1.5, 1.0])     # OBB of the wedge
RAMP_CENTER_OFF = jnp.array([0.0, -0.5, 0.0])  # wedge OBB centre in body frame

NUM_EXTRA_PLANES = 2  # debug levels add up to 2 side planes
MAX_PLANES = 1 + NUM_EXTRA_PLANES

_MAX_REJECTIONS = 20  # reference: src/level_gen.cpp:123


def _box_inv_inertia(half_ext: jnp.ndarray, inv_mass: jnp.ndarray) -> jnp.ndarray:
    """Diagonal inverse inertia of a solid box (body frame)."""
    a2 = half_ext[..., 0] ** 2
    b2 = half_ext[..., 1] ** 2
    c2 = half_ext[..., 2] ** 2
    m = 1.0 / jnp.maximum(inv_mass, 1e-9)
    i = (m / 3.0) * jnp.stack([b2 + c2, a2 + c2, a2 + b2], axis=-1)
    inv = jnp.where(inv_mass[..., None] > 0.0, 1.0 / jnp.maximum(i, 1e-9), 0.0)
    return inv


def empty_world(cfg: EnvConfig) -> EnvState:
    """All-inactive single-world state (no leading worlds axis)."""
    nb = cfg.num_dyn_bodies
    na = cfg.max_agents
    bodies = RigidBodies(
        pos=jnp.zeros((nb, 3)),
        quat=math3d.quat_identity((nb,)),
        vel=jnp.zeros((nb, 3)),
        omega=jnp.zeros((nb, 3)),
        half_ext=jnp.ones((nb, 3)),
        inv_mass=jnp.zeros((nb,)),
        inv_inertia=jnp.zeros((nb, 3)),
        friction_mu=jnp.ones((nb,)),
        active=jnp.zeros((nb,), bool),
        locked=jnp.zeros((nb,), bool),
        owner=jnp.full((nb,), OWNER_NONE, jnp.int32),
    )
    statics = StaticGeom(
        wall_pos=jnp.zeros((MAX_WALLS, 3)),
        wall_half_ext=jnp.ones((MAX_WALLS, 3)),
        wall_active=jnp.zeros((MAX_WALLS,), bool),
        plane_point=jnp.zeros((MAX_PLANES, 3)),
        plane_normal=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (MAX_PLANES, 1)),
        plane_active=jnp.zeros((MAX_PLANES,), bool).at[0].set(True),
    )
    grab = GrabState(
        target=jnp.full((na,), -1, jnp.int32),
        r2=jnp.zeros((na, 3)),
        rel_q=math3d.quat_identity((na,)),
        sep=jnp.zeros((na,)),
    )
    return EnvState(
        bodies=bodies,
        statics=statics,
        grab=grab,
        agent_type=jnp.zeros((na,), jnp.int32),
        agent_active=jnp.zeros((na,), bool),
        num_hiders=jnp.array(0, jnp.int32),
        num_seekers=jnp.array(0, jnp.int32),
        num_active_boxes=jnp.array(0, jnp.int32),
        num_active_ramps=jnp.array(0, jnp.int32),
        step=jnp.array(0, jnp.int32),
        episode_counter=jnp.array(0, jnp.uint32),
        ep_key=jnp.zeros((2,), jnp.uint32),
        level_key=jnp.zeros((2,), jnp.uint32),
        seekers_first=jnp.array(False),
        running_scores=jnp.zeros((2,), jnp.int32),
        finished_scores=jnp.zeros((2,), jnp.float32),
        hider_team_reward=jnp.array(1.0, jnp.float32),
        # Placeholder miss values; init/step/load recompute the sweep on
        # every freshly generated world before these are consumed.
        act_hit_t=jnp.full((na,), jnp.inf, jnp.float32),
        act_hit_id=jnp.full((na,), -1, jnp.int32),
    )


def _set_body(state: EnvState, slot, *, pos, quat, half_ext, inv_mass,
              inv_inertia, friction_mu, active, locked, owner,
              vel=None, omega=None) -> EnvState:
    b = state.bodies
    vel = jnp.zeros(3) if vel is None else vel
    omega = jnp.zeros(3) if omega is None else omega
    b = b.replace(
        pos=b.pos.at[slot].set(pos),
        quat=b.quat.at[slot].set(quat),
        vel=b.vel.at[slot].set(vel),
        omega=b.omega.at[slot].set(omega),
        half_ext=b.half_ext.at[slot].set(half_ext),
        inv_mass=b.inv_mass.at[slot].set(inv_mass),
        inv_inertia=b.inv_inertia.at[slot].set(inv_inertia),
        friction_mu=b.friction_mu.at[slot].set(friction_mu),
        active=b.active.at[slot].set(active),
        locked=b.locked.at[slot].set(locked),
        owner=b.owner.at[slot].set(owner),
    )
    return state.replace(bodies=b)


class _PlacedSet(NamedTuple):
    """World AABBs of already-placed colliders for rejection tests."""

    lo: jnp.ndarray    # [N, 3]
    hi: jnp.ndarray    # [N, 3]
    mask: jnp.ndarray  # [N]


def _rejection_place(key, placed: _PlacedSet, half_ext, center_off):
    """Sample up to 21 poses, return (pos, yaw_quat) of the winner.

    Mirrors src/level_gen.cpp:125-156: pos uniform in [-18,18]^2 at z=1,
    yaw uniform in [0, pi); first candidate whose rotated AABB clears every
    placed AABB wins, else candidate #20 is forced.
    """
    n_trials = _MAX_REJECTIONS + 1
    k_pos, k_rot = jax.random.split(key)
    xy = jax.random.uniform(
        k_pos, (n_trials, 2), minval=-ARENA_HALF, maxval=ARENA_HALF)
    pos = jnp.concatenate([xy, jnp.ones((n_trials, 1))], axis=-1)
    yaw = jax.random.uniform(k_rot, (n_trials,)) * jnp.pi
    quat = math3d.quat_from_yaw(yaw)

    centers = pos + math3d.quat_rotate(quat, jnp.broadcast_to(
        center_off, (n_trials, 3)))
    lo, hi = math3d.obb_world_aabb(centers, quat, jnp.broadcast_to(
        half_ext, (n_trials, 3)))

    overlap = math3d.aabb_overlap(
        lo[:, None, :], hi[:, None, :],
        placed.lo[None, :, :], placed.hi[None, :, :])  # [T, N]
    any_overlap = jnp.any(overlap & placed.mask[None, :], axis=1)  # [T]

    ok_rank = jnp.where(~any_overlap, jnp.arange(n_trials), n_trials)
    win = jnp.minimum(jnp.argmin(ok_rank), n_trials - 1)
    # One-hot pick via multiply-reduce: a traced-index gather would lower
    # to a per-world loop under vmap, and `oh @ pos` would become a tiny
    # MXU dot_general; the masked sum stays on the VPU.
    oh = (jnp.arange(n_trials) == win)[:, None]

    def pick(x):
        return jnp.sum(jnp.where(oh, x, 0.0), axis=0)

    return pick(pos), pick(quat), pick(lo), pick(hi)


def _append_placed(placed: _PlacedSet, idx, lo, hi, do) -> _PlacedSet:
    return _PlacedSet(
        lo=jnp.where(do, placed.lo.at[idx].set(lo), placed.lo),
        hi=jnp.where(do, placed.hi.at[idx].set(hi), placed.hi),
        mask=jnp.where(do, placed.mask.at[idx].set(True), placed.mask),
    )


def generate_training_world(cfg: EnvConfig, level_key, ep_key,
                            num_hiders, num_seekers,
                            seekers_first) -> EnvState:
    """Level id 1 (reference: src/level_gen.cpp:79-308), single world.

    `num_hiders`/`num_seekers`/`seekers_first` are drawn by the caller from
    the episode RNG (reference: src/sim.cpp:187-190, src/level_gen.cpp:234).

    Draw-for-draw diff against the reference generator (each draw below
    verified against src/level_gen.cpp:84-308; VERDICT.md round-1 weak
    item 8):

      * total boxes: sampleI32(3, 10) = U[3, 9]            (:84)  == ours
      * elongated:   sampleI32(3, total) = U[3, total-1], degenerating to
        3 when total == 3 (madrona sampleI32(a, a) == a)   (:88)  == ours
        (3 + U[0, max(total-3, 1))); elongated are placed/indexed FIRST,
        cubes after (:125, :186), matching the slot<num_elongated rule.
      * placement: pos uniform [-18, 18]^2 at z=1, yaw uniform [0, pi),
        rotated-AABB overlap vs walls + previously placed entities,
        forced accept after 20 rejections (:123-156). Ours draws the 21
        candidates from independent subkeys instead of one sequential
        stream and takes the first acceptable — identical acceptance rule
        and distribution, different bit-stream (structural RNG parity,
        SURVEY.md §2.4 E7).
      * ramps: always maxRamps=2, same placement loop     (:201-230)
      * seekers_first: the reference draws it from the EPISODE RNG stream
        unconditionally and forces false when RandomFlipTeams is unset
        (:234-239, burning the draw); our episode draws use independent
        fold_in keys, so the no-flip case simply skips the draw — no
        stream to keep aligned (intentional divergence; the explicit
        level/episode keys in checkpoints replace the reference's
        RNG-burn replay hack, src/sim.cpp:976-980).
      * team order: team 0 placed fully before team 1, agents checked
        against obstacles but NOT added to the overlap set (:265-292).
      * ground plane appended last (:294), numObstacles excludes agents.
    """
    state = empty_world(cfg)
    (box_lo, _), (ramp_lo, _), (agent_lo, _) = body_slot_ranges(cfg)

    k_counts, k_place = jax.random.split(jax.random.wrap_key_data(level_key))

    # Box counts (reference: src/level_gen.cpp:84-90).
    k_total, k_elong = jax.random.split(k_counts)
    total_boxes = jax.random.randint(k_total, (), 3, cfg.max_boxes + 1)
    num_elongated = 3 + jax.random.randint(
        k_elong, (), 0, jnp.maximum(total_boxes - 3, 1))
    num_elongated = jnp.minimum(num_elongated, total_boxes)

    # Walls.
    ws = geometry.make_walls(jax.random.fold_in(k_place, 1000))
    ws = geometry.scale_walls(ws, -ARENA_HALF, ARENA_HALF)
    wall_pos, wall_half, wall_act = geometry.walls_to_obbs(ws)
    statics = state.statics.replace(
        wall_pos=wall_pos,
        wall_half_ext=wall_half,
        wall_active=wall_act,
    )
    state = state.replace(statics=statics)

    # Placed-collider set: walls first (they are AABBs), then dynamic bodies.
    n_placed_cap = MAX_WALLS + cfg.max_boxes + cfg.max_ramps
    placed = _PlacedSet(
        lo=jnp.zeros((n_placed_cap, 3)),
        hi=jnp.zeros((n_placed_cap, 3)),
        mask=jnp.zeros((n_placed_cap,), bool),
    )
    placed = _PlacedSet(
        lo=placed.lo.at[:MAX_WALLS].set(wall_pos - wall_half),
        hi=placed.hi.at[:MAX_WALLS].set(wall_pos + wall_half),
        mask=placed.mask.at[:MAX_WALLS].set(wall_act),
    )

    # --- boxes then ramps then agents, sequentially (order matters for the
    # overlap set; reference places elongated, cubes, ramps, team agents).
    # The loop is UNROLLED (17 entities) so every slot index is static:
    # under vmap over 16K worlds a traced slot would turn each of the ~11
    # per-entity field writes into a batched scatter, which TPU lowers to
    # a serial loop (measured: scan version 1.1s, unrolled ~ms).
    nb, nr, na = cfg.max_boxes, cfg.max_ramps, cfg.max_agents
    n_ent = nb + nr + na
    size0 = jnp.where(seekers_first, num_seekers, num_hiders)
    type0 = jnp.where(seekers_first, AGENT_SEEKER, AGENT_HIDER)
    type1 = jnp.where(seekers_first, AGENT_HIDER, AGENT_SEEKER)
    ent_keys = jax.random.split(jax.random.fold_in(k_place, 2000), n_ent)

    agent_types = []
    agent_actives = []
    for slot in range(n_ent):
        is_box = slot < nb
        is_ramp = nb <= slot < nb + nr
        is_agent = slot >= nb + nr

        if is_box:
            is_elong = slot < num_elongated  # traced bool
            half_ext = jnp.where(is_elong, ELONGATED_HALF, CUBE_HALF)
            friction = jnp.where(is_elong, MU_D_ELONGATED, MU_D_CUBE)
            inv_mass = jnp.asarray(INV_MASS_BOX)
            center_off = jnp.zeros(3)
            ent_active = jnp.asarray(slot < total_boxes)
        elif is_ramp:
            half_ext = RAMP_HALF
            friction = jnp.asarray(MU_D_RAMP)
            inv_mass = jnp.asarray(INV_MASS_RAMP)
            center_off = RAMP_CENTER_OFF
            ent_active = jnp.array(True)  # always 2 ramps (level_gen.cpp:201)
        else:
            half_ext = AGENT_HALF
            friction = jnp.asarray(MU_D_AGENT)
            inv_mass = jnp.asarray(INV_MASS_AGENT)
            center_off = jnp.zeros(3)
            agent_idx = slot - (nb + nr)
            ent_active = jnp.asarray(agent_idx < num_hiders + num_seekers)
            agent_types.append(jnp.where(agent_idx < size0, type0, type1))
            agent_actives.append(ent_active)

        pos, quat, lo, hi = _rejection_place(ent_keys[slot], placed,
                                             half_ext, center_off)

        inv_inertia = _box_inv_inertia(half_ext, inv_mass)
        if is_agent:
            # Agents only yaw (reference: src/mgr.cpp:576-584 zeroes inv
            # inertia x/y for the agent bodies).
            inv_inertia = inv_inertia * jnp.array([0.0, 0.0, 1.0])
            owner = OWNER_UNOWNABLE
        else:
            owner = OWNER_NONE

        state = _set_body(
            state, slot,
            pos=pos, quat=quat, half_ext=half_ext, inv_mass=inv_mass,
            inv_inertia=inv_inertia, friction_mu=friction,
            active=ent_active, locked=jnp.array(False),
            owner=jnp.where(ent_active, owner, OWNER_NONE))

        # Agents are NOT added to the overlap set (reference: makeAgent is
        # never pushed to all_entities, src/level_gen.cpp:285).
        if not is_agent:
            placed = _append_placed(placed, MAX_WALLS + slot, lo, hi,
                                    ent_active)

    # Agent bookkeeping.
    agent_types_v = jnp.stack(agent_types)
    agent_act = jnp.stack(agent_actives)
    state = state.replace(
        agent_type=jnp.where(agent_act, agent_types_v, jnp.int32(0)),
        agent_active=agent_act,
        num_hiders=num_hiders.astype(jnp.int32),
        num_seekers=num_seekers.astype(jnp.int32),
        num_active_boxes=total_boxes.astype(jnp.int32),
        num_active_ramps=jnp.array(nr, jnp.int32),
        seekers_first=seekers_first,
        level_key=level_key,
        ep_key=ep_key,
    )
    return state


# ---------------------------------------------------------------------------
# Debug levels 2-8 (reference: src/level_gen.cpp:336-526). Used as physics
# test fixtures, selectable via per-world reset levels like the viewer keys.
# ---------------------------------------------------------------------------


def _quat_aa(deg, axis):
    return math3d.quat_from_angle_axis(
        jnp.deg2rad(jnp.asarray(deg, jnp.float32)), jnp.asarray(axis, jnp.float32))


def _add_box_body(state, cfg, box_idx, pos, quat, half_ext,
                  locked=False, vel=None):
    (box_lo, _), _, _ = body_slot_ranges(cfg)
    inv_mass = 0.0 if locked else INV_MASS_BOX
    return _set_body(
        state, box_lo + box_idx,
        pos=jnp.asarray(pos, jnp.float32), quat=quat,
        half_ext=half_ext,
        inv_mass=jnp.array(INV_MASS_BOX),
        inv_inertia=_box_inv_inertia(half_ext, jnp.array(INV_MASS_BOX)),
        friction_mu=jnp.array(MU_D_CUBE),
        active=jnp.array(True), locked=jnp.array(locked),
        owner=jnp.array(OWNER_NONE, jnp.int32), vel=vel)


def _add_ramp_body(state, cfg, ramp_idx, pos, quat, locked=False, vel=None):
    _, (ramp_lo, _), _ = body_slot_ranges(cfg)
    return _set_body(
        state, ramp_lo + ramp_idx,
        pos=jnp.asarray(pos, jnp.float32), quat=quat,
        half_ext=RAMP_HALF,
        inv_mass=jnp.array(INV_MASS_RAMP),
        inv_inertia=_box_inv_inertia(RAMP_HALF, jnp.array(INV_MASS_RAMP)),
        friction_mu=jnp.array(MU_D_RAMP),
        active=jnp.array(True), locked=jnp.array(locked),
        owner=jnp.array(OWNER_NONE, jnp.int32), vel=vel)


def _add_agent(state, cfg, agent_idx, pos, quat, agent_type):
    _, _, (agent_lo, _) = body_slot_ranges(cfg)
    inv_inertia = _box_inv_inertia(AGENT_HALF, jnp.array(INV_MASS_AGENT))
    inv_inertia = inv_inertia * jnp.array([0.0, 0.0, 1.0])
    state = _set_body(
        state, agent_lo + agent_idx,
        pos=jnp.asarray(pos, jnp.float32), quat=quat,
        half_ext=AGENT_HALF,
        inv_mass=jnp.array(INV_MASS_AGENT),
        inv_inertia=inv_inertia,
        friction_mu=jnp.array(MU_D_AGENT),
        active=jnp.array(True), locked=jnp.array(False),
        owner=jnp.array(OWNER_UNOWNABLE, jnp.int32))
    is_hider = agent_type == AGENT_HIDER
    return state.replace(
        agent_type=state.agent_type.at[agent_idx].set(agent_type),
        agent_active=state.agent_active.at[agent_idx].set(True),
        num_hiders=state.num_hiders + jnp.where(is_hider, 1, 0),
        num_seekers=state.num_seekers + jnp.where(is_hider, 0, 1),
    )


def _add_side_planes(state):
    """Static planes at x = +/-20 facing inward (levels 7-8)."""
    s = state.statics
    s = s.replace(
        plane_point=s.plane_point.at[1].set(jnp.array([-20.0, 0.0, 0.0]))
        .at[2].set(jnp.array([20.0, 0.0, 0.0])),
        plane_normal=s.plane_normal.at[1].set(jnp.array([1.0, 0.0, 0.0]))
        .at[2].set(jnp.array([-1.0, 0.0, 0.0])),
        plane_active=s.plane_active.at[1].set(True).at[2].set(True),
    )
    return state.replace(statics=s)


def _level2(cfg: EnvConfig) -> EnvState:
    """Tilted cube drop (reference: src/level_gen.cpp:351-356)."""
    state = empty_world(cfg)
    rot = math3d.quat_normalize(math3d.quat_mul(
        math3d.quat_from_angle_axis(
            jnp.arctan(1.0 / jnp.sqrt(2.0)), jnp.array([0.0, 1.0, 0.0])),
        _quat_aa(45.0, [1.0, 0.0, 0.0])))
    return _add_box_body(state, cfg, 0, [0.0, 0.0, 5.0], rot, CUBE_HALF)


def _level3(cfg: EnvConfig) -> EnvState:
    """Axis-aligned cube drop (reference: src/level_gen.cpp:358-361)."""
    state = empty_world(cfg)
    return _add_box_body(state, cfg, 0, [0.0, 0.0, 5.0],
                         math3d.quat_identity(), CUBE_HALF)


def _level4(cfg: EnvConfig) -> EnvState:
    """Falling elongated box at 45 deg (reference: src/level_gen.cpp:363-394)."""
    state = empty_world(cfg)
    rot = _quat_aa(45.0, [0.0, 1.0, 0.0])
    return _add_box_body(state, cfg, 0, [0.0, 0.0, 10.0], rot, ELONGATED_HALF)


def _level5(cfg: EnvConfig) -> EnvState:
    """Lone hider (reference: src/level_gen.cpp:396-405)."""
    state = empty_world(cfg)
    return _add_agent(state, cfg, 0, [0.0, 0.0, 1.0],
                      math3d.quat_identity(), jnp.int32(AGENT_HIDER))


def _level6(cfg: EnvConfig) -> EnvState:
    """Wall + cube + hider + seeker (reference: src/level_gen.cpp:407-432)."""
    state = empty_world(cfg)
    s = state.statics
    s = s.replace(
        wall_pos=s.wall_pos.at[0].set(jnp.array([0.0, 0.0, 1.25])),
        wall_half_ext=s.wall_half_ext.at[0].set(
            jnp.array([10.0, 0.2, 1.25])),
        wall_active=s.wall_active.at[0].set(True),
    )
    state = state.replace(statics=s)
    state = _add_box_body(state, cfg, 0, [0.0, -5.0, 1.0],
                          math3d.quat_identity(), CUBE_HALF)
    state = _add_agent(state, cfg, 0, [-15.0, -15.0, 1.5],
                       _quat_aa(-45.0, [0.0, 0.0, 1.0]),
                       jnp.int32(AGENT_HIDER))
    if cfg.max_agents >= 2:
        state = _add_agent(state, cfg, 1, [-15.0, -10.0, 1.5],
                           _quat_aa(45.0, [0.0, 0.0, 1.0]),
                           jnp.int32(AGENT_SEEKER))
    return state


def _level7(cfg: EnvConfig) -> EnvState:
    """Two stacked tilted cubes in a 3-plane corner
    (reference: src/level_gen.cpp:434-462)."""
    state = empty_world(cfg)
    rot = math3d.quat_normalize(math3d.quat_mul(
        _quat_aa(45.0, [0.0, 1.0, 0.0]), _quat_aa(40.0, [1.0, 0.0, 0.0])))
    state = _add_box_body(state, cfg, 0, [0.0, 0.0, 5.0], rot, CUBE_HALF)
    state = _add_box_body(state, cfg, 1, [0.0, 0.0, 10.0], rot, CUBE_HALF)
    return _add_side_planes(state)


def _level8(cfg: EnvConfig) -> EnvState:
    """Ramp with downward velocity onto a static ramp
    (reference: src/level_gen.cpp:464-499). The static ramp occupies the
    second dynamic ramp slot with locked=True (equivalent to the reference's
    ResponseType::Static obstacle that is not in the observed ramps array)."""
    state = empty_world(cfg)
    ramp_rot = math3d.quat_normalize(math3d.quat_mul(
        math3d.quat_mul(_quat_aa(25.0, [0.0, 1.0, 0.0]),
                        _quat_aa(90.0, [0.0, 0.0, 1.0])),
        _quat_aa(45.0, [1.0, 0.0, 0.0])))
    state = _add_ramp_body(state, cfg, 0, [0.0, 0.0, 10.0], ramp_rot,
                           vel=jnp.array([0.0, 0.0, -30.0]))
    static_rot = math3d.quat_normalize(math3d.quat_mul(
        _quat_aa(-90.0, [1.0, 0.0, 0.0]),
        _quat_aa(180.0, [0.0, 1.0, 0.0])))
    state = _add_ramp_body(state, cfg, 1, [-0.5, -0.5, 1.0], static_rot,
                           locked=True)
    return _add_side_planes(state)


def generate_world(cfg: EnvConfig, level_key, ep_key, level_id,
                   num_hiders, num_seekers, seekers_first) -> EnvState:
    """Dispatch on level id (reference: src/level_gen.cpp:312-334,501-526).

    Level 1 = procedural training world; 2-8 = debug fixtures; any other id
    behaves like 1 (the reference defaults unknown levels to nothing, but
    callers only pass 1-8).
    """
    def train_fn(_):
        return generate_training_world(
            cfg, level_key, ep_key, num_hiders, num_seekers, seekers_first)

    branches = [train_fn] + [
        lambda _, f=f: f(cfg).replace(level_key=level_key, ep_key=ep_key)
        for f in (_level2, _level3, _level4, _level5, _level6, _level7,
                  _level8)
    ]
    idx = jnp.clip(level_id - 1, 0, len(branches) - 1)
    return jax.lax.switch(idx, branches, None)
