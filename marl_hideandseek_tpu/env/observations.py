"""Observation builder: self/relative obs, visibility masks, lidar.

Produces the reference's 11 named observation tensors with identical shapes
and semantics (reference: collectObservationsSystem src/sim.cpp:448-565,
computeVisibilitySystem src/sim.cpp:567-710, lidarSystem src/sim.cpp:712-759,
tensor shapes src/mgr.cpp:1097-1204 and the named train interface
src/mgr.cpp:1338-1364).

Structure (TPU-shaped): ray *queries* are built per world (vmapped), the
actual raycasts run once per step at batch level through
ops.pallas_rays.raycast_batch (Pallas kernel on TPU), and the *assembly*
functions here consume the hit results. Row conventions preserved exactly:

  * agent_data/vis_agents_mask always have MAX_AGENTS-1 = 5 rows; for each
    agent the rows are the other agent slots in slot order with inactive
    slots zero-padded.
  * box_data has MAX_BOXES = 9 rows (zero past num_active_boxes), ramp_data
    2 rows.
  * All relative poses/velocities are expressed in the observing agent's
    frame with velocity deltas.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import (
    EnvConfig,
    LIDAR_MAX_RANGE,
    MAX_AGENTS,
    NUM_LIDAR_SAMPLES,
    VIS_FOV_DEGREES,
)
from marl_hideandseek_tpu.types import (
    AGENT_HIDER,
    AGENT_SEEKER,
    OWNER_HIDER,
    EnvState,
    body_slot_ranges,
)

_COS_HALF_FOV = float(np.cos(np.deg2rad(VIS_FOV_DEGREES / 2.0)))


def _others_index_matrix(n_agents: int) -> np.ndarray:
    """[A, MAX_AGENTS-1] static gather matrix of 'other' agent slots."""
    rows = []
    for i in range(n_agents):
        row = [j for j in range(MAX_AGENTS) if j != i]
        rows.append(row[: MAX_AGENTS - 1])
    return np.asarray(rows, np.int32)


def num_vis_targets(cfg: EnvConfig) -> int:
    return (MAX_AGENTS - 1) + cfg.max_boxes + cfg.max_ramps


def num_obs_rays(cfg: EnvConfig) -> int:
    """Rays per world for the obs sweep: visibility + lidar."""
    return cfg.max_agents * (num_vis_targets(cfg) + NUM_LIDAR_SAMPLES)


def _vis_targets(cfg: EnvConfig, state: EnvState):
    """Per-agent visibility target slots + validity, [A, T]."""
    n_a = cfg.max_agents
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    others = jnp.asarray(_others_index_matrix(n_a))
    o_in_range = others < n_a
    o_safe = jnp.minimum(others, n_a - 1)
    o_active = state.agent_active[o_safe] & o_in_range

    box_observed = jnp.arange(cfg.max_boxes) < state.num_active_boxes
    ramp_observed = jnp.arange(cfg.max_ramps) < state.num_active_ramps

    tgt_slots = jnp.concatenate([
        agent_lo + o_safe,
        jnp.broadcast_to(jnp.arange(box_lo, box_hi)[None],
                         (n_a, cfg.max_boxes)),
        jnp.broadcast_to(jnp.arange(ramp_lo, ramp_hi)[None],
                         (n_a, cfg.max_ramps)),
    ], axis=1)
    tgt_valid = jnp.concatenate([
        o_active,
        jnp.broadcast_to(box_observed[None], (n_a, cfg.max_boxes)),
        jnp.broadcast_to(ramp_observed[None], (n_a, cfg.max_ramps)),
    ], axis=1)
    return tgt_slots, tgt_valid


def obs_ray_queries(cfg: EnvConfig, state: EnvState):
    """Single-world ray set for the obs sweep.

    Returns (origins [R, 3], dirs [R, 3], max_t [R], exclude [R]) with
    R = A * (16 visibility targets + 30 lidar rays). Visibility dirs are
    unnormalized (t parameterizes the fraction of the distance, range 1 —
    reference: src/sim.cpp:598-604); lidar dirs are unit (range 200).
    """
    n_a = cfg.max_agents
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    bodies = state.bodies
    a_pos = bodies.pos[agent_lo:agent_hi]
    a_quat = bodies.quat[agent_lo:agent_hi]
    a_fwd = math3d.quat_rotate(a_quat, math3d.FWD)
    a_right = math3d.quat_rotate(a_quat, math3d.RIGHT)

    tgt_slots, _ = _vis_targets(cfg, state)
    n_tgt = tgt_slots.shape[1]
    to_tgt = bodies.pos[tgt_slots] - a_pos[:, None]          # [A, T, 3]

    vis_origins = jnp.broadcast_to(a_pos[:, None], (n_a, n_tgt, 3))
    vis_maxt = jnp.ones((n_a, n_tgt))

    idx = jnp.arange(NUM_LIDAR_SAMPLES, dtype=jnp.float32)
    theta = 2.0 * jnp.pi * idx / NUM_LIDAR_SAMPLES + jnp.pi / 2.0
    lidar_dirs = (jnp.cos(theta)[None, :, None] * a_right[:, None] +
                  jnp.sin(theta)[None, :, None] * a_fwd[:, None])
    lidar_dirs = lidar_dirs / jnp.maximum(
        jnp.linalg.norm(lidar_dirs, axis=-1, keepdims=True), 1e-9)
    lidar_origins = jnp.broadcast_to(
        a_pos[:, None], (n_a, NUM_LIDAR_SAMPLES, 3))
    lidar_maxt = jnp.full((n_a, NUM_LIDAR_SAMPLES), LIDAR_MAX_RANGE)

    self_slot = agent_lo + jnp.arange(n_a)
    excl = jnp.broadcast_to(
        self_slot[:, None], (n_a, n_tgt + NUM_LIDAR_SAMPLES))

    origins = jnp.concatenate([vis_origins, lidar_origins], axis=1)
    dirs = jnp.concatenate([to_tgt, lidar_dirs], axis=1)
    maxt = jnp.concatenate([vis_maxt, lidar_maxt], axis=1)
    return (origins.reshape(-1, 3), dirs.reshape(-1, 3),
            maxt.reshape(-1), excl.reshape(-1))


def action_ray_queries(cfg: EnvConfig, state: EnvState):
    """[A] grab/lock interaction rays (reference: src/sim.cpp:285-331)."""
    from marl_hideandseek_tpu.config import INTERACT_RAY_LEN

    n_a = cfg.max_agents
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    a_pos = state.bodies.pos[agent_lo:agent_hi]
    a_quat = state.bodies.quat[agent_lo:agent_hi]
    eye = a_pos + 0.5 * math3d.UP
    fwd = math3d.quat_rotate(a_quat, math3d.FWD)
    maxt = jnp.full((n_a,), INTERACT_RAY_LEN)
    excl = agent_lo + jnp.arange(n_a)
    return eye, fwd, maxt, excl


def consume_obs_sweep(cfg: EnvConfig, state: EnvState,
                      obs_hit_id: jnp.ndarray, obs_hit_t: jnp.ndarray):
    """Turn the obs-sweep ray results into (vis_seen [A, T] f32,
    lidar [A, 30] f32) for one world.

    vis_seen is the final visibility mask value: nearest hit is the target,
    target inside the 135-degree cone, target slot valid, observer active
    (reference: computeVisibilitySystem src/sim.cpp:567-710). lidar is the
    depth with 0 on miss (src/sim.cpp:727-744), zeroed for inactive agents.
    """
    n_a = cfg.max_agents
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    bodies = state.bodies
    a_pos = bodies.pos[agent_lo:agent_hi]
    a_quat = bodies.quat[agent_lo:agent_hi]
    a_fwd = math3d.quat_rotate(a_quat, math3d.FWD)
    a_active = state.agent_active

    tgt_slots, tgt_valid = _vis_targets(cfg, state)
    n_tgt = tgt_slots.shape[1]
    to_tgt = bodies.pos[tgt_slots] - a_pos[:, None]
    dist = jnp.linalg.norm(to_tgt, axis=-1)
    cos_angle = jnp.sum(
        to_tgt * a_fwd[:, None], axis=-1) / jnp.maximum(dist, 1e-9)
    in_cone = cos_angle >= _COS_HALF_FOV

    n_rays_per_agent = n_tgt + NUM_LIDAR_SAMPLES
    hit_id = obs_hit_id.reshape(n_a, n_rays_per_agent)
    hit_t = obs_hit_t.reshape(n_a, n_rays_per_agent)
    vis_hit = hit_id[:, :n_tgt]
    seen = (vis_hit == tgt_slots) & in_cone & tgt_valid & a_active[:, None]

    lidar_hit = hit_id[:, n_tgt:]
    lidar_t = hit_t[:, n_tgt:]
    lidar = jnp.where(lidar_hit >= 0, lidar_t, 0.0)
    lidar = lidar * a_active[:, None].astype(jnp.float32)
    return seen.astype(jnp.float32), lidar


def reward_flag_from_vis(cfg: EnvConfig, state: EnvState,
                         vis_seen: jnp.ndarray) -> jnp.ndarray:
    """Scalar seeker-sees-hider bool from the agent columns of the vis
    sweep (reference: rewardsVisSystem src/sim.cpp:763-804 — the reward
    rays are geometrically the agent-target visibility rays, so the sweep
    is shared instead of retraced)."""
    n_a = cfg.max_agents
    others = jnp.asarray(_others_index_matrix(n_a))
    o_safe = jnp.minimum(others, n_a - 1)
    is_seeker = state.agent_active & (state.agent_type == AGENT_SEEKER)
    col_is_hider = state.agent_type[o_safe] == AGENT_HIDER
    # vis_seen already folds in target-slot validity + both-active masks.
    pair_seen = (vis_seen[:, : MAX_AGENTS - 1] > 0.5) & \
        is_seeker[:, None] & col_is_hider
    return jnp.any(pair_seen)


def _rel_pos_vel_obs(origin, to_frame, origin_vel, origin_omega,
                     pos, quat, vel, omega):
    """computeRelativePosVelObs (reference: src/sim.cpp:401-420)."""
    x = math3d.quat_rotate(to_frame, pos - origin)
    q = math3d.quat_normalize(math3d.quat_mul(to_frame, quat))
    lin = math3d.quat_rotate(to_frame, vel - origin_vel)
    ang = math3d.quat_rotate(to_frame, omega - origin_omega)
    return jnp.concatenate([x, math3d.quat_to_euler(q), lin, ang], axis=-1)


def _lock_obs(locked, owner):
    """computeLockObservation (reference: src/sim.cpp:422-446)."""
    hider_locked = jnp.where(locked & (owner == OWNER_HIDER), 1.0, 0.0)
    seeker_locked = jnp.where(locked & (owner != OWNER_HIDER), 1.0, 0.0)
    return jnp.stack([hider_locked, seeker_locked], axis=-1)


def build_observations(cfg: EnvConfig, state: EnvState,
                       vis_seen: jnp.ndarray, lidar: jnp.ndarray):
    """All observation tensors for one world, given the consumed sweep
    results (vis_seen [A, T] f32 from consume_obs_sweep, lidar [A, 30])."""
    n_a = cfg.max_agents
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    bodies = state.bodies

    a_pos = bodies.pos[agent_lo:agent_hi]       # [A, 3]
    a_quat = bodies.quat[agent_lo:agent_hi]
    a_vel = bodies.vel[agent_lo:agent_hi]
    a_omega = bodies.omega[agent_lo:agent_hi]
    a_active = state.agent_active               # [A] bool
    to_frame = math3d.quat_inv(a_quat)          # [A, 4]
    is_grabbing = (state.grab.target >= 0).astype(jnp.float32)  # [A]

    act_f = a_active[:, None].astype(jnp.float32)

    # ---- prep counter (freezes at 0 after the prep phase;
    # reference: src/sim.cpp:461-464) --------------------------------------
    prep = jnp.maximum(cfg.num_prep_steps - state.step, 0)
    prep_counter = jnp.broadcast_to(prep[None, None], (n_a, 1)).astype(
        jnp.int32)

    # ---- self observation (13 floats; reference: src/sim.cpp:471-483) ----
    self_data = jnp.concatenate([
        a_pos,
        math3d.quat_to_euler(a_quat),
        math3d.quat_rotate(to_frame, a_vel),
        math3d.quat_rotate(to_frame, a_omega),
        is_grabbing[:, None],
    ], axis=-1) * act_f

    self_type = state.agent_type[:, None].astype(jnp.int32)
    self_mask = act_f

    # ---- relative box obs [A, 9, 17] -------------------------------------
    b_pos = bodies.pos[box_lo:box_hi]
    b_quat = bodies.quat[box_lo:box_hi]
    b_vel = bodies.vel[box_lo:box_hi]
    b_omega = bodies.omega[box_lo:box_hi]
    box_observed = jnp.arange(cfg.max_boxes) < state.num_active_boxes

    box_posvel = _rel_pos_vel_obs(
        a_pos[:, None], to_frame[:, None], a_vel[:, None], a_omega[:, None],
        b_pos[None], b_quat[None], b_vel[None], b_omega[None])  # [A, 9, 12]
    box_size = 2.0 * bodies.half_ext[box_lo:box_hi]
    box_lock = _lock_obs(bodies.locked[box_lo:box_hi],
                         bodies.owner[box_lo:box_hi])
    box_data = jnp.concatenate([
        box_posvel,
        jnp.broadcast_to(box_size[None], (n_a, cfg.max_boxes, 3)),
        jnp.broadcast_to(box_lock[None], (n_a, cfg.max_boxes, 2)),
    ], axis=-1)
    box_data = box_data * box_observed[None, :, None] * act_f[:, :, None]

    # ---- relative ramp obs [A, 2, 14] ------------------------------------
    r_pos = bodies.pos[ramp_lo:ramp_hi]
    r_quat = bodies.quat[ramp_lo:ramp_hi]
    r_vel = bodies.vel[ramp_lo:ramp_hi]
    r_omega = bodies.omega[ramp_lo:ramp_hi]
    ramp_observed = jnp.arange(cfg.max_ramps) < state.num_active_ramps

    ramp_posvel = _rel_pos_vel_obs(
        a_pos[:, None], to_frame[:, None], a_vel[:, None], a_omega[:, None],
        r_pos[None], r_quat[None], r_vel[None], r_omega[None])
    ramp_lock = _lock_obs(bodies.locked[ramp_lo:ramp_hi],
                          bodies.owner[ramp_lo:ramp_hi])
    ramp_data = jnp.concatenate([
        ramp_posvel,
        jnp.broadcast_to(ramp_lock[None], (n_a, cfg.max_ramps, 2)),
    ], axis=-1)
    ramp_data = ramp_data * ramp_observed[None, :, None] * act_f[:, :, None]

    # ---- relative agent obs [A, 5, 14] -----------------------------------
    others = jnp.asarray(_others_index_matrix(n_a))     # [A, 5]
    o_in_range = others < n_a
    o_safe = jnp.minimum(others, n_a - 1)
    o_active = a_active[o_safe] & o_in_range            # [A, 5]

    agent_posvel = _rel_pos_vel_obs(
        a_pos[:, None], to_frame[:, None], a_vel[:, None], a_omega[:, None],
        a_pos[o_safe], a_quat[o_safe], a_vel[o_safe], a_omega[o_safe])
    o_is_hider = (state.agent_type[o_safe] == AGENT_HIDER).astype(jnp.float32)
    o_grabbing = is_grabbing[o_safe]
    agent_data = jnp.concatenate([
        agent_posvel, o_is_hider[..., None], o_grabbing[..., None]],
        axis=-1)
    agent_data = agent_data * o_active[..., None] * act_f[:, :, None]

    # ---- visibility masks (consumed sweep results) -----------------------
    seen_f = vis_seen
    vis_agents = seen_f[:, : MAX_AGENTS - 1, None]
    vis_boxes = seen_f[:, MAX_AGENTS - 1: MAX_AGENTS - 1 + cfg.max_boxes,
                       None]
    vis_ramps = seen_f[:, MAX_AGENTS - 1 + cfg.max_boxes:, None]

    return {
        "prep_counter": prep_counter,
        "self_data": self_data,
        "self_type": self_type,
        "self_mask": self_mask,
        "self_lidar": lidar,
        "agent_data": agent_data,
        "box_data": box_data,
        "ramp_data": ramp_data,
        "vis_agents_mask": vis_agents,
        "vis_boxes_mask": vis_boxes,
        "vis_ramps_mask": vis_ramps,
    }


def global_debug_positions(cfg: EnvConfig, state: EnvState) -> jnp.ndarray:
    """[maxBoxes+maxRamps+maxAgents, 2] xy positions
    (reference: globalPositionsDebugSystem src/sim.cpp:895-941)."""
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    b = state.bodies
    box_xy = b.pos[box_lo:box_hi, :2] * (
        jnp.arange(cfg.max_boxes) < state.num_active_boxes)[:, None]
    ramp_xy = b.pos[ramp_lo:ramp_hi, :2] * (
        jnp.arange(cfg.max_ramps) < state.num_active_ramps)[:, None]
    agent_xy = b.pos[agent_lo:agent_hi, :2] * \
        state.agent_active[:, None]
    out = jnp.concatenate([box_xy, ramp_xy, agent_xy], axis=0)
    pad = (cfg.max_boxes + cfg.max_ramps + MAX_AGENTS) - out.shape[0]
    if pad > 0:
        out = jnp.concatenate([out, jnp.zeros((pad, 2))], axis=0)
    return out
