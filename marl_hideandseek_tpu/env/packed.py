"""Worlds-minor ("packed") environment step: the TPU hot path.

Why this exists: the classic `EnvState` layout puts worlds on the LEADING
axis, so per-body fields are `[W, B, 3]`-shaped. TPU tiles the two minor
dims of every materialized array to (8 sublanes, 128 lanes), so a
`[16384, 17, 3]` f32 buffer pads 17->24 and 3->128: ~60x the logical bytes.
Every XLA phase of the step (movement, grab/lock, rewards, obs assembly)
then pays that padding in HBM traffic, and the Pallas kernels pay
worlds-minor transposes on entry/exit. Profiled at 16K worlds this glue was
~6 ms of the ~16 ms step (scripts/profile_break.py).

The packed representation stores the SAME pytree with every leaf's world
axis moved LAST (`[B, 3, W]`, `[A, W]`, ...): W is a multiple of 128, so
every buffer tiles perfectly, and the fused physics+sweep kernel
(ops/pallas_step.py) consumes/produces it natively with no transposes.

`step_packed` mirrors `HideAndSeekEnv.step` exactly (same reference
semantics, reference: src/sim.cpp:1140-1293) but in component form. Reset
steps unpack to the classic layout, reuse the classic regeneration paths,
and repack — amortized over the 240-step episode. Observations are emitted
with FLATTENED feature dims (box_data `[W, A, 153]` instead of
`[W, A, 9, 17]`) so the minor-dim padding stays ~2x instead of ~13x;
`reference_obs` restores the reference's exported shapes
(src/mgr.cpp:1097-1204) as views.

Equivalence with the classic path is pinned by tests/test_packed.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.config import (
    EnvConfig,
    NUM_LIDAR_SAMPLES,
    NUM_PREP_STEPS,
    MAX_AGENTS,
    OOB_LIMIT,
    OOB_PENALTY,
)
from marl_hideandseek_tpu.env.env import (
    HideAndSeekEnv,
    SweepResults,
    _DEFAULT_BUCKETS,
    _DEFAULT_F_MAX,
    _DEFAULT_T_MAX,
    _INSTANT_BUCKETS,
    _INSTANT_F_MAX,
    _INSTANT_T_MAX,
    _regen_world,
)
from marl_hideandseek_tpu.env import observations
from marl_hideandseek_tpu.env.observations import _others_index_matrix
from marl_hideandseek_tpu.ops import pallas_rays
from marl_hideandseek_tpu.ops import pallas_step
from marl_hideandseek_tpu.ops.pallas_physics import (
    _qmul,
    _qconj,
    _qnorm,
    _qrot,
)
from marl_hideandseek_tpu.types import (
    AGENT_HIDER,
    AGENT_SEEKER,
    OWNER_HIDER,
    OWNER_NONE,
    OWNER_SEEKER,
    EnvState,
    body_slot_ranges,
)


def pack_state(state: EnvState) -> EnvState:
    """Move every leaf's worlds axis (axis 0) to the end."""
    return jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), state)


def unpack_state(pstate: EnvState) -> EnvState:
    return jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), pstate)


def pack_actions(actions: jnp.ndarray) -> jnp.ndarray:
    """[W, A, 5] -> [A, 5, W]."""
    return jnp.moveaxis(actions, 0, -1)


class PackedStepResult(NamedTuple):
    obs: dict                      # flat-feature dict, leaves [W, A, F]
    rewards: jnp.ndarray           # [A, W] f32
    dones: jnp.ndarray             # [A, W] i32
    episode_results: jnp.ndarray   # [2, W] f32
    # Hider-team reward of THIS transition, captured before any reset
    # regeneration overwrites the state copy (+1 hidden / -1 seen;
    # reference: src/sim.cpp:763-804). Zero only from init().
    team_reward: jnp.ndarray = None  # [W] f32


# ---------------------------------------------------------------------------
# Component-form step phases
# ---------------------------------------------------------------------------


def _movement_packed(cfg: EnvConfig, ps: EnvState, actions):
    """Packed movementSystem (reference: src/sim.cpp:202-254).

    actions [A, 5, W] i32 -> (ext_force [B, 3, W], ext_torque [B, 3, W]).
    """
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_body = cfg.num_dyn_bodies
    w = ps.step.shape[0]

    if cfg.zero_agent_velocity:
        half = _INSTANT_BUCKETS // 2
        f_per = _INSTANT_F_MAX / half
        t_per = _INSTANT_T_MAX / half
    else:
        half = _DEFAULT_BUCKETS // 2
        f_per = _DEFAULT_F_MAX / half
        t_per = _DEFAULT_T_MAX / half

    q = tuple(ps.bodies.quat[agent_lo:agent_hi, k] for k in range(4))
    fx_l = f_per * (actions[:, 0] - half).astype(jnp.float32)  # [A, W]
    fy_l = f_per * (actions[:, 1] - half).astype(jnp.float32)
    t_z = t_per * (actions[:, 2] - half).astype(jnp.float32)
    zero = jnp.zeros_like(fx_l)

    seeker_frozen = (ps.agent_type == AGENT_SEEKER) & \
        (ps.step[None, :] < NUM_PREP_STEPS - 1)
    gate = (ps.agent_active & ~seeker_frozen).astype(jnp.float32)

    fw = _qrot(q, (fx_l, fy_l, zero))
    force_a = jnp.stack([c * gate for c in fw], axis=1)        # [A, 3, W]
    torque_a = jnp.stack([zero, zero, t_z * gate], axis=1)

    ext_force = jnp.zeros((n_body, 3, w)).at[agent_lo:agent_hi].set(force_a)
    ext_torque = jnp.zeros((n_body, 3, w)).at[agent_lo:agent_hi].set(
        torque_a)
    return ext_force, ext_torque


def _action_system_packed(cfg: EnvConfig, ps: EnvState, actions,
                          hit_t, hit_id) -> EnvState:
    """Packed grab/lock logic (reference: actionSystem src/sim.cpp:270-370).

    Mirrors env._action_system; hit_t/hit_id are [A, W].
    """
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    n_body = cfg.num_dyn_bodies
    bodies = ps.bodies

    a_pos = tuple(bodies.pos[agent_lo:agent_hi, k] for k in range(3))
    a_quat = tuple(bodies.quat[agent_lo:agent_hi, k] for k in range(4))
    eye = (a_pos[0], a_pos[1], a_pos[2] + 0.5)
    one = jnp.ones_like(a_pos[0])
    zero = jnp.zeros_like(a_pos[0])
    fwd = _qrot(a_quat, (zero, one, zero))

    seeker_frozen = (ps.agent_type == AGENT_SEEKER) & \
        (ps.step[None, :] < NUM_PREP_STEPS - 1)
    can_act = ps.agent_active & ~seeker_frozen

    want_lock = (actions[:, 4] == 1) & can_act
    want_grab = (actions[:, 3] == 1) & can_act

    is_obj = (hit_id >= box_lo) & (hit_id < ramp_hi)
    tgt = jnp.where(is_obj, hit_id, 0)

    # One-hot [A, B, W] routing (dynamic gathers/scatters are serial loops
    # on TPU; see the classic path's comment).
    onehot = tgt[:, None, :] == jnp.arange(n_body)[None, :, None]
    oh_f = onehot.astype(jnp.float32)
    t_locked = jnp.any(onehot & bodies.locked[None], axis=1)   # [A, W]
    t_owner = jnp.sum(
        oh_f * bodies.owner[None].astype(jnp.float32), axis=1
    ).astype(jnp.int32)

    # ---- lock toggle -----------------------------------------------------
    my_team_owner = jnp.where(
        ps.agent_type == AGENT_HIDER, OWNER_HIDER, OWNER_SEEKER)

    do_unlock = want_lock & is_obj & t_locked & (t_owner == my_team_owner)
    do_lock = want_lock & is_obj & ~t_locked & (t_owner == OWNER_NONE)

    locked_any = jnp.any(onehot & do_lock[:, None], axis=0)    # [B, W]
    unlocked_any = jnp.any(onehot & do_unlock[:, None], axis=0)
    lock_team = jnp.max(
        jnp.where(onehot & do_lock[:, None], my_team_owner[:, None], 0),
        axis=0)

    locked = jnp.where(locked_any, True,
                       jnp.where(unlocked_any, False, bodies.locked))
    owner = jnp.where(locked_any, lock_team,
                      jnp.where(unlocked_any, OWNER_NONE, bodies.owner))

    # ---- grab toggle -----------------------------------------------------
    has_grab = ps.grab.target >= 0
    release = want_grab & has_grab

    grabbable = is_obj & ~t_locked & (t_owner == OWNER_NONE)
    acquire = want_grab & ~has_grab & grabbable

    safe_t = jnp.where(is_obj, hit_t, 0.0)
    hit_pos = tuple(e + f * safe_t for e, f in zip(eye, fwd))
    t_pos = tuple(
        jnp.sum(oh_f * bodies.pos[None, :, k], axis=1) for k in range(3))
    t_quat = tuple(
        jnp.sum(oh_f * bodies.quat[None, :, k], axis=1) for k in range(4))
    rel = tuple(h - p for h, p in zip(hit_pos, t_pos))
    r2_new = _qrot(t_quat, rel, inv=True)
    rel_q_new = _qnorm(_qmul(_qconj(t_quat), a_quat))
    sep_new = safe_t - 1.25

    g = ps.grab
    new_target = jnp.where(release, -1, jnp.where(acquire, tgt, g.target))
    acq = acquire[:, None, :]
    new_r2 = jnp.where(acq, jnp.stack(r2_new, axis=1), g.r2)
    new_rel_q = jnp.where(acq, jnp.stack(rel_q_new, axis=1), g.rel_q)
    new_sep = jnp.where(acquire, sep_new, g.sep)

    return ps.replace(
        bodies=bodies.replace(locked=locked, owner=owner),
        grab=g.replace(target=new_target.astype(jnp.int32), r2=new_r2,
                       rel_q=new_rel_q, sep=new_sep),
    )


def _zero_agent_velocities_packed(cfg: EnvConfig, ps: EnvState) -> EnvState:
    """agentZeroVelSystem (reference: src/sim.cpp:256-268)."""
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    b = ps.bodies
    a_vel = b.vel[agent_lo:agent_hi]                  # [A, 3, W]
    a_vel = jnp.stack([
        jnp.zeros_like(a_vel[:, 0]),
        jnp.zeros_like(a_vel[:, 1]),
        jnp.minimum(a_vel[:, 2], 0.0),
    ], axis=1)
    vel = b.vel.at[agent_lo:agent_hi].set(a_vel)
    omega = b.omega.at[agent_lo:agent_hi].set(0.0)
    return ps.replace(bodies=b.replace(vel=vel, omega=omega))


def _rewards_dones_packed(cfg: EnvConfig, ps: EnvState, team_r):
    """outputRewardsDonesSystem (reference: src/sim.cpp:806-841).

    team_r [W] -> (rewards [A, W], dones [A, W])."""
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    cur = ps.step                                          # [W]

    sign = jnp.where(ps.agent_type == AGENT_SEEKER, -1.0, 1.0)   # [A, W]
    reward = sign * team_r[None, :]

    px = ps.bodies.pos[agent_lo:agent_hi, 0]               # [A, W]
    py = ps.bodies.pos[agent_lo:agent_hi, 1]
    oob = (jnp.abs(px) >= OOB_LIMIT) | (jnp.abs(py) >= OOB_LIMIT)
    reward = reward - OOB_PENALTY * oob.astype(jnp.float32)

    in_prep = cur < NUM_PREP_STEPS - 1
    reward = jnp.where(in_prep[None, :], 0.0, reward)
    reward = reward * ps.agent_active.astype(jnp.float32)

    done = jnp.broadcast_to(
        (cur == cfg.episode_len - 1)[None, :], reward.shape).astype(
            jnp.int32)
    return reward, done


def _episode_results_packed(cfg: EnvConfig, ps: EnvState,
                            team_r) -> EnvState:
    """updateEpisodeResultsSystem (reference: src/sim.cpp:843-893)."""
    cur = ps.step
    scores = jnp.where(cur[None, :] == 0, 0, ps.running_scores)   # [2, W]
    finished = jnp.where(cur[None, :] == 0, 0.0, ps.finished_scores)

    hiders_hidden = team_r > 0.0
    hid_idx = jnp.where(ps.seekers_first, 1, 0)            # [W]
    winner = jnp.where(hiders_hidden, hid_idx, 1 - hid_idx)
    in_seek = cur >= NUM_PREP_STEPS
    inc = (jnp.arange(2)[:, None] == winner[None, :]) & in_seek[None, :]
    scores = scores + inc.astype(jnp.int32)

    at_end = cur == cfg.episode_len - 1
    s0, s1 = scores[0], scores[1]
    final = jnp.where(
        s0 > s1, jnp.array([1.0, 0.0])[:, None],
        jnp.where(s0 < s1, jnp.array([0.0, 1.0])[:, None],
                  jnp.array([0.5, 0.5])[:, None]))
    finished = jnp.where(at_end[None, :], final, finished)
    return ps.replace(running_scores=scores, finished_scores=finished)


# ---------------------------------------------------------------------------
# Packed observation assembly (flat feature dims)
# ---------------------------------------------------------------------------


def _euler_packed(q):
    """quatToEuler in component form (reference: src/sim.cpp:372-399)."""
    w, x, y, z = q
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (w * y - z * x)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)))

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def _rel_posvel_packed(a_pos, a_inv_q, a_vel, a_omega,
                       e_pos, e_quat, e_vel, e_omega):
    """computeRelativePosVelObs (reference: src/sim.cpp:401-420) in
    component form; observer comps [A, 1, W], entity comps [1, E, W] (or
    broadcast-compatible). Returns a list of 12 [A, E, W] features."""
    rel = tuple(e - a for e, a in zip(e_pos, a_pos))
    x = _qrot(a_inv_q, rel)
    q = _qnorm(_qmul(a_inv_q, e_quat))
    eul = _euler_packed(q)
    lin = _qrot(a_inv_q, tuple(e - a for e, a in zip(e_vel, a_vel)))
    ang = _qrot(a_inv_q, tuple(e - a for e, a in zip(e_omega, a_omega)))
    return list(x) + list(eul) + list(lin) + list(ang)


def _lock_obs_packed(locked, owner):
    """computeLockObservation (reference: src/sim.cpp:422-446)."""
    lk = locked.astype(jnp.float32)
    hider_locked = lk * (owner == OWNER_HIDER)
    seeker_locked = lk * (owner != OWNER_HIDER)
    return [hider_locked, seeker_locked]


def build_observations_packed(cfg: EnvConfig, ps: EnvState,
                              vis_seen, lidar):
    """Flat-feature observation dict from packed state.

    vis_seen [A, T, W] f32, lidar [A, 30, W] f32 (the packed sweep
    outputs). Returns dict with leaves [W, A, F] where F is the flattened
    per-entity feature count (see module docstring). Semantics identical
    to observations.build_observations.
    """
    n_a = cfg.max_agents
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    b = ps.bodies
    w = ps.step.shape[0]

    def comps(arr, lo, hi, n):
        return tuple(arr[lo:hi, k] for k in range(n))      # n x [E, W]

    a_pos = comps(b.pos, agent_lo, agent_hi, 3)
    a_quat = comps(b.quat, agent_lo, agent_hi, 4)
    a_vel = comps(b.vel, agent_lo, agent_hi, 3)
    a_omega = comps(b.omega, agent_lo, agent_hi, 3)
    a_inv_q = _qconj(a_quat)
    act_f = ps.agent_active.astype(jnp.float32)            # [A, W]
    is_grabbing = (ps.grab.target >= 0).astype(jnp.float32)

    def to_wa(feats, axis=1):
        """List of [A, W] (axis=1) or [A, E, W] (axis=2) features ->
        [W, A, F] / [W, A, E*F]."""
        st = jnp.stack(feats, axis=axis)
        if st.ndim == 4:                                   # [A, E, F, W]
            st = st.reshape(st.shape[0], -1, st.shape[3])
        return jnp.moveaxis(st, -1, 0)

    # ---- prep counter ----------------------------------------------------
    prep = jnp.maximum(cfg.num_prep_steps - ps.step, 0).astype(jnp.int32)
    prep_counter = jnp.broadcast_to(prep[:, None, None], (w, n_a, 1))

    # ---- self observation (13f) ------------------------------------------
    vel_l = _qrot(a_inv_q, a_vel)
    om_l = _qrot(a_inv_q, a_omega)
    self_feats = (list(a_pos) + list(_euler_packed(a_quat)) + list(vel_l) +
                  list(om_l) + [is_grabbing])
    self_data = to_wa([f * act_f for f in self_feats])

    self_type = jnp.moveaxis(ps.agent_type[:, None], -1, 0)  # [W, A, 1]
    self_mask = jnp.moveaxis(act_f[:, None], -1, 0)

    # ---- boxes [W, A, 9*17] ----------------------------------------------
    def exp_a(c):
        return tuple(x[:, None] for x in c)                # [A, 1, W]

    def exp_e(c):
        return tuple(x[None] for x in c)                   # [1, E, W]

    b_pos = comps(b.pos, box_lo, box_hi, 3)
    b_quat = comps(b.quat, box_lo, box_hi, 4)
    b_vel = comps(b.vel, box_lo, box_hi, 3)
    b_om = comps(b.omega, box_lo, box_hi, 3)
    box_feats = _rel_posvel_packed(
        exp_a(a_pos), exp_a(a_inv_q), exp_a(a_vel), exp_a(a_omega),
        exp_e(b_pos), exp_e(b_quat), exp_e(b_vel), exp_e(b_om))
    box_size = [jnp.broadcast_to(2.0 * b.half_ext[box_lo:box_hi, k][None],
                                 box_feats[0].shape) for k in range(3)]
    box_lock = [jnp.broadcast_to(f[None], box_feats[0].shape)
                for f in _lock_obs_packed(b.locked[box_lo:box_hi],
                                          b.owner[box_lo:box_hi])]
    box_observed = (jnp.arange(cfg.max_boxes)[:, None] <
                    ps.num_active_boxes[None, :])          # [9, W]
    box_gate = (box_observed[None, :, :].astype(jnp.float32) *
                act_f[:, None, :])
    box_data = to_wa([f * box_gate for f in
                      box_feats + box_size + box_lock], axis=2)

    # ---- ramps [W, A, 2*14] ----------------------------------------------
    r_pos = comps(b.pos, ramp_lo, ramp_hi, 3)
    r_quat = comps(b.quat, ramp_lo, ramp_hi, 4)
    r_vel = comps(b.vel, ramp_lo, ramp_hi, 3)
    r_om = comps(b.omega, ramp_lo, ramp_hi, 3)
    ramp_feats = _rel_posvel_packed(
        exp_a(a_pos), exp_a(a_inv_q), exp_a(a_vel), exp_a(a_omega),
        exp_e(r_pos), exp_e(r_quat), exp_e(r_vel), exp_e(r_om))
    ramp_lock = [jnp.broadcast_to(f[None], ramp_feats[0].shape)
                 for f in _lock_obs_packed(b.locked[ramp_lo:ramp_hi],
                                           b.owner[ramp_lo:ramp_hi])]
    ramp_observed = (jnp.arange(cfg.max_ramps)[:, None] <
                     ps.num_active_ramps[None, :])
    ramp_gate = (ramp_observed[None].astype(jnp.float32) *
                 act_f[:, None, :])
    ramp_data = to_wa([f * ramp_gate for f in ramp_feats + ramp_lock],
                      axis=2)

    # ---- other agents [W, A, 5*14] ---------------------------------------
    others = _others_index_matrix(n_a)                     # np [A, 5]
    o_in_range = others < n_a
    o_safe = np.minimum(others, n_a - 1)

    def gather_o(c):
        return tuple(x[o_safe] for x in c)                 # [A, 5, W]

    o_active = (ps.agent_active[o_safe] &
                jnp.asarray(o_in_range)[:, :, None])       # [A, 5, W]
    ag_feats = _rel_posvel_packed(
        exp_a(a_pos), exp_a(a_inv_q), exp_a(a_vel), exp_a(a_omega),
        gather_o(a_pos), gather_o(a_quat), gather_o(a_vel),
        gather_o(a_omega))
    o_is_hider = (ps.agent_type[o_safe] == AGENT_HIDER).astype(jnp.float32)
    o_grabbing = is_grabbing[o_safe]
    ag_gate = o_active.astype(jnp.float32) * act_f[:, None, :]
    agent_data = to_wa(
        [f * ag_gate for f in ag_feats + [o_is_hider, o_grabbing]], axis=2)

    # ---- visibility masks + lidar ----------------------------------------
    t_agents = MAX_AGENTS - 1
    vis_agents = jnp.moveaxis(vis_seen[:, :t_agents], -1, 0)
    vis_boxes = jnp.moveaxis(
        vis_seen[:, t_agents:t_agents + cfg.max_boxes], -1, 0)
    vis_ramps = jnp.moveaxis(
        vis_seen[:, t_agents + cfg.max_boxes:], -1, 0)
    self_lidar = jnp.moveaxis(lidar, -1, 0)

    return {
        "prep_counter": prep_counter,
        "self_data": self_data,
        "self_type": self_type,
        "self_mask": self_mask,
        "self_lidar": self_lidar,
        "agent_data": agent_data,
        "box_data": box_data,
        "ramp_data": ramp_data,
        "vis_agents_mask": vis_agents,
        "vis_boxes_mask": vis_boxes,
        "vis_ramps_mask": vis_ramps,
    }


def standalone_sweep_packed(cfg: EnvConfig, ps: EnvState) -> SweepResults:
    """The per-step ray sweep on PACKED state (worlds-minor), used by the
    packed reset branch. Twin of HideAndSeekEnv._standalone_sweep, but
    with every vmap over the TRAILING axis so no state leaf is ever
    transposed: a world-major branch inside PackedEnv.step forces XLA to
    keep two layouts of the whole state and convert between them with
    ~108 MB of copies on EVERY step (taken or not; measured ~1.5 ms at
    16K worlds)."""
    obs_q = jax.vmap(
        functools.partial(observations.obs_ray_queries, cfg),
        in_axes=-1, out_axes=-1)(ps)
    obs_t, obs_id = pallas_rays.raycast_batch_packed(cfg, ps, *obs_q)
    vis_seen, lidar = jax.vmap(
        functools.partial(observations.consume_obs_sweep, cfg),
        in_axes=-1, out_axes=-1)(ps, obs_id, obs_t)
    act_q = jax.vmap(
        functools.partial(observations.action_ray_queries, cfg),
        in_axes=-1, out_axes=-1)(ps)
    act_t, act_id = pallas_rays.raycast_batch_packed(cfg, ps, *act_q)
    rew_seen = jax.vmap(
        functools.partial(observations.reward_flag_from_vis, cfg),
        in_axes=-1, out_axes=-1)(ps, vis_seen)
    return SweepResults(vis_seen=vis_seen, lidar=lidar, act_t=act_t,
                        act_id=act_id, rew_seen=rew_seen)


def reference_obs(cfg: EnvConfig, obs: dict) -> dict:
    """Reshape the flat-feature dict back to the reference's exported
    tensor shapes (src/mgr.cpp:1097-1204)."""
    w, n_a = obs["self_data"].shape[:2]
    return {
        **obs,
        "agent_data": obs["agent_data"].reshape(w, n_a, MAX_AGENTS - 1, 14),
        "box_data": obs["box_data"].reshape(w, n_a, cfg.max_boxes, 17),
        "ramp_data": obs["ramp_data"].reshape(w, n_a, cfg.max_ramps, 14),
        "vis_agents_mask": obs["vis_agents_mask"][..., None],
        "vis_boxes_mask": obs["vis_boxes_mask"][..., None],
        "vis_ramps_mask": obs["vis_ramps_mask"][..., None],
    }


# ---------------------------------------------------------------------------
# The packed step
# ---------------------------------------------------------------------------


class PackedEnv:
    """Worlds-minor twin of HideAndSeekEnv for the hot loops.

    init/step produce packed state + PackedStepResult; `classic` (the
    wrapped HideAndSeekEnv) remains the semantic reference and handles
    level regeneration on reset steps.
    """

    def __init__(self, cfg: EnvConfig, force_fallback: bool = False):
        self.cfg = cfg
        self.classic = HideAndSeekEnv(cfg)
        # force_fallback pins the XLA glue + jnp physics path even on a
        # TPU host (used by the on-TPU A/B verifier to compute the
        # reference trajectory on the CPU backend in the same process).
        self.force_fallback = force_fallback

    def init(self, key):
        state, _ = self.classic.init(key)
        ps = pack_state(state)
        sweep = self._sweep_via_classic(state)
        return ps, self._result(ps, sweep, None, None)

    def step(self, ps: EnvState, actions: jnp.ndarray,
             resets: Optional[jnp.ndarray] = None, base_key=None,
             world_ids: Optional[jnp.ndarray] = None
             ) -> Tuple[EnvState, PackedStepResult]:
        """One packed step. actions [A, 5, W] i32; resets [W] i32.

        world_ids [W] u32: global world indices used to seed episode
        draws on reset. Defaults to arange(W); pass the global ids when
        this step runs on a SHARD of the world batch (shard_map /
        multi-host) so episode RNG streams stay distinct across shards
        (parallel/mesh.make_sharded_packed_step does this)."""
        cfg = self.cfg
        w = ps.step.shape[0]
        if resets is None:
            resets = jnp.zeros((w,), jnp.int32)
        if base_key is None:
            base_key = jax.random.PRNGKey(cfg.rand_seed)
        if world_ids is None:
            world_ids = jnp.arange(w, dtype=jnp.uint32)
        actions = actions.astype(jnp.int32)

        if not self.force_fallback and \
                jax.devices()[0].platform == "tpu" and \
                w % pallas_step.LANE == 0:
            # 1-3 fused: movement, grab/lock, physics, sweep, zero-vel,
            # rewards/dones and episode scores in ONE Pallas launch
            # (ops/pallas_step.megastep_packed).
            ps, sweep, rewards, dones, team_r = \
                pallas_step.megastep_packed(cfg, ps, actions)
        else:
            # Fallback (CPU/tests): the same phases as XLA glue around
            # the jnp physics/sweep — the megastep's semantic reference.
            # 1. Movement + grab/lock on the carried interaction-ray hits.
            ext_force, ext_torque = _movement_packed(cfg, ps, actions)
            ps = _action_system_packed(cfg, ps, actions, ps.act_hit_t,
                                       ps.act_hit_id)

            # 2. Physics + fused ray sweep (no transposes: state is
            #    already worlds-minor).
            ps, sweep = self._physics_and_sweep(ps, ext_force, ext_torque)
            if cfg.zero_agent_velocity:
                ps = _zero_agent_velocities_packed(cfg, ps)

            # 3. Rewards / dones / episode results.
            team_r = jnp.where(sweep.rew_seen, -1.0, 1.0)      # [W]
            ps = ps.replace(hider_team_reward=team_r)
            rewards, dones = _rewards_dones_packed(cfg, ps, team_r)
            ps = _episode_results_packed(cfg, ps, team_r)

        # 4. Conditional resets, packed-native: the regeneration paths
        #    (full or compact, mirroring HideAndSeekEnv._apply_resets)
        #    run with every vmap over the TRAILING axis, so no state leaf
        #    is ever transposed. A world-major (unpack/repack) branch
        #    here forced XLA to keep two layouts of the whole state and
        #    convert between them with ~108 MB of copies on EVERY step,
        #    taken or not (~1.5 ms at 16K worlds).
        auto = jnp.zeros((w,), bool)
        if not cfg.ignore_episode_length:
            auto = ps.step == cfg.episode_len - 1
        trigger = (resets != 0) | auto
        level_ids = jnp.where(resets != 0, resets, 1).astype(jnp.int32)

        def advance(p):
            return p.replace(step=p.step + 1)

        def regen_packed(world_ids, sub, lv):
            """Per-world regeneration, worlds on the trailing axis."""
            return jax.vmap(
                lambda wid, s, l: _regen_world(cfg, base_key, wid, s, l),
                in_axes=(0, -1, 0), out_axes=-1)(world_ids, sub, lv)

        def full_resets(p):
            regen = regen_packed(world_ids, p, level_ids)
            adv = advance(p)
            new_p = jax.tree.map(
                lambda new, old: jnp.where(
                    trigger.reshape((1,) * (new.ndim - 1) + (-1,)),
                    new, old),
                regen, adv)
            # Observations must describe the post-reset worlds: re-sweep.
            return new_p, standalone_sweep_packed(cfg, new_p)

        def compact_resets(p):
            """Regenerate ONLY the (<= reset_budget) resetting worlds
            (same index/tie semantics as the classic path,
            env/env.py::compact_resets).

            Layout discipline: lane-axis gathers/scatters on the big f32
            state leaves make XLA assign them a second layout and convert
            with ~MBs of copies on EVERY step (taken or not; measured
            ~1.5 ms at 16K worlds). So (a) the regen input gathers only
            the three small leaves _regen_world actually reads, and (b)
            the merge-back writes float leaves as old*(1-m) + new @ 1hot
            — an MXU matmul against an exact {0,1} matrix (bit-exact
            selection even through the bf16-pass f32 matmul: 1.0 and 0.0
            are exact in every pass) — keeping every big leaf on the
            elementwise/matmul path. Small integer leaves still scatter
            (their conversion copies are negligible)."""
            k = cfg.reset_budget
            w_idx = jnp.arange(w, dtype=jnp.int32)
            score = jnp.where(trigger, w - w_idx, jnp.int32(0))
            top_score, idx = jax.lax.top_k(score, k)
            idx = jnp.where(top_score > 0, idx, idx[0])

            # _regen_world builds everything fresh except the episode
            # counter and the carried score singletons.
            carrier = jax.tree.map(
                lambda x: jnp.zeros(x.shape[:-1] + (k,), x.dtype), p)
            carrier = carrier.replace(
                episode_counter=jnp.take(p.episode_counter, idx, axis=-1),
                finished_scores=jnp.take(p.finished_scores, idx, axis=-1),
                running_scores=jnp.take(p.running_scores, idx, axis=-1))
            regen = regen_packed(world_ids[idx], carrier, level_ids[idx])
            sub_sweep = standalone_sweep_packed(cfg, regen)

            # First-occurrence one-hot: padding entries duplicate the
            # first triggered world; only its first column may write.
            first = (jnp.argmax(idx[:, None] == idx[None, :], axis=1) ==
                     jnp.arange(k))
            ohs = ((idx[:, None] == w_idx[None, :]) &
                   first[:, None]).astype(jnp.float32)        # [k, W]
            member = jnp.sum(ohs, axis=0)                     # [W] 0/1

            def merge(old, new):
                if jnp.issubdtype(old.dtype, jnp.floating):
                    r = 1
                    for d in old.shape[:-1]:
                        r *= d
                    fo = old.reshape((r, w))
                    fn_ = new.astype(old.dtype).reshape((r, k))
                    # +inf sentinels (ray-miss t) would contaminate the
                    # whole row through inf*0=NaN: select on the finite
                    # part and restore +inf where the source was inf.
                    # CONTRACT: state float leaves hold only finite
                    # values and +inf sentinels (pinned by
                    # tests/test_packed.py::test_regen_float_leaves_
                    # finite_or_posinf). A NaN or -inf here would be an
                    # upstream bug and is canonicalized to +inf by this
                    # merge (the classic scatter path would preserve
                    # it); keeping that exact would cost two more
                    # matmuls per leaf in the compact hot path.
                    fin = jnp.isfinite(fn_)
                    sel = jax.lax.dot(
                        jnp.where(fin, fn_, 0.0), ohs.astype(old.dtype),
                        precision=jax.lax.Precision.HIGHEST)
                    was_inf = jax.lax.dot(
                        (~fin).astype(old.dtype), ohs.astype(old.dtype),
                        precision=jax.lax.Precision.HIGHEST) > 0.5
                    sel = jnp.where(was_inf, jnp.inf, sel)
                    out = jnp.where(member[None] > 0.5, sel, fo)
                    return out.reshape(old.shape)
                return old.at[..., idx].set(new)

            adv = advance(p)
            new_p = jax.tree.map(merge, adv, regen)
            new_sweep = jax.tree.map(merge, sweep, sub_sweep)
            return new_p, new_sweep

        def do_resets(p):
            if 0 < cfg.reset_budget < w:
                return jax.lax.cond(
                    jnp.sum(trigger) <= cfg.reset_budget,
                    compact_resets, full_resets, p)
            return full_resets(p)

        def no_resets(p):
            return advance(p), sweep

        ps, sweep = jax.lax.cond(jnp.any(trigger), do_resets, no_resets, ps)
        ps = ps.replace(act_hit_t=sweep.act_t, act_hit_id=sweep.act_id)
        return ps, self._result(ps, sweep, rewards, dones, team_r)

    # -- internals ---------------------------------------------------------

    def _physics_and_sweep(self, ps, ext_force, ext_torque):
        cfg = self.cfg
        w = ps.step.shape[0]
        if not self.force_fallback and \
                jax.devices()[0].platform == "tpu" and \
                w % pallas_step.LANE == 0:
            bodies, sweep = pallas_step.fused_step_packed(
                cfg, ps, ext_force, ext_torque)
            return ps.replace(bodies=bodies), sweep
        # Fallback (CPU/tests): classic jnp physics + sweep, repacked.
        state = unpack_state(ps)
        state, wm = self.classic._physics_and_sweep(
            state, jnp.moveaxis(ext_force, -1, 0),
            jnp.moveaxis(ext_torque, -1, 0))
        return pack_state(state), SweepResults(
            vis_seen=jnp.moveaxis(wm.vis_seen, 0, -1),
            lidar=jnp.moveaxis(wm.lidar, 0, -1),
            act_t=jnp.moveaxis(wm.act_t, 0, -1),
            act_id=jnp.moveaxis(wm.act_id, 0, -1),
            rew_seen=wm.rew_seen,
        )

    def _sweep_via_classic(self, state) -> SweepResults:
        wm = self.classic._standalone_sweep(state)
        return SweepResults(
            vis_seen=jnp.moveaxis(wm.vis_seen, 0, -1),
            lidar=jnp.moveaxis(wm.lidar, 0, -1),
            act_t=jnp.moveaxis(wm.act_t, 0, -1),
            act_id=jnp.moveaxis(wm.act_id, 0, -1),
            rew_seen=wm.rew_seen,
        )

    def _result(self, ps, sweep: SweepResults, rewards, dones,
                team_r=None) -> PackedStepResult:
        cfg = self.cfg
        w = ps.step.shape[0]
        obs = build_observations_packed(cfg, ps, sweep.vis_seen,
                                        sweep.lidar)
        if rewards is None:
            rewards = jnp.zeros((cfg.max_agents, w))
        if dones is None:
            dones = jnp.zeros((cfg.max_agents, w), jnp.int32)
        if team_r is None:
            team_r = jnp.zeros((w,))
        return PackedStepResult(
            obs=obs, rewards=rewards, dones=dones,
            episode_results=ps.finished_scores,
            team_reward=team_r)
