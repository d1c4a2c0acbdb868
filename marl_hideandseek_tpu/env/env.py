"""The batched hide-and-seek environment: init / step / checkpoints.

This module is the TPU-native replacement for the reference's entire
megakernel step graph + manager + JAX custom-call glue (SURVEY.md §3.2/§3.3;
reference: setupStepTasks src/sim.cpp:1307-1313, Manager::step
src/mgr.cpp:883-903, gpuJAXStep src/mgr.cpp:1006-1022): one pure function

    step(state, actions, resets) -> (state', StepResult)

vmapped over worlds and jitted by the caller. Node ordering of the reference
task graph becomes plain function composition:

  movement -> grab/lock actions -> 4x XPBD substeps -> (optional zero-vel)
  -> reward visibility -> rewards/dones -> episode results -> conditional
  per-world reset (level regeneration, gated on `any(reset)` so its cost is
  only paid on reset steps) -> observations/visibility/lidar.

The `save_checkpoints` / `load_checkpoints` functions mirror the reference's
dedicated checkpoint task graphs (src/sim.cpp:956-1137) but store the
level-gen key explicitly instead of replaying RNG draws (no burn hack).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import (
    EnvConfig,
    INTERACT_RAY_LEN,
    NUM_PREP_STEPS,
    OOB_LIMIT,
    OOB_PENALTY,
)
from marl_hideandseek_tpu.env import levelgen, observations
from marl_hideandseek_tpu.ops import pallas_physics, pallas_rays, pallas_step
from marl_hideandseek_tpu.types import (
    AGENT_HIDER,
    AGENT_SEEKER,
    OWNER_HIDER,
    OWNER_NONE,
    OWNER_SEEKER,
    EnvState,
    StepResult,
    body_slot_ranges,
)

# Movement constants (reference: src/sim.cpp:202-254). Default variant:
# 11 buckets, F_max 60, tau_max 15; ZeroAgentVelocity variant: 5 buckets,
# F_max 800, tau_max 240.
_DEFAULT_BUCKETS = 11
_DEFAULT_F_MAX = 60.0
_DEFAULT_T_MAX = 15.0
_INSTANT_BUCKETS = 5
_INSTANT_F_MAX = 800.0
_INSTANT_T_MAX = 240.0


def _movement_forces(cfg: EnvConfig, state: EnvState, actions):
    """Discrete action buckets -> world-frame force/torque per agent
    (reference: movementSystem / instantMovementSystem src/sim.cpp:202-254).

    Seekers are frozen during prep (cur_step < numPrepSteps - 1).
    """
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    n_body = cfg.num_dyn_bodies

    if cfg.zero_agent_velocity:
        half = _INSTANT_BUCKETS // 2
        f_per = _INSTANT_F_MAX / half
        t_per = _INSTANT_T_MAX / half
    else:
        half = _DEFAULT_BUCKETS // 2
        f_per = _DEFAULT_F_MAX / half
        t_per = _DEFAULT_T_MAX / half

    a_quat = state.bodies.quat[agent_lo:agent_hi]
    f_local = jnp.stack([
        f_per * (actions[:, 0] - half).astype(jnp.float32),
        f_per * (actions[:, 1] - half).astype(jnp.float32),
        jnp.zeros((cfg.max_agents,)),
    ], axis=-1)
    t_z = t_per * (actions[:, 2] - half).astype(jnp.float32)

    seeker_frozen = (state.agent_type == AGENT_SEEKER) & \
        (state.step < NUM_PREP_STEPS - 1)
    gate = (state.agent_active & ~seeker_frozen)[:, None].astype(jnp.float32)

    force_w = math3d.quat_rotate(a_quat, f_local) * gate
    torque_w = jnp.stack(
        [jnp.zeros_like(t_z), jnp.zeros_like(t_z), t_z], axis=-1) * gate

    ext_force = jnp.zeros((n_body, 3)).at[agent_lo:agent_hi].set(force_w)
    ext_torque = jnp.zeros((n_body, 3)).at[agent_lo:agent_hi].set(torque_w)
    return ext_force, ext_torque


def _action_system(cfg: EnvConfig, state: EnvState, actions,
                   hit_t, hit_id) -> EnvState:
    """Grab/lock interaction logic (reference: actionSystem
    src/sim.cpp:270-370). The interaction rays themselves are traced at
    batch level (observations.action_ray_queries + raycast_batch)."""
    (box_lo, box_hi), (ramp_lo, ramp_hi), (agent_lo, agent_hi) = \
        body_slot_ranges(cfg)
    n_a = cfg.max_agents
    bodies = state.bodies

    a_pos = bodies.pos[agent_lo:agent_hi]
    a_quat = bodies.quat[agent_lo:agent_hi]
    eye = a_pos + 0.5 * math3d.UP
    fwd = math3d.quat_rotate(a_quat, math3d.FWD)

    seeker_frozen = (state.agent_type == AGENT_SEEKER) & \
        (state.step < NUM_PREP_STEPS - 1)
    can_act = state.agent_active & ~seeker_frozen

    want_lock = (actions[:, 4] == 1) & can_act
    want_grab = (actions[:, 3] == 1) & can_act

    # Only boxes/ramps are lockable/grabbable (agents are Unownable,
    # walls/planes are static Unownable entities).
    is_obj = (hit_id >= box_lo) & (hit_id < ramp_hi)
    tgt = jnp.where(is_obj, hit_id, 0)

    # All target-slot reads/writes go through the tiny [A, B] one-hot
    # matrix — dynamic gathers (bodies.x[tgt]) and scatters lower to
    # serial loops on TPU and dominated the pre-physics phase when used
    # here (profiled at 16K worlds).
    n_body = cfg.num_dyn_bodies
    onehot = tgt[:, None] == jnp.arange(n_body)[None, :]  # [A, B]
    oh_f = onehot.astype(jnp.float32)
    t_locked = jnp.any(onehot & bodies.locked[None, :], axis=1)
    t_owner = jnp.sum(
        oh_f * bodies.owner[None, :].astype(jnp.float32),
        axis=1).astype(jnp.int32)

    # ---- lock toggle (reference: src/sim.cpp:281-311) --------------------
    my_team_owner = jnp.where(
        state.agent_type == AGENT_HIDER, OWNER_HIDER, OWNER_SEEKER)

    do_unlock = want_lock & is_obj & t_locked & (t_owner == my_team_owner)
    do_lock = want_lock & is_obj & ~t_locked & (t_owner == OWNER_NONE)

    # Reduce same-target conflicts with one-hot max-reductions over the
    # tiny [A, B] matrix (order-independent; the reference resolves such
    # races by arbitrary ECS iteration order).
    locked_any = jnp.any(onehot & do_lock[:, None], axis=0)
    unlocked_any = jnp.any(onehot & do_unlock[:, None], axis=0)
    lock_team = jnp.max(
        jnp.where(onehot & do_lock[:, None], my_team_owner[:, None], 0),
        axis=0)

    locked = jnp.where(locked_any, True,
                       jnp.where(unlocked_any, False, bodies.locked))
    owner = jnp.where(locked_any, lock_team,
                      jnp.where(unlocked_any, OWNER_NONE, bodies.owner))

    # ---- grab toggle (reference: src/sim.cpp:313-361) --------------------
    has_grab = state.grab.target >= 0
    release = want_grab & has_grab

    grabbable = is_obj & ~t_locked & (t_owner == OWNER_NONE)
    acquire = want_grab & ~has_grab & grabbable

    # Clamp the miss sentinel (+inf) out of the attach math: the results
    # are gated by `acquire` (miss => ~is_obj => ~acquire), and inf-inf
    # NaNs in the untaken branch would trip checkify float guards.
    safe_t = jnp.where(is_obj, hit_t, 0.0)
    hit_pos = eye + fwd * safe_t[:, None]
    t_pos = oh_f @ bodies.pos
    t_quat = oh_f @ bodies.quat
    r2_new = math3d.quat_rotate_inv(t_quat, hit_pos - t_pos)
    rel_q_new = math3d.quat_normalize(
        math3d.quat_mul(math3d.quat_inv(t_quat), a_quat))
    sep_new = safe_t - 1.25

    g = state.grab
    new_target = jnp.where(release, -1,
                           jnp.where(acquire, tgt, g.target))
    new_r2 = jnp.where(acquire[:, None], r2_new, g.r2)
    new_rel_q = jnp.where(acquire[:, None], rel_q_new, g.rel_q)
    new_sep = jnp.where(acquire, sep_new, g.sep)

    return state.replace(
        bodies=bodies.replace(locked=locked, owner=owner),
        grab=g.replace(target=new_target.astype(jnp.int32), r2=new_r2,
                       rel_q=new_rel_q, sep=new_sep),
    )


def _zero_agent_velocities(cfg: EnvConfig, state: EnvState) -> EnvState:
    """agentZeroVelSystem (reference: src/sim.cpp:256-268)."""
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    b = state.bodies
    vel = b.vel
    a_vel = vel[agent_lo:agent_hi]
    a_vel = jnp.stack([
        jnp.zeros_like(a_vel[:, 0]),
        jnp.zeros_like(a_vel[:, 1]),
        jnp.minimum(a_vel[:, 2], 0.0),
    ], axis=-1)
    vel = vel.at[agent_lo:agent_hi].set(a_vel)
    omega = b.omega.at[agent_lo:agent_hi].set(0.0)
    return state.replace(bodies=b.replace(vel=vel, omega=omega))


def _rewards_dones(cfg: EnvConfig, state: EnvState, team_r):
    """outputRewardsDonesSystem (reference: src/sim.cpp:806-841)."""
    _, _, (agent_lo, agent_hi) = body_slot_ranges(cfg)
    cur = state.step

    sign = jnp.where(state.agent_type == AGENT_SEEKER, -1.0, 1.0)
    reward = sign * team_r

    pos = state.bodies.pos[agent_lo:agent_hi]
    oob = (jnp.abs(pos[:, 0]) >= OOB_LIMIT) | (jnp.abs(pos[:, 1]) >= OOB_LIMIT)
    reward = reward - OOB_PENALTY * oob.astype(jnp.float32)

    in_prep = cur < NUM_PREP_STEPS - 1
    reward = jnp.where(in_prep, 0.0, reward)
    reward = reward * state.agent_active.astype(jnp.float32)

    done = jnp.where(cur == cfg.episode_len - 1, 1, 0)
    done = jnp.broadcast_to(done, (cfg.max_agents,)).astype(jnp.int32)
    return reward[:, None], done[:, None]


def _episode_results(cfg: EnvConfig, state: EnvState, team_r) -> EnvState:
    """updateEpisodeResultsSystem (reference: src/sim.cpp:843-893)."""
    cur = state.step
    scores = jnp.where(cur == 0, 0, state.running_scores)
    finished = jnp.where(cur == 0, 0.0, state.finished_scores)

    hiders_hidden = team_r > 0.0
    # seekersFirst keys which running score belongs to which policy slot.
    hid_idx = jnp.where(state.seekers_first, 1, 0)
    seek_idx = 1 - hid_idx
    winner = jnp.where(hiders_hidden, hid_idx, seek_idx)
    in_seek = cur >= NUM_PREP_STEPS
    scores = scores.at[winner].add(jnp.where(in_seek, 1, 0))

    at_end = cur == cfg.episode_len - 1
    s0, s1 = scores[0], scores[1]
    final = jnp.where(
        s0 > s1, jnp.array([1.0, 0.0]),
        jnp.where(s0 < s1, jnp.array([0.0, 1.0]), jnp.array([0.5, 0.5])))
    finished = jnp.where(at_end, final, finished)

    return state.replace(running_scores=scores, finished_scores=finished)


def _draw_episode(cfg: EnvConfig, base_key, world_id, episode_counter):
    """Per-episode draws (reference: initEpisodeRNG src/sim.cpp:105-114,
    team-size draws src/sim.cpp:187-190, flip src/level_gen.cpp:232-242).

    Returns (ep_key_data, level_key_data, num_hiders, num_seekers,
    seekers_first)."""
    ep_key = jax.random.fold_in(
        jax.random.fold_in(base_key, world_id), episode_counter)
    k_h, k_s, k_lvl, k_flip = jax.random.split(ep_key, 4)
    num_hiders = jax.random.randint(
        k_h, (), cfg.min_hiders, cfg.max_hiders + 1)
    num_seekers = jax.random.randint(
        k_s, (), cfg.min_seekers, cfg.max_seekers + 1)
    if cfg.random_flip_teams:
        seekers_first = jax.random.randint(k_flip, (), 0, 2) == 1
    else:
        seekers_first = jnp.array(False)
    if cfg.use_fixed_world:
        level_key_data = jnp.zeros((2,), jnp.uint32)
    else:
        level_key_data = jax.random.key_data(k_lvl).astype(jnp.uint32)
    ep_key_data = jax.random.key_data(ep_key).astype(jnp.uint32)
    return ep_key_data, level_key_data, num_hiders, num_seekers, seekers_first


def _regen_world(cfg: EnvConfig, base_key, world_id, state: EnvState,
                 level_id) -> EnvState:
    """Generate a fresh episode for one world."""
    episode_counter = state.episode_counter + 1
    ep_key_data, level_key_data, n_h, n_s, flip = _draw_episode(
        cfg, base_key, world_id, episode_counter)
    new = levelgen.generate_world(
        cfg, level_key_data, ep_key_data, level_id, n_h, n_s, flip)
    return new.replace(
        episode_counter=episode_counter,
        step=jnp.array(0, jnp.int32),
        # EpisodeResult/EpisodeStats singletons persist through reset and
        # are only cleared at cur==0 of the next step
        # (reference: src/sim.cpp:850-856), so the just-finished scores
        # remain visible in the post-reset outputs.
        finished_scores=state.finished_scores,
        running_scores=state.running_scores,
    )


def _fresh_world(cfg: EnvConfig, base_key, world_id, level_id) -> EnvState:
    """First episode of a world (episode_counter starts at 0, matching the
    reference's curWorldEpisode++ starting from 0)."""
    ep_key_data, level_key_data, n_h, n_s, flip = _draw_episode(
        cfg, base_key, world_id, jnp.zeros((), jnp.uint32))
    new = levelgen.generate_world(
        cfg, level_key_data, ep_key_data, level_id, n_h, n_s, flip)
    return new.replace(
        episode_counter=jnp.zeros((), jnp.uint32),
        step=jnp.array(0, jnp.int32),
    )


class SweepResults(NamedTuple):
    """Post-physics per-step ray-sweep outputs (all worlds)."""

    vis_seen: jnp.ndarray   # [W, A, T] f32 final visibility mask values
    lidar: jnp.ndarray      # [W, A, 30] f32 depths
    act_t: jnp.ndarray      # [W, A] f32 next-step grab/lock hit t
    act_id: jnp.ndarray     # [W, A] i32 next-step grab/lock hit entity
    rew_seen: jnp.ndarray   # [W] bool seeker-sees-hider flag


class HideAndSeekEnv:
    """Functional environment facade.

    API mirrors the reference's `.jax()` function dict contract
    (reference: src/bindings.cpp:97-118, jax_infer.py:137-144):
      init(key)                        -> (state, StepResult)
      step(state, actions, resets)     -> (state, StepResult)
      save_checkpoints(state)          -> checkpoint pytree
      load_checkpoints(state, ckpt, should_load) -> (state, StepResult)

    All methods are pure and jittable; `self` only carries static config.

    The per-step ray work (visibility, lidar, reward check, and the NEXT
    step's grab/lock interaction rays — traced on the identical state, see
    types.EnvState.act_hit_*) happens in ONE sweep on the post-physics
    state, fused into the Pallas physics kernel on TPU. Reset steps
    re-sweep the regenerated worlds so observations always describe the
    post-reset state, matching the reference task-graph order
    (src/sim.cpp:1140-1293: rewards -> reset -> observations).
    """

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg

    # -- construction ------------------------------------------------------

    def init(self, key) -> Tuple[EnvState, StepResult]:
        """Create + reset all worlds (reference Init graph:
        src/sim.cpp:1295-1305)."""
        cfg = self.cfg
        world_ids = jnp.arange(cfg.num_worlds, dtype=jnp.uint32)
        state = jax.vmap(
            lambda w: _fresh_world(cfg, key, w, jnp.array(1, jnp.int32))
        )(world_ids)
        return self._finish(state)

    def rgbd(self, state: EnvState, img_h: int = 64, img_w: int = 64):
        """Per-agent batch RGBD tensors (the reference's rgbTensor /
        depthTensor, src/mgr.cpp:1329-1335): returns
        (rgb [W, A, H, W, 4] u8, depth [W, A, H, W, 1] f32)."""
        from marl_hideandseek_tpu.viz.rgbd import render_rgbd

        return render_rgbd(self.cfg, state, img_h, img_w)

    # -- stepping ----------------------------------------------------------

    def step(self, state: EnvState, actions: jnp.ndarray,
             resets: Optional[jnp.ndarray] = None,
             base_key=None) -> Tuple[EnvState, StepResult]:
        """One synchronized step of all worlds.

        actions: [W, A, 5] i32 (x, y, r, g, l buckets).
        resets: optional [W] i32 level ids (0 = no external reset), the
        reference's reset tensor (src/mgr.cpp:1265-1281).
        base_key: PRNG key for episode draws; defaults to the seed key.
        """
        cfg = self.cfg
        if resets is None:
            resets = jnp.zeros((cfg.num_worlds,), jnp.int32)
        if base_key is None:
            base_key = jax.random.PRNGKey(cfg.rand_seed)

        actions = actions.astype(jnp.int32)

        # 1. Movement + grab/lock, consuming the carried interaction-ray
        #    hits (traced on this exact pre-physics state at the end of the
        #    previous step; reference: actionSystem src/sim.cpp:270-370).
        state, ext_force, ext_torque = jax.vmap(
            functools.partial(self._pre_physics, cfg)
        )(state, actions, state.act_hit_t, state.act_hit_id)

        # 2. Physics + the fused post-physics ray sweep.
        state, sweep = self._physics_and_sweep(state, ext_force, ext_torque)
        if cfg.zero_agent_velocity:
            state = jax.vmap(
                functools.partial(_zero_agent_velocities, cfg))(state)

        # 3. Rewards/dones/episode results from the sweep's seeker->hider
        #    flag (pre-reset state, reference order src/sim.cpp:1178-1201).
        state, team_r, rewards, dones = jax.vmap(
            functools.partial(self._reward_phase, cfg))(state, sweep.rew_seen)

        # 4. Conditional reset + regeneration, gated at batch level so the
        #    level generator (and the post-reset re-sweep) only run on steps
        #    where some world resets.
        auto = jnp.zeros((cfg.num_worlds,), bool)
        if not cfg.ignore_episode_length:
            auto = state.step == cfg.episode_len - 1
        trigger = (resets != 0) | auto

        state, sweep = self._apply_resets(
            state, sweep, trigger, resets, base_key)

        state = state.replace(act_hit_t=sweep.act_t, act_hit_id=sweep.act_id)
        result = self._assemble(state, sweep, rewards, dones)
        return state, result

    def _apply_resets(self, state: EnvState, sweep: SweepResults, trigger,
                      resets, base_key):
        """Advance the step counter and regenerate triggered worlds
        (conditional at batch level; shared by the classic and packed
        paths). Returns (state, sweep) describing the post-reset worlds."""
        cfg = self.cfg
        level_ids = jnp.where(resets != 0, resets, 1).astype(jnp.int32)

        def advance(state):
            return state.replace(step=state.step + 1)

        def full_resets(state):
            world_ids = jnp.arange(cfg.num_worlds, dtype=jnp.uint32)
            regen = jax.vmap(
                lambda w, s, lv: _regen_world(cfg, base_key, w, s, lv)
            )(world_ids, state, level_ids)
            advanced = advance(state)  # non-reset worlds still tick
            new_state = jax.tree.map(
                lambda new, old: jnp.where(
                    trigger.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
                regen, advanced)
            # Observations must describe the post-reset worlds: re-sweep.
            return new_state, self._standalone_sweep(new_state)

        def compact_resets(state):
            """Regenerate ONLY the (<= reset_budget) resetting worlds:
            gather them into a compact lane-aligned batch, regen + re-sweep
            that batch, scatter back. Keeps a trickle of staggered resets
            (e.g. the reference benchmark's reset_chance arg,
            scripts/benchmark.py:14) from paying the full-batch generator.
            """
            k = cfg.reset_budget
            w_idx = jnp.arange(cfg.num_worlds, dtype=jnp.int32)
            # Triggered worlds in ascending order; padding entries duplicate
            # the first triggered world (regen is deterministic per world,
            # so duplicate scatters write identical values). int32 scores:
            # float32 would collide world indices above 2^24.
            score = jnp.where(trigger, cfg.num_worlds - w_idx,
                              jnp.int32(0))
            top_score, idx = jax.lax.top_k(score, k)
            idx = jnp.where(top_score > 0, idx, idx[0])

            sub = jax.tree.map(lambda x: x[idx], state)
            regen = jax.vmap(
                lambda w, s, lv: _regen_world(cfg, base_key, w, s, lv)
            )(idx.astype(jnp.uint32), sub, level_ids[idx])
            sub_sweep = self._standalone_sweep(regen)

            advanced = advance(state)
            new_state = jax.tree.map(
                lambda old, new: old.at[idx].set(new), advanced, regen)
            new_sweep = jax.tree.map(
                lambda old, new: old.at[idx].set(new), sweep, sub_sweep)
            return new_state, new_sweep

        def do_resets(state):
            if 0 < cfg.reset_budget < cfg.num_worlds:
                return jax.lax.cond(
                    jnp.sum(trigger) <= cfg.reset_budget,
                    compact_resets, full_resets, state)
            return full_resets(state)

        def no_resets(state):
            return advance(state), sweep

        return jax.lax.cond(
            jnp.any(trigger), do_resets, no_resets, state)

    # -- sweep machinery ----------------------------------------------------

    def _physics_and_sweep(self, state: EnvState, ext_force, ext_torque):
        """Physics substeps + the post-physics ray sweep.

        On TPU both run inside one fused Pallas kernel (state never leaves
        VMEM between the solver and the rays); elsewhere the jnp physics +
        raycast reference paths compose the same semantics.
        """
        cfg = self.cfg
        if pallas_step.use_fused(cfg, state):
            bodies, sweep = pallas_step.fused_step(
                cfg, state, ext_force, ext_torque)
            return state.replace(bodies=bodies), SweepResults(*sweep)
        bodies = pallas_physics.physics_step_batch(
            cfg, state.bodies, state.statics, state.grab, ext_force,
            ext_torque)
        state = state.replace(bodies=bodies)
        return state, self._standalone_sweep(state)

    def _standalone_sweep(self, state: EnvState) -> SweepResults:
        """The per-step ray sweep as separate raycast launches (init, reset
        steps, checkpoint load, and the non-fused fallback)."""
        cfg = self.cfg
        obs_q = jax.vmap(
            functools.partial(observations.obs_ray_queries, cfg))(state)
        obs_t, obs_id = self._raycast(state, *obs_q)
        vis_seen, lidar = jax.vmap(
            functools.partial(observations.consume_obs_sweep, cfg)
        )(state, obs_id, obs_t)
        act_q = jax.vmap(
            functools.partial(observations.action_ray_queries, cfg))(state)
        act_t, act_id = self._raycast(state, *act_q)
        rew_seen = jax.vmap(
            functools.partial(observations.reward_flag_from_vis, cfg)
        )(state, vis_seen)
        return SweepResults(vis_seen=vis_seen, lidar=lidar, act_t=act_t,
                            act_id=act_id, rew_seen=rew_seen)

    def _raycast(self, state, origins, dirs, maxt, excl):
        """Batched raycast: Pallas kernel on TPU, vmapped jnp elsewhere."""
        return pallas_rays.raycast_batch(
            self.cfg, state, origins, dirs, maxt, excl)

    @staticmethod
    def _pre_physics(cfg: EnvConfig, state: EnvState, actions, act_t,
                     act_id):
        """Single-world: movement forces + grab/lock application."""
        ext_force, ext_torque = _movement_forces(cfg, state, actions)
        state = _action_system(cfg, state, actions, act_t, act_id)
        return state, ext_force, ext_torque

    @staticmethod
    def _reward_phase(cfg: EnvConfig, state: EnvState, rew_seen):
        """Single-world: reward flag -> rewards/dones -> episode results."""
        team_r = jnp.where(rew_seen, -1.0, 1.0)
        state = state.replace(hider_team_reward=team_r)
        rewards, dones = _rewards_dones(cfg, state, team_r)
        state = _episode_results(cfg, state, team_r)
        return state, team_r, rewards, dones

    def _finish(self, state: EnvState, rewards=None, dones=None):
        """Sweep a freshly generated/loaded state and assemble outputs."""
        sweep = self._standalone_sweep(state)
        state = state.replace(act_hit_t=sweep.act_t, act_hit_id=sweep.act_id)
        return state, self._assemble(state, sweep, rewards, dones)

    def _assemble(self, state: EnvState, sweep: SweepResults,
                  rewards=None, dones=None) -> StepResult:
        cfg = self.cfg
        obs = jax.vmap(
            functools.partial(observations.build_observations, cfg)
        )(state, sweep.vis_seen, sweep.lidar)
        if rewards is None:
            rewards = jnp.zeros((cfg.num_worlds, cfg.max_agents, 1))
        if dones is None:
            dones = jnp.zeros((cfg.num_worlds, cfg.max_agents, 1), jnp.int32)
        return StepResult(
            obs=obs,
            rewards=rewards,
            dones=dones,
            episode_results=state.finished_scores,
        )

    # -- debug / tooling ---------------------------------------------------

    def global_positions(self, state: EnvState) -> jnp.ndarray:
        """[W, 17, 2] xy positions (reference: src/mgr.cpp:1229-1239)."""
        return jax.vmap(
            functools.partial(observations.global_debug_positions, self.cfg)
        )(state)

    def seeds(self, state: EnvState) -> jnp.ndarray:
        """[W, A, 2] i32 per-agent episode seed (reference seed tensor:
        src/mgr.cpp:1198-1206 — the episode RNG counter pair)."""
        seed = state.ep_key.astype(jnp.int32)  # [W, 2]
        return jnp.broadcast_to(
            seed[:, None, :], (self.cfg.num_worlds, self.cfg.max_agents, 2))

    # -- sim-state checkpoints --------------------------------------------

    def save_checkpoints(self, state: EnvState):
        """Per-world checkpoint pytree (reference Checkpoint singleton:
        src/sim.hpp:283-313 + saveCheckpointSystem src/sim.cpp:1046-1137).

        The grab joints are stored directly from the per-agent slots (the
        reference reverse-maps constraint entities; our representation is
        already index-based)."""
        from marl_hideandseek_tpu.env.checkpoint import save_checkpoints
        return save_checkpoints(self.cfg, state)

    def load_checkpoints(self, state: EnvState, ckpt,
                         should_load: jnp.ndarray):
        from marl_hideandseek_tpu.env.checkpoint import load_checkpoints
        new_state = load_checkpoints(self.cfg, state, ckpt, should_load)
        return self._finish(new_state)
