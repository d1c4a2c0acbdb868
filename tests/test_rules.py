"""Targeted unit tests for interaction rules, visibility cone edges and
lidar geometry.

Pins the reference semantics branch by branch:
  * lock toggle / owner-team unlock / unowned grab rules
    (reference: actionSystem src/sim.cpp:281-361),
  * 135-degree visibility cone edges + occlusion
    (reference: computeVisibilitySystem src/sim.cpp:567-710),
  * lidar ray geometry against hand-computed distances
    (reference: lidarSystem src/sim.cpp:712-759).

These paths were previously exercised only via random-action rollouts
(VERDICT.md round-1 weak item 3); a sign flip in any ownership branch now
fails a named test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from marl_hideandseek_tpu import math3d
from marl_hideandseek_tpu.config import EnvConfig, NUM_PREP_STEPS
from marl_hideandseek_tpu.env import HideAndSeekEnv, levelgen, observations
from marl_hideandseek_tpu.env.env import _action_system
from marl_hideandseek_tpu.types import (
    AGENT_HIDER,
    AGENT_SEEKER,
    OWNER_HIDER,
    OWNER_NONE,
    OWNER_SEEKER,
    body_slot_ranges,
)

CFG = EnvConfig(num_worlds=1, min_hiders=2, max_hiders=2,
                min_seekers=2, max_seekers=2)
(BOX_LO, BOX_HI), (RAMP_LO, RAMP_HI), (AGENT_LO, AGENT_HI) = \
    body_slot_ranges(CFG)
A = CFG.max_agents


def build_world(agents=(), boxes=(), box_locked=(), box_owner=()):
    """Single world (no W axis): agents = [(pos, yaw_deg, type)],
    boxes = [(pos, yaw_deg)]."""
    state = levelgen.empty_world(CFG)
    for i, (pos, yaw, atype) in enumerate(agents):
        q = math3d.quat_from_yaw(jnp.deg2rad(jnp.float32(yaw)))
        state = levelgen._add_agent(state, CFG, i, pos, q, jnp.int32(atype))
    for i, (pos, yaw) in enumerate(boxes):
        q = math3d.quat_from_yaw(jnp.deg2rad(jnp.float32(yaw)))
        state = levelgen._add_box_body(state, CFG, i, pos, q,
                                       levelgen.CUBE_HALF)
    b = state.bodies
    for i, lk in enumerate(box_locked):
        b = b.replace(locked=b.locked.at[BOX_LO + i].set(bool(lk)))
    for i, ow in enumerate(box_owner):
        b = b.replace(owner=b.owner.at[BOX_LO + i].set(jnp.int32(ow)))
    state = state.replace(
        bodies=b,
        num_active_boxes=jnp.int32(len(boxes)),
        # Past the prep phase so seekers can act.
        step=jnp.int32(NUM_PREP_STEPS + 5),
    )
    return state


def act(agent, *, grab=0, lock=0):
    """Neutral move actions with one agent's grab/lock bit set."""
    a = jnp.full((A, 5), 2, jnp.int32).at[:, 3:].set(0)
    return a.at[agent, 3].set(grab).at[agent, 4].set(lock)


def hit_box(agent, box_idx, t=1.5):
    """Hand-built interaction-ray hit arrays: `agent` hits box `box_idx`."""
    hit_t = jnp.full((A,), jnp.inf)
    hit_id = jnp.full((A,), -1, jnp.int32)
    return (hit_t.at[agent].set(t), hit_id.at[agent].set(BOX_LO + box_idx))


# --------------------------------------------------------------------------
# Lock rules (reference: src/sim.cpp:281-311)
# --------------------------------------------------------------------------


def test_lock_unowned_box():
    """Locking an unowned dynamic box sets locked + own-team owner."""
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)])
    t, i = hit_box(0, 0)
    s2 = _action_system(CFG, state, act(0, lock=1), t, i)
    assert bool(s2.bodies.locked[BOX_LO])
    assert int(s2.bodies.owner[BOX_LO]) == OWNER_HIDER


def test_lock_by_seeker_sets_seeker_owner():
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_SEEKER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)])
    t, i = hit_box(0, 0)
    s2 = _action_system(CFG, state, act(0, lock=1), t, i)
    assert bool(s2.bodies.locked[BOX_LO])
    assert int(s2.bodies.owner[BOX_LO]) == OWNER_SEEKER


def test_unlock_by_owner_team():
    """Only the owner team may unlock (src/sim.cpp:292-299)."""
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)],
        box_locked=[True], box_owner=[OWNER_HIDER])
    t, i = hit_box(0, 0)
    s2 = _action_system(CFG, state, act(0, lock=1), t, i)
    assert not bool(s2.bodies.locked[BOX_LO])
    assert int(s2.bodies.owner[BOX_LO]) == OWNER_NONE


def test_unlock_denied_other_team():
    """A seeker cannot unlock a hider-locked box (and vice versa)."""
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_SEEKER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)],
        box_locked=[True], box_owner=[OWNER_HIDER])
    t, i = hit_box(0, 0)
    s2 = _action_system(CFG, state, act(0, lock=1), t, i)
    assert bool(s2.bodies.locked[BOX_LO])
    assert int(s2.bodies.owner[BOX_LO]) == OWNER_HIDER


def test_lock_noop_without_hit():
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 10.0, 1.0], 0.0)])
    hit_t = jnp.full((A,), jnp.inf)
    hit_id = jnp.full((A,), -1, jnp.int32)
    s2 = _action_system(CFG, state, act(0, lock=1), hit_t, hit_id)
    assert not bool(s2.bodies.locked[BOX_LO])


def test_seeker_frozen_in_prep_cannot_lock():
    """Seekers cannot act during prep (src/sim.cpp:276-279)."""
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_SEEKER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)])
    state = state.replace(step=jnp.int32(10))
    t, i = hit_box(0, 0)
    s2 = _action_system(CFG, state, act(0, lock=1), t, i)
    assert not bool(s2.bodies.locked[BOX_LO])


# --------------------------------------------------------------------------
# Grab rules (reference: src/sim.cpp:313-361)
# --------------------------------------------------------------------------


def test_grab_unowned_box_attach_frames():
    """Grabbing stores target index, r2 in target frame, sep = t - 1.25."""
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)])
    t, i = hit_box(0, 0, t=1.5)
    s2 = _action_system(CFG, state, act(0, grab=1), t, i)
    assert int(s2.grab.target[0]) == BOX_LO
    np.testing.assert_allclose(float(s2.grab.sep[0]), 1.5 - 1.25, atol=1e-6)
    # Hit point = eye + fwd*t = (0, 1.5, 1.5); box at (0,2,1) identity =>
    # r2 = (0, -0.5, 0.5) in the target frame.
    np.testing.assert_allclose(
        np.asarray(s2.grab.r2[0]), [0.0, -0.5, 0.5], atol=1e-5)


def test_grab_toggle_releases():
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)])
    t, i = hit_box(0, 0)
    s2 = _action_system(CFG, state, act(0, grab=1), t, i)
    assert int(s2.grab.target[0]) >= 0
    s3 = _action_system(CFG, s2, act(0, grab=1), t, i)
    assert int(s3.grab.target[0]) == -1


def test_grab_denied_locked_box():
    """Locked objects cannot be grabbed (src/sim.cpp:330-333)."""
    state = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)],
        box_locked=[True], box_owner=[OWNER_SEEKER])
    t, i = hit_box(0, 0)
    s2 = _action_system(CFG, state, act(0, grab=1), t, i)
    assert int(s2.grab.target[0]) == -1


def test_grab_ray_hits_box_end_to_end():
    """The interaction ray itself (length 2.5 from the eye point) finds the
    box via the sweep; out-of-range boxes miss."""
    near = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 2.0, 1.0], 0.0)])
    far = build_world(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)],
        boxes=[([0.0, 6.0, 1.0], 0.0)])

    def sweep_hits(state):
        env = HideAndSeekEnv(CFG)
        batched = jax.tree.map(lambda x: x[None], state)
        res = env._standalone_sweep(batched)
        return res.act_id[0], res.act_t[0]

    ids, ts = sweep_hits(near)
    assert int(ids[0]) == BOX_LO
    # eye z=1.5 -> box face y=1 at t=1.0 (unit cube at y=2).
    np.testing.assert_allclose(float(ts[0]), 1.0, atol=1e-5)
    ids, _ = sweep_hits(far)
    assert int(ids[0]) == -1


# --------------------------------------------------------------------------
# Visibility cone edges + occlusion (reference: src/sim.cpp:567-710)
# --------------------------------------------------------------------------


def _vis_for(agents, boxes=()):
    env = HideAndSeekEnv(CFG)
    state = build_world(agents=agents, boxes=boxes)
    batched = jax.tree.map(lambda x: x[None], state)
    res = env._standalone_sweep(batched)
    return np.asarray(res.vis_seen[0])


def test_vis_cone_inside_edge():
    """Target at 60 deg off forward (inside the 67.5 deg half-angle) is
    seen; at 75 deg (outside) it is not."""
    d = 5.0
    for ang, expected in ((60.0, True), (75.0, False)):
        rad = np.deg2rad(ang)
        # Observer faces +y; target offset by `ang` from +y in the xy plane.
        tgt = [d * np.sin(rad), d * np.cos(rad), 1.0]
        vis = _vis_for([
            ([0.0, 0.0, 1.0], 0.0, AGENT_SEEKER),
            (tgt, 0.0, AGENT_HIDER),
        ])
        # Agent 0's target columns: others matrix row0 = slots [1..5];
        # column 0 = agent 1.
        assert bool(vis[0, 0] > 0.5) == expected, f"angle {ang}"


def test_vis_occluded_by_box():
    """A box between observer and target occludes it."""
    vis = _vis_for(
        agents=[([0.0, 0.0, 1.0], 0.0, AGENT_SEEKER),
                ([0.0, 8.0, 1.0], 180.0, AGENT_HIDER)],
        boxes=[([0.0, 4.0, 1.0], 0.0)])
    assert vis[0, 0] < 0.5          # hider occluded
    assert vis[1, 0] < 0.5          # seeker occluded (symmetric)
    n_agent_cols = 5
    assert vis[0, n_agent_cols + 0] > 0.5   # the box itself is visible


def test_vis_behind_observer_not_seen():
    vis = _vis_for([
        ([0.0, 0.0, 1.0], 0.0, AGENT_SEEKER),   # faces +y
        ([0.0, -5.0, 1.0], 0.0, AGENT_HIDER),   # directly behind
    ])
    assert vis[0, 0] < 0.5
    assert vis[1, 0] > 0.5  # hider faces +y and sees the seeker ahead


def test_reward_flag_seeker_sees_hider():
    env = HideAndSeekEnv(CFG)
    state = build_world(agents=[
        ([0.0, 0.0, 1.0], 0.0, AGENT_SEEKER),
        ([0.0, 5.0, 1.0], 0.0, AGENT_HIDER),
    ])
    batched = jax.tree.map(lambda x: x[None], state)
    res = env._standalone_sweep(batched)
    assert bool(res.rew_seen[0])
    # Hider-sees-seeker only (observer roles swapped) must NOT set it.
    state2 = build_world(agents=[
        ([0.0, 0.0, 1.0], 180.0, AGENT_SEEKER),  # faces away
        ([0.0, 5.0, 1.0], 180.0, AGENT_HIDER),   # faces the seeker
    ])
    batched2 = jax.tree.map(lambda x: x[None], state2)
    res2 = env._standalone_sweep(batched2)
    assert not bool(res2.rew_seen[0])


# --------------------------------------------------------------------------
# Lidar geometry (reference: src/sim.cpp:712-759)
# --------------------------------------------------------------------------


def test_lidar_wall_distance():
    """Ray 0 points along +y (theta = pi/2 in the agent frame); a wall face
    at y=4 with half-thickness 0.2 returns depth 3.8."""
    state = build_world(agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)])
    s = state.statics
    s = s.replace(
        wall_pos=s.wall_pos.at[0].set(jnp.array([0.0, 4.2, 1.25])),
        wall_half_ext=s.wall_half_ext.at[0].set(jnp.array([10.0, 0.2, 1.25])),
        wall_active=s.wall_active.at[0].set(True))
    state = state.replace(statics=s)

    env = HideAndSeekEnv(CFG)
    batched = jax.tree.map(lambda x: x[None], state)
    res = env._standalone_sweep(batched)
    lidar = np.asarray(res.lidar[0, 0])         # agent 0, 30 rays
    np.testing.assert_allclose(lidar[0], 4.0, atol=1e-4)
    # The opposite ray (theta = 3pi/2, index 15) misses everything -> 0.
    assert lidar[15] == 0.0


def test_lidar_rotates_with_agent():
    """Yawing the agent 90 deg rotates which ray sees the wall."""
    state = build_world(agents=[([0.0, 0.0, 1.0], -90.0, AGENT_HIDER)])
    s = state.statics
    s = s.replace(
        wall_pos=s.wall_pos.at[0].set(jnp.array([0.0, 4.2, 1.25])),
        wall_half_ext=s.wall_half_ext.at[0].set(jnp.array([10.0, 0.2, 1.25])),
        wall_active=s.wall_active.at[0].set(True))
    state = state.replace(statics=s)

    env = HideAndSeekEnv(CFG)
    batched = jax.tree.map(lambda x: x[None], state)
    res = env._standalone_sweep(batched)
    lidar = np.asarray(res.lidar[0, 0])
    # Agent forward is now +x (yaw -90): the wall at +y world is at agent
    # angle theta=pi, i.e. ray index (pi - pi/2) / (2pi/30) = 7.5 -> the
    # nearest rays 7 and 8 straddle it.
    assert lidar[0] == 0.0 or lidar[0] > 4.5  # forward ray no longer 4.0
    hit_dists = lidar[(lidar > 0)]
    assert (np.abs(hit_dists - 4.0) < 0.5).any()


def test_lidar_inactive_agent_zero():
    state = build_world(agents=[([0.0, 0.0, 1.0], 0.0, AGENT_HIDER)])
    env = HideAndSeekEnv(CFG)
    batched = jax.tree.map(lambda x: x[None], state)
    res = env._standalone_sweep(batched)
    lidar = np.asarray(res.lidar[0])
    assert (lidar[1:] == 0.0).all()   # agents 1..5 inactive -> zeroed
