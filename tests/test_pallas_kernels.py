"""Pallas kernel correctness vs the jnp reference paths (interpret mode).

The TPU kernels (raycast sweep, XPBD substep loop) are validated on CPU
through the Pallas interpreter against the pure-jnp implementations that
define the semantics. Tolerances are loose where f32 op-order differences
can flip degenerate cases (grazing rays, contact face ties).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv, observations
from marl_hideandseek_tpu.ops import pallas_physics, pallas_rays, pallas_step

W = 128  # one lane block
# Reduced body capacity (3 boxes + 1 ramp + 2 agents): the interpreter cost
# of the unrolled kernels scales ~quadratically with body slots, and the
# kernels are generated from cfg the same way at any capacity.
CFG = EnvConfig(num_worlds=W, min_hiders=1, max_hiders=1, min_seekers=1,
                max_seekers=1, max_boxes=3, max_ramps=1,
                sim_flags=SimFlags.ZeroAgentVelocity)


@pytest.fixture(scope="module")
def state():
    env = HideAndSeekEnv(CFG)
    s, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    return s


def test_raycast_kernel_matches(state):
    q = jax.vmap(
        functools.partial(observations.obs_ray_queries, CFG))(state)
    t_i, id_i = pallas_rays.raycast_batch(
        CFG, state, *q, use_pallas=False, interpret=True)
    t_j, id_j = pallas_rays.raycast_batch(
        CFG, state, *q, use_pallas=False, interpret=False)
    id_i, id_j = np.asarray(id_i), np.asarray(id_j)
    match = (id_i == id_j).mean()
    assert match > 0.999, match
    mask = (id_i == id_j) & (id_i >= 0)
    np.testing.assert_allclose(np.asarray(t_i)[mask],
                               np.asarray(t_j)[mask], rtol=1e-4, atol=1e-4)


def test_physics_kernel_matches(state):
    zeros = jnp.zeros((W, CFG.num_dyn_bodies, 3))
    out_i = pallas_physics.physics_step_batch(
        CFG, state.bodies, state.statics, state.grab, zeros, zeros,
        use_pallas=False, interpret=True)
    out_j = pallas_physics.physics_step_batch(
        CFG, state.bodies, state.statics, state.grab, zeros, zeros,
        use_pallas=False, interpret=False)
    for name in ("pos", "quat", "vel", "omega"):
        a = np.asarray(getattr(out_i, name))
        b = np.asarray(getattr(out_j, name))
        # Positions/rotations should agree tightly; velocities amplify
        # position differences by 1/h so allow more slack.
        tol = 5e-3 if name in ("pos", "quat") else 0.5
        close = np.abs(a - b) < tol
        frac = close.mean()
        assert frac > 0.995, (name, frac, np.abs(a - b).max())


def test_fused_step_kernel_matches(state):
    """The fused physics+sweep kernel reproduces the jnp composite: physics
    substeps, then visibility/lidar/action/reward rays on the post-physics
    pose (the per-step sweep contract of env.HideAndSeekEnv)."""
    env = HideAndSeekEnv(CFG)
    zeros = jnp.zeros((W, CFG.num_dyn_bodies, 3))

    bodies_k, sweep_k = pallas_step.fused_step(
        CFG, state, zeros, zeros, interpret=True)
    vis_k, lid_k, act_t_k, act_id_k, rew_k = sweep_k

    bodies_j = pallas_physics.physics_step_batch(
        CFG, state.bodies, state.statics, state.grab, zeros, zeros,
        use_pallas=False, interpret=False)
    state_j = state.replace(bodies=bodies_j)
    sweep_j = env._standalone_sweep(state_j)

    # Physics agreement (same bars as test_physics_kernel_matches).
    for name, tol in (("pos", 5e-3), ("quat", 5e-3), ("vel", 0.5),
                      ("omega", 0.5)):
        a = np.asarray(getattr(bodies_k, name))
        b = np.asarray(getattr(bodies_j, name))
        frac = (np.abs(a - b) < tol).mean()
        assert frac > 0.995, (name, frac, np.abs(a - b).max())

    # Sweep agreement on the kernel's own post-physics state (recompute the
    # jnp sweep there so physics op-order noise doesn't leak in).
    sweep_ref = env._standalone_sweep(state.replace(bodies=bodies_k))
    vis_r = np.asarray(sweep_ref.vis_seen)
    assert (np.asarray(vis_k) == vis_r).mean() > 0.999
    lid_r = np.asarray(sweep_ref.lidar)
    lid_match = np.isclose(np.asarray(lid_k), lid_r, rtol=1e-3, atol=1e-3)
    assert lid_match.mean() > 0.999, lid_match.mean()
    assert (np.asarray(act_id_k) == np.asarray(sweep_ref.act_id)).mean() \
        > 0.999
    hit = np.asarray(sweep_ref.act_id) >= 0
    np.testing.assert_allclose(
        np.asarray(act_t_k)[hit], np.asarray(sweep_ref.act_t)[hit],
        rtol=1e-4, atol=1e-4)
    assert (np.asarray(rew_k) == np.asarray(sweep_ref.rew_seen)).mean() \
        > 0.999


def test_fused_step_packed_matches(state):
    """The worlds-minor arg-marshalling wrapper (the production TPU hot
    path, driven by PackedEnv._physics_and_sweep) produces the same bodies
    and sweep as the worlds-leading fused_step wrapper on the same state.
    Guards the two wrappers' arg orders against drifting apart."""
    from marl_hideandseek_tpu.env.packed import pack_state

    zeros = jnp.zeros((W, CFG.num_dyn_bodies, 3))
    bodies_ref, sweep_ref = pallas_step.fused_step(
        CFG, state, zeros, zeros, interpret=True)
    vis_r, lid_r, act_t_r, act_id_r, rew_r = sweep_ref

    ps = pack_state(state)
    zeros_p = jnp.zeros((CFG.num_dyn_bodies, 3, W))
    bodies_p, sweep_p = pallas_step.fused_step_packed(
        CFG, ps, zeros_p, zeros_p, interpret=True)

    for name in ("pos", "quat", "vel", "omega"):
        a = np.asarray(jnp.moveaxis(getattr(bodies_p, name), -1, 0))
        b = np.asarray(getattr(bodies_ref, name))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(sweep_p.vis_seen, -1, 0)), np.asarray(vis_r))
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(sweep_p.lidar, -1, 0)), np.asarray(lid_r),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(jnp.moveaxis(sweep_p.act_id, -1, 0)),
        np.asarray(act_id_r))
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(sweep_p.act_t, -1, 0)), np.asarray(act_t_r),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sweep_p.rew_seen),
                                  np.asarray(rew_r))


def test_physics_kernel_multi_step(state):
    """Chained kernel steps stay finite and settle like the reference."""
    zeros = jnp.zeros((W, CFG.num_dyn_bodies, 3))
    step = jax.jit(lambda b: pallas_physics.physics_step_batch(
        CFG, b, state.statics, state.grab, zeros, zeros,
        use_pallas=False, interpret=True))
    bodies = state.bodies
    for _ in range(3):
        bodies = step(bodies)
    assert np.isfinite(np.asarray(bodies.pos)).all()
    assert np.isfinite(np.asarray(bodies.quat)).all()
    # Nothing should fall through the floor.
    active = np.asarray(bodies.active)
    z = np.asarray(bodies.pos[..., 2])
    assert (z[active] > -1.0).all()


def test_megastep_packed_matches(state):
    """The whole-step megakernel (movement + grab/lock + physics + sweep +
    zero-vel + rewards/scores in one launch) matches the packed XLA
    fallback path phase-for-phase on the same state and actions."""
    from marl_hideandseek_tpu.env import packed as P

    ps = P.pack_state(state)
    # Mid-episode step counter so seekers are unfrozen and rewards are
    # live; non-neutral actions exercise movement + grab/lock attempts.
    ps = ps.replace(step=jnp.full_like(ps.step, 100))
    key = jax.random.PRNGKey(7)
    n_a = CFG.max_agents
    acts = jnp.concatenate([
        jax.random.randint(key, (n_a, 3, W), 0, 5),
        jax.random.randint(jax.random.fold_in(key, 1), (n_a, 2, W), 0, 2),
    ], axis=1)

    ps_k, sweep_k, rew_k, done_k, team_k = pallas_step.megastep_packed(
        CFG, ps, acts, interpret=True)

    # Fallback: the packed component functions around the interpret-mode
    # fused kernel (same physics/sweep numerics, glue in XLA).
    ext_f, ext_t = P._movement_packed(CFG, ps, acts)
    ps_f = P._action_system_packed(CFG, ps, acts, ps.act_hit_t,
                                   ps.act_hit_id)
    bodies_f, sweep_f = pallas_step.fused_step_packed(
        CFG, ps_f, ext_f, ext_t, interpret=True)
    ps_f = ps_f.replace(bodies=bodies_f)
    if CFG.zero_agent_velocity:
        ps_f = P._zero_agent_velocities_packed(CFG, ps_f)
    team_f = jnp.where(sweep_f.rew_seen, -1.0, 1.0)
    ps_f = ps_f.replace(hider_team_reward=team_f)
    rew_f, done_f = P._rewards_dones_packed(CFG, ps_f, team_f)
    ps_f = P._episode_results_packed(CFG, ps_f, team_f)

    for name in ("pos", "quat", "vel", "omega"):
        a = np.asarray(getattr(ps_k.bodies, name))
        b = np.asarray(getattr(ps_f.bodies, name))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                   err_msg=name)
    np.testing.assert_array_equal(np.asarray(ps_k.bodies.locked),
                                  np.asarray(ps_f.bodies.locked))
    np.testing.assert_array_equal(np.asarray(ps_k.bodies.owner),
                                  np.asarray(ps_f.bodies.owner))
    np.testing.assert_array_equal(np.asarray(ps_k.grab.target),
                                  np.asarray(ps_f.grab.target))
    np.testing.assert_allclose(np.asarray(ps_k.grab.r2),
                               np.asarray(ps_f.grab.r2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps_k.grab.rel_q),
                               np.asarray(ps_f.grab.rel_q),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps_k.grab.sep),
                               np.asarray(ps_f.grab.sep),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sweep_k.vis_seen),
                                  np.asarray(sweep_f.vis_seen))
    np.testing.assert_allclose(np.asarray(sweep_k.lidar),
                               np.asarray(sweep_f.lidar),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sweep_k.act_id),
                                  np.asarray(sweep_f.act_id))
    np.testing.assert_array_equal(np.asarray(sweep_k.rew_seen),
                                  np.asarray(sweep_f.rew_seen))
    np.testing.assert_allclose(np.asarray(rew_k), np.asarray(rew_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(done_k), np.asarray(done_f))
    np.testing.assert_allclose(np.asarray(team_k), np.asarray(team_f))
    np.testing.assert_array_equal(np.asarray(ps_k.running_scores),
                                  np.asarray(ps_f.running_scores))
    np.testing.assert_allclose(np.asarray(ps_k.finished_scores),
                               np.asarray(ps_f.finished_scores))
