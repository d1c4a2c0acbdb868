"""End-to-end environment tests: shapes, episode structure, determinism.

Validates the reference train-interface contract (src/mgr.cpp:1338-1375)
and episode semantics (src/sim.cpp:14-17, 172-200, 806-893).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv

W = 4
CFG = EnvConfig(
    num_worlds=W,
    min_hiders=2, max_hiders=2, min_seekers=2, max_seekers=2,
    sim_flags=SimFlags.ZeroAgentVelocity,
)
A = CFG.max_agents


@pytest.fixture(scope="module")
def env():
    return HideAndSeekEnv(CFG)


@pytest.fixture(scope="module")
def init_state(env):
    return jax.jit(env.init)(jax.random.PRNGKey(5))


def random_actions(key, n_worlds=W, n_agents=A):
    k1, k2 = jax.random.split(key)
    move = jax.random.randint(k1, (n_worlds, n_agents, 3), 0, 5)
    gl = jax.random.randint(k2, (n_worlds, n_agents, 2), 0, 2)
    return jnp.concatenate([move, gl], axis=-1)


def test_obs_shapes(init_state):
    _, result = init_state
    obs = result.obs
    assert obs["prep_counter"].shape == (W, A, 1)
    assert obs["self_data"].shape == (W, A, 13)
    assert obs["self_type"].shape == (W, A, 1)
    assert obs["self_mask"].shape == (W, A, 1)
    assert obs["self_lidar"].shape == (W, A, 30)
    assert obs["agent_data"].shape == (W, A, 5, 14)
    assert obs["box_data"].shape == (W, A, 9, 17)
    assert obs["ramp_data"].shape == (W, A, 2, 14)
    assert obs["vis_agents_mask"].shape == (W, A, 5, 1)
    assert obs["vis_boxes_mask"].shape == (W, A, 9, 1)
    assert obs["vis_ramps_mask"].shape == (W, A, 2, 1)
    assert result.rewards.shape == (W, A, 1)
    assert result.dones.shape == (W, A, 1)
    assert result.episode_results.shape == (W, 2)


def test_init_state_sane(init_state):
    state, result = init_state
    assert bool(jnp.all(state.step == 0))
    assert bool(jnp.all(state.num_hiders == 2))
    assert bool(jnp.all(state.num_seekers == 2))
    # 3-9 boxes, always 2 ramps.
    nb = np.asarray(state.num_active_boxes)
    assert ((nb >= 3) & (nb <= 9)).all()
    assert (np.asarray(state.num_active_ramps) == 2).all()
    # All 4 agents active, prep counter full.
    assert (np.asarray(state.agent_active)).all()
    assert (np.asarray(result.obs["prep_counter"]) == 96).all()
    # No NaNs anywhere.
    for leaf in jax.tree_util.tree_leaves(result.obs):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


def test_step_noop_advances(env, init_state):
    state, _ = init_state
    actions = jnp.full((W, A, 5), 2, jnp.int32).at[..., 3:].set(0)
    state2, result = jax.jit(env.step)(state, actions)
    assert bool(jnp.all(state2.step == 1))
    assert (np.asarray(result.obs["prep_counter"]) == 95).all()
    assert (np.asarray(result.rewards) == 0).all()  # prep phase
    assert (np.asarray(result.dones) == 0).all()


def test_random_rollout_no_nans(env, init_state):
    """Soak like the reference headless random-action run
    (src/headless.cpp:78-96)."""
    state, _ = init_state
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, result = step(state, random_actions(sub))
    for leaf in jax.tree_util.tree_leaves((result.obs, result.rewards)):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    # Agents should stay within (near) bounds.
    assert np.abs(np.asarray(result.obs["self_data"])[..., :2]).max() < 30.0


def test_episode_boundary(env):
    """Done at step 239, auto-reset regenerates, scores finalize."""
    cfg = CFG
    env2 = HideAndSeekEnv(cfg)
    state, _ = jax.jit(env2.init)(jax.random.PRNGKey(5))
    # Fast-forward: entry value of state.step is "cur" for the call, so the
    # call with cur=239 emits done=1 and auto-resets (src/sim.cpp:176-180).
    state = state.replace(step=jnp.full((W,), 239, jnp.int32))
    actions = jnp.full((W, A, 5), 2, jnp.int32).at[..., 3:].set(0)
    step = jax.jit(env2.step)

    state, result = step(state, actions)  # cur=239 -> done + reset
    assert (np.asarray(result.dones) == 1).all()
    finished = np.asarray(result.episode_results)
    assert (finished.sum(-1) == 1.0).all()
    assert bool(jnp.all(state.step == 0))
    # Episode counter advanced.
    assert (np.asarray(state.episode_counter) == 1).all()

    state, result = step(state, actions)
    assert (np.asarray(result.dones) == 0).all()
    assert bool(jnp.all(state.step == 1))


def test_external_reset(env, init_state):
    state, _ = init_state
    actions = jnp.full((W, A, 5), 2, jnp.int32).at[..., 3:].set(0)
    state = state.replace(step=jnp.full((W,), 50, jnp.int32))
    resets = jnp.zeros((W,), jnp.int32).at[1].set(1)
    state2, _ = jax.jit(env.step)(state, actions, resets)
    s = np.asarray(state2.step)
    assert s[1] == 0 and (s[[0, 2, 3]] == 51).all()


def test_compact_reset_matches_full(init_state):
    """The compact (gather/regen/scatter) staggered-reset path must produce
    bit-identical state to the full-batch regeneration path."""
    cfg_compact = CFG.replace(reset_budget=2)
    cfg_full = CFG.replace(reset_budget=0)
    env_c = HideAndSeekEnv(cfg_compact)
    env_f = HideAndSeekEnv(cfg_full)

    state, _ = init_state
    actions = jnp.full((W, A, 5), 2, jnp.int32).at[..., 3:].set(0)
    state = state.replace(step=jnp.full((W,), 50, jnp.int32))
    resets = jnp.zeros((W,), jnp.int32).at[1].set(1).at[3].set(2)

    sc, rc = jax.jit(env_c.step)(state, actions, resets)
    sf, rf = jax.jit(env_f.step)(state, actions, resets)
    for a, b in zip(jax.tree_util.tree_leaves(sc),
                    jax.tree_util.tree_leaves(sf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(rc),
                    jax.tree_util.tree_leaves(rf)):
        # The compact path re-sweeps the regenerated worlds in a K-sized
        # batch; XLA codegen for the different batch shape may round
        # differently in the last ulp.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # Over-budget burst (all 4 worlds) falls back to the full path.
    resets_all = jnp.full((W,), 1, jnp.int32)
    sc2, _ = jax.jit(env_c.step)(state, actions, resets_all)
    sf2, _ = jax.jit(env_f.step)(state, actions, resets_all)
    for a, b in zip(jax.tree_util.tree_leaves(sc2),
                    jax.tree_util.tree_leaves(sf2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_determinism(env):
    s1, r1 = jax.jit(env.init)(jax.random.PRNGKey(5))
    s2, r2 = jax.jit(env.init)(jax.random.PRNGKey(5))
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s3, _ = jax.jit(env.init)(jax.random.PRNGKey(7))
    diff = False
    for a, b in zip(jax.tree_util.tree_leaves(s1.bodies),
                    jax.tree_util.tree_leaves(s3.bodies)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            diff = True
    assert diff


def test_fixed_world_flag():
    cfg = CFG.replace(sim_flags=CFG.sim_flags | SimFlags.UseFixedWorld)
    env2 = HideAndSeekEnv(cfg)
    state, _ = jax.jit(env2.init)(jax.random.PRNGKey(5))
    # Every world gets level key 0 -> identical walls and box layouts.
    p = np.asarray(state.bodies.pos)
    for w in range(1, W):
        np.testing.assert_allclose(p[w], p[0], atol=1e-6)


def test_seekers_frozen_in_prep(env, init_state):
    """Seeker movement is gated until step 95 (src/sim.cpp:206-208)."""
    state, _ = init_state
    # Full-forward action for everyone.
    actions = jnp.full((W, A, 5), 2, jnp.int32).at[..., 1].set(4) \
        .at[..., 3:].set(0)
    state2, _ = jax.jit(env.step)(state, actions)
    types = np.asarray(state.agent_type)
    from marl_hideandseek_tpu.types import body_slot_ranges, AGENT_SEEKER
    _, _, (alo, ahi) = body_slot_ranges(CFG)
    moved = np.linalg.norm(
        np.asarray(state2.bodies.pos[:, alo:ahi, :2])
        - np.asarray(state.bodies.pos[:, alo:ahi, :2]), axis=-1)
    seekers = types == AGENT_SEEKER
    assert (moved[seekers] < 1e-4).all()
    assert (moved[~seekers] > 1e-3).any()


def test_3v3_full_capacity_soak():
    """Long-horizon soak at the reference training recipe's config
    (jax_train.sh:33-34 — 3 hiders + 3 seekers, all 6 agent slots
    active) with random actions including grab/lock, for 2+ full
    episodes of substeps. Pins the regime long training runs operate
    in: no NaN, nothing ejected, velocities bounded, and the grab tool
    actually engaged at least once during the soak."""
    cfg = EnvConfig(
        num_worlds=2,
        min_hiders=3, max_hiders=3, min_seekers=3, max_seekers=3,
        sim_flags=SimFlags.ZeroAgentVelocity,
    )
    env3 = HideAndSeekEnv(cfg)
    state, _ = jax.jit(env3.init)(jax.random.PRNGKey(11))
    n_steps = 2 * cfg.episode_len + 10   # 2 full episodes + reset

    def body(carry, key):
        st, grabbed = carry
        st, result = env3.step(st, random_actions(key, 2, 6))
        grabbed = grabbed | (st.grab.target >= 0).any()
        return (st, grabbed), (result.rewards, st.bodies.pos,
                               st.bodies.vel)

    keys = jax.random.split(jax.random.PRNGKey(3), n_steps)
    (state, grabbed), (rews, poss, vels) = jax.jit(
        lambda c, k: jax.lax.scan(body, c, k))((state, False), keys)

    assert np.asarray(state.num_hiders).tolist() == [3, 3]
    assert np.asarray(state.num_seekers).tolist() == [3, 3]
    assert np.asarray(state.agent_active).all()
    assert np.isfinite(np.asarray(rews)).all()
    assert np.isfinite(np.asarray(poss)).all()
    assert bool(grabbed), "grab tool never engaged during the soak"
    # Nothing ejected from the arena over 2 episodes, at any step.
    act = np.asarray(state.bodies.active)
    pos = np.asarray(poss)                      # [S, W, B, 3]
    assert np.abs(pos[..., :2][:, act]).max() < 30.0
    assert pos[..., 2][:, act].min() > -0.5
    # Velocities bounded (no energy injection from 6-agent contact).
    vel = np.asarray(vels)
    assert np.abs(vel[:, act]).max() < 50.0
