"""Equivalence of the worlds-minor packed step (env/packed.py) with the
classic step — states and observations must match step for step, including
across grab/lock activity and the episode-reset boundary."""

import numpy as np
import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.env.packed import (
    PackedEnv,
    pack_actions,
    pack_state,
    reference_obs,
    unpack_state,
)

W = 4
CFG = EnvConfig(
    num_worlds=W,
    min_hiders=2, max_hiders=2, min_seekers=2, max_seekers=2,
    sim_flags=SimFlags.ZeroAgentVelocity,
)
A = CFG.max_agents


def random_actions(key):
    k1, k2 = jax.random.split(key)
    move = jax.random.randint(k1, (W, A, 3), 0, 5)
    gl = jax.random.randint(k2, (W, A, 2), 0, 2)
    return jnp.concatenate([move, gl], axis=-1)


def assert_state_close(a, b, atol=1e-5):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        la, lb = np.asarray(la), np.asarray(lb)
        if la.dtype == bool or np.issubdtype(la.dtype, np.integer):
            np.testing.assert_array_equal(la, lb)
        else:
            np.testing.assert_allclose(la, lb, atol=atol)


def test_packed_step_matches_classic():
    env = HideAndSeekEnv(CFG)
    penv = PackedEnv(CFG)
    state, res = jax.jit(env.init)(jax.random.PRNGKey(5))
    ps = pack_state(state)

    cstep = jax.jit(env.step)
    pstep = jax.jit(penv.step)

    key = jax.random.PRNGKey(0)
    for i in range(6):
        key, sub = jax.random.split(key)
        actions = random_actions(sub)
        state, cres = cstep(state, actions)
        ps, pres = pstep(ps, pack_actions(actions))

        assert_state_close(unpack_state(ps), state)
        ref = reference_obs(CFG, pres.obs)
        for k in cres.obs:
            np.testing.assert_allclose(
                np.asarray(ref[k]), np.asarray(cres.obs[k]), atol=1e-4,
                err_msg=f"obs[{k}] step {i}")
        np.testing.assert_allclose(
            np.asarray(pres.rewards.T), np.asarray(cres.rewards[..., 0]),
            atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(pres.dones.T), np.asarray(cres.dones[..., 0]))
        np.testing.assert_allclose(
            np.asarray(pres.episode_results.T),
            np.asarray(cres.episode_results), atol=1e-6)


def test_packed_episode_reset_matches():
    """Cross the auto-reset boundary in both paths."""
    env = HideAndSeekEnv(CFG)
    penv = PackedEnv(CFG)
    state, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    state = state.replace(
        step=jnp.full((W,), CFG.episode_len - 2, jnp.int32))
    ps = pack_state(state)

    cstep = jax.jit(env.step)
    pstep = jax.jit(penv.step)
    actions = random_actions(jax.random.PRNGKey(9))
    for _ in range(3):   # step 238 -> 239 (reset) -> 0
        state, _ = cstep(state, actions)
        ps, _ = pstep(ps, pack_actions(actions))
    assert_state_close(unpack_state(ps), state)
    assert int(unpack_state(ps).step[0]) == 1


def test_packed_external_reset_matches():
    env = HideAndSeekEnv(CFG)
    penv = PackedEnv(CFG)
    state, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    ps = pack_state(state)
    actions = random_actions(jax.random.PRNGKey(3))
    resets = jnp.zeros((W,), jnp.int32).at[2].set(1)
    state, _ = jax.jit(env.step)(state, actions, resets)
    ps, _ = jax.jit(penv.step)(ps, pack_actions(actions), resets)
    assert_state_close(unpack_state(ps), state)


def test_packed_init_matches():
    env = HideAndSeekEnv(CFG)
    penv = PackedEnv(CFG)
    state, cres = jax.jit(env.init)(jax.random.PRNGKey(5))
    ps, pres = jax.jit(penv.init)(jax.random.PRNGKey(5))
    assert_state_close(unpack_state(ps), state)
    ref = reference_obs(CFG, pres.obs)
    for k in cres.obs:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(cres.obs[k]), atol=1e-4,
            err_msg=f"obs[{k}]")


def test_packed_compact_reset_matches_classic():
    """The packed-native compact (gather/regen/scatter over lane columns)
    staggered-reset path must match the classic env's compact path."""
    cfg = CFG.replace(reset_budget=2)
    cenv = HideAndSeekEnv(cfg)
    penv = PackedEnv(cfg)
    cstate, _ = jax.jit(cenv.init)(jax.random.PRNGKey(9))
    pstate = pack_state(cstate)
    actions = jnp.full((W, A, 5), 2, jnp.int32).at[..., 3:].set(0)
    cstate = cstate.replace(step=jnp.full((W,), 50, jnp.int32))
    pstate = pstate.replace(step=jnp.full((W,), 50, jnp.int32))
    resets = jnp.zeros((W,), jnp.int32).at[1].set(1).at[3].set(2)

    cstate, cres = jax.jit(cenv.step)(cstate, actions, resets)
    pstate, pres = jax.jit(penv.step)(
        pstate, pack_actions(actions), resets)
    assert_state_close(unpack_state(pstate), cstate)
    np.testing.assert_allclose(
        np.asarray(pres.obs["self_data"]),
        np.asarray(cres.obs["self_data"]), atol=1e-5)
    # Over-budget burst (all 4 worlds) falls back to the full path.
    resets_all = jnp.full((W,), 1, jnp.int32)
    cstate, _ = jax.jit(cenv.step)(cstate, actions, resets_all)
    pstate, _ = jax.jit(penv.step)(
        pstate, pack_actions(actions), resets_all)
    assert_state_close(unpack_state(pstate), cstate)


def test_regen_float_leaves_finite_or_posinf():
    """The compact-reset one-hot merge (env/packed.py::merge) assumes
    state/sweep float leaves hold ONLY finite values and +inf ray-miss
    sentinels: a NaN or -inf would be silently canonicalized to +inf by
    the merge, diverging from the classic scatter path. Pin the
    invariant at its source across seeds, resets, and steps."""
    cfg = CFG.replace(reset_budget=2)
    penv = PackedEnv(cfg)
    step = jax.jit(penv.step)

    def check(tree, what):
        for leaf in jax.tree_util.tree_leaves(tree):
            x = np.asarray(leaf)
            if not np.issubdtype(x.dtype, np.floating):
                continue
            bad = ~(np.isfinite(x) | (x == np.inf))
            assert not bad.any(), f"NaN/-inf in {what}"

    for seed in (0, 7, 123):
        state, _ = jax.jit(penv.init)(jax.random.PRNGKey(seed))
        check(state, f"init seed {seed}")
        key = jax.random.PRNGKey(seed + 1000)
        for t in range(3):
            k1, k2 = jax.random.split(jax.random.fold_in(key, t))
            move = jax.random.randint(k1, (A, 3, W), 0, 5)
            gl = jax.random.randint(k2, (A, 2, W), 0, 2)
            actions = jnp.concatenate([move, gl], axis=1)
            # Force the compact path on step 1, full resets on step 2.
            resets = (jnp.zeros((W,), jnp.int32).at[t % W].set(t == 1)
                      + (t == 2))
            state, res = step(state, actions, resets)
            check(state, f"state seed {seed} step {t}")
            check(res.obs, f"obs seed {seed} step {t}")
