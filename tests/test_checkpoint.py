"""Sim-state checkpoint tests: save/load round trip and replay determinism
(the reference's record/replay QA mechanism, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.env.checkpoint import (
    pack_checkpoints,
    save_checkpoints,
    unpack_checkpoints,
)

W = 2
CFG = EnvConfig(num_worlds=W, min_hiders=2, max_hiders=2, min_seekers=2,
                max_seekers=2, sim_flags=SimFlags.ZeroAgentVelocity)


def random_actions(key):
    k1, k2 = jax.random.split(key)
    move = jax.random.randint(k1, (W, CFG.max_agents, 3), 0, 5)
    gl = jax.random.randint(k2, (W, CFG.max_agents, 2), 0, 2)
    return jnp.concatenate([move, gl], axis=-1)


@pytest.fixture(scope="module")
def env():
    return HideAndSeekEnv(CFG)


@pytest.fixture(scope="module")
def mid_episode_state(env):
    state, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    for i in range(5):
        key, sub = jax.random.split(key)
        state, _ = step(state, random_actions(sub))
    return state


def test_save_load_roundtrip(env, mid_episode_state):
    state = mid_episode_state
    ckpt = jax.jit(env.save_checkpoints)(state)
    # Load into a *fresh* env state: must reproduce the world exactly.
    fresh, _ = jax.jit(env.init)(jax.random.PRNGKey(99))
    loaded, result = jax.jit(env.load_checkpoints)(
        fresh, ckpt, jnp.ones((W,), jnp.int32))

    np.testing.assert_allclose(np.asarray(loaded.bodies.pos),
                               np.asarray(state.bodies.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.bodies.quat),
                               np.asarray(state.bodies.quat), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(loaded.bodies.locked),
                                  np.asarray(state.bodies.locked))
    np.testing.assert_array_equal(np.asarray(loaded.step),
                                  np.asarray(state.step))
    # Walls regenerate identically from the stored level key.
    np.testing.assert_allclose(np.asarray(loaded.statics.wall_pos),
                               np.asarray(state.statics.wall_pos),
                               atol=1e-6)


def test_replay_determinism(env, mid_episode_state):
    """Stepping from a loaded checkpoint matches stepping the original."""
    state = mid_episode_state
    ckpt = jax.jit(env.save_checkpoints)(state)
    fresh, _ = jax.jit(env.init)(jax.random.PRNGKey(123))
    loaded, _ = jax.jit(env.load_checkpoints)(
        fresh, ckpt, jnp.ones((W,), jnp.int32))

    step = jax.jit(env.step)
    key = jax.random.PRNGKey(42)
    s_a, s_b = state, loaded
    for i in range(3):
        key, sub = jax.random.split(key)
        acts = random_actions(sub)
        s_a, r_a = step(s_a, acts)
        s_b, r_b = step(s_b, acts)
    np.testing.assert_allclose(np.asarray(s_a.bodies.pos),
                               np.asarray(s_b.bodies.pos), atol=1e-5)
    for k in r_a.obs:
        np.testing.assert_allclose(np.asarray(r_a.obs[k]),
                                   np.asarray(r_b.obs[k]), atol=1e-4,
                                   err_msg=k)


def test_pack_unpack(env, mid_episode_state):
    ckpt = jax.jit(env.save_checkpoints)(mid_episode_state)
    packed = pack_checkpoints(ckpt)
    assert packed.dtype == jnp.uint8
    assert packed.shape[0] == W
    restored = unpack_checkpoints(CFG, packed)
    for a, b in zip(jax.tree_util.tree_leaves(ckpt),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
