"""Golden-trajectory regression test.

Locks the seeded semantics of the environment (level layout, rewards,
episode bookkeeping) against a committed reference trace, the BASELINE.md
parity mechanism applied to our own build: any change to level generation,
physics, rewards, or RNG structure that alters seeded behavior fails here
and must be intentional (regenerate with scripts/gen_golden.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_trace.npz")

W = 2
CFG = EnvConfig(
    num_worlds=W, min_hiders=2, max_hiders=2, min_seekers=2, max_seekers=2,
    sim_flags=SimFlags.ZeroAgentVelocity, rand_seed=5)


def generate_trace():
    env = HideAndSeekEnv(CFG)
    state, result = jax.jit(env.init)(jax.random.PRNGKey(5))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(17)

    traj_pos = [np.asarray(state.bodies.pos)]
    traj_rewards = []
    for i in range(10):
        key, sub = jax.random.split(key)
        k1, k2 = jax.random.split(sub)
        move = jax.random.randint(k1, (W, CFG.max_agents, 3), 0, 5)
        gl = jax.random.randint(k2, (W, CFG.max_agents, 2), 0, 2)
        state, result = step(state, jnp.concatenate([move, gl], -1))
        traj_pos.append(np.asarray(state.bodies.pos))
        traj_rewards.append(np.asarray(result.rewards))
    return {
        "init_wall_pos": np.asarray(state.statics.wall_pos),
        "init_wall_active": np.asarray(state.statics.wall_active),
        "traj_pos": np.stack(traj_pos),
        "traj_rewards": np.stack(traj_rewards),
        "num_boxes": np.asarray(state.num_active_boxes),
        "agent_types": np.asarray(state.agent_type),
    }


@pytest.mark.skipif(not os.path.exists(GOLDEN_PATH),
                    reason="golden trace not generated yet")
def test_golden_trace():
    got = generate_trace()
    want = np.load(GOLDEN_PATH)
    for k in want.files:
        np.testing.assert_allclose(
            got[k], want[k], atol=5e-4, rtol=1e-3,
            err_msg=f"seeded-semantics drift in {k}")


if __name__ == "__main__":
    np.savez(GOLDEN_PATH, **generate_trace())
    print(f"wrote {GOLDEN_PATH}")
