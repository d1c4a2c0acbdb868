"""Headless soak runner (reference: src/headless.cpp).

Usage: python scripts/headless.py NUM_WORLDS NUM_STEPS [--rand-actions]
       [--record actions.npy] [--level N]

Runs the fixed reference config (3 hiders / 2 seekers, seed 5,
headless.cpp:38-44), optionally with random actions, checks for NaNs, and
prints FPS. With --record, the action stream is saved for reproduction
(the reference writes /tmp/actions, headless.cpp:12-22).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("num_worlds", type=int)
    p.add_argument("num_steps", type=int)
    p.add_argument("--rand-actions", action="store_true")
    p.add_argument("--record", type=str, default=None)
    p.add_argument("--level", type=int, default=1)
    args = p.parse_args()

    cfg = EnvConfig(
        num_worlds=args.num_worlds,
        min_hiders=3, max_hiders=3, min_seekers=2, max_seekers=2,
        sim_flags=SimFlags.Default,
        rand_seed=5,
    )
    env = HideAndSeekEnv(cfg)
    key = jax.random.PRNGKey(5)
    state, _ = jax.jit(env.init)(key)
    if args.level != 1:
        resets = jnp.full((cfg.num_worlds,), args.level, jnp.int32)
        neutral = jnp.full((cfg.num_worlds, cfg.max_agents, 5), 5,
                           jnp.int32).at[..., 3:].set(0)
        state, _ = jax.jit(env.step)(state, neutral, resets)

    n_move = 5 if cfg.zero_agent_velocity else 11
    step = jax.jit(env.step)

    recorded = []
    start = time.perf_counter()
    for i in range(args.num_steps):
        if args.rand_actions:
            k = jax.random.fold_in(key, i)
            k1, k2 = jax.random.split(k)
            move = jax.random.randint(
                k1, (cfg.num_worlds, cfg.max_agents, 3), 0, n_move)
            gl = jax.random.randint(
                k2, (cfg.num_worlds, cfg.max_agents, 2), 0, 2)
            actions = jnp.concatenate([move, gl], axis=-1)
        else:
            actions = jnp.full(
                (cfg.num_worlds, cfg.max_agents, 5), n_move // 2,
                jnp.int32).at[..., 3:].set(0)
        if args.record:
            recorded.append(np.asarray(actions))
        state, result = step(state, actions)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - start

    rewards = np.asarray(result.rewards)
    assert np.isfinite(rewards).all(), "NaN/Inf in rewards"
    print(f"FPS: {args.num_steps * args.num_worlds / elapsed:.0f}")

    if args.record:
        np.save(args.record, np.stack(recorded))
        print(f"recorded actions -> {args.record}")


if __name__ == "__main__":
    main()
