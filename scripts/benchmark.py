"""Throughput benchmark CLI (reference: scripts/benchmark.py).

Usage: python scripts/benchmark.py NUM_WORLDS NUM_STEPS [NUM_HIDERS]
       [NUM_SEEKERS]

Prints env-steps/s = worlds * steps / elapsed, the reference's FPS metric
(reference: benchmark.py:89-92, headless.cpp:98-102). The paper-parity
config is `16000 1920` with 2v2 (reference README.md:39); the batch
renderer has no TPU analogue and is omitted (SURVEY.md §2.4 E11).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv


def main():
    num_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    num_hiders = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    num_seekers = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    chunk = int(os.environ.get("BENCH_CHUNK", 60))

    cfg = EnvConfig(
        num_worlds=num_worlds,
        min_hiders=num_hiders, max_hiders=num_hiders,
        min_seekers=num_seekers, max_seekers=num_seekers,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams,
        rand_seed=10,
    )
    env = HideAndSeekEnv(cfg)
    key = jax.random.PRNGKey(cfg.rand_seed)
    state, _ = jax.jit(env.init)(key)

    n_move = 5 if cfg.zero_agent_velocity else 11

    @jax.jit
    def run_chunk(state, base):
        def body(i, state):
            k = jax.random.fold_in(key, base + i)
            k1, k2 = jax.random.split(k)
            move = jax.random.randint(
                k1, (cfg.num_worlds, cfg.max_agents, 3), 0, n_move)
            gl = jax.random.randint(
                k2, (cfg.num_worlds, cfg.max_agents, 2), 0, 2)
            state, _ = env.step(
                state, jnp.concatenate([move, gl], axis=-1))
            return state
        return jax.lax.fori_loop(0, chunk, body, state)

    state = run_chunk(state, 0)  # warmup/compile
    jax.block_until_ready(state)

    n_chunks = max(num_steps // chunk, 1)
    start = time.perf_counter()
    for c in range(n_chunks):
        state = run_chunk(state, (c + 1) * chunk)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - start

    fps = n_chunks * chunk * num_worlds / elapsed
    print(f"FPS: {fps:.0f}  (worlds={num_worlds} steps={n_chunks * chunk} "
          f"elapsed={elapsed:.2f}s)")


if __name__ == "__main__":
    main()
