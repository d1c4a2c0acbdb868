"""CPU-backend throughput benchmark (reference: scripts/cpu_benchmark.py).

Usage: python scripts/cpu_benchmark.py NUM_WORLDS NUM_STEPS [H] [S]

Runs the same env on the host CPU backend (the reference's CPU
TaskGraphExecutor analogue — here the identical jitted program compiled for
CPU), printing env-steps/s. Reference parity config: 2000 worlds x 1920
steps, 2v2 (reference README.md:40). The reference's simulated
obs-to-accelerator copies have no analogue here: on TPU hosts the
observations are already device arrays.
"""

import os
import sys

# Force the CPU backend before JAX initializes (the machine may pin
# JAX_PLATFORMS to a TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax

jax.config.update("jax_platforms", "cpu")

import time

import jax.numpy as jnp

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv


def main():
    num_worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    num_hiders = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    num_seekers = int(sys.argv[4]) if len(sys.argv) > 4 else 2

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
    n_move = 5

    @jax.jit
    def chunk(state, base):
        def body(i, state):
            k = jax.random.fold_in(key, base + i)
            k1, k2 = jax.random.split(k)
            move = jax.random.randint(
                k1, (cfg.num_worlds, cfg.max_agents, 3), 0, n_move)
            gl = jax.random.randint(
                k2, (cfg.num_worlds, cfg.max_agents, 2), 0, 2)
            state, _ = env.step(state, jnp.concatenate([move, gl], -1))
            return state
        return jax.lax.fori_loop(0, 20, body, state)

    state = chunk(state, 0)
    jax.block_until_ready(state)

    n_chunks = max(num_steps // 20, 1)
    start = time.perf_counter()
    for c in range(n_chunks):
        state = chunk(state, (c + 1) * 20)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - start
    fps = n_chunks * 20 * num_worlds / elapsed
    print(f"FPS: {fps:.0f}  (CPU backend, worlds={num_worlds} "
          f"steps={n_chunks * 20} elapsed={elapsed:.2f}s)")


if __name__ == "__main__":
    main()
