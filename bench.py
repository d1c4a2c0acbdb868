"""Throughput benchmark: env-steps/s at the benchmark-parity config.

Mirrors the reference GPU benchmark protocol (scripts/benchmark.py: 16K
worlds, 2 hiders + 2 seekers, random actions, steps x worlds / elapsed)
minus the batch renderer (no TPU analogue; see SURVEY.md §2.4 E11).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 10M env-steps/s (the BASELINE.json north-star target).

Env overrides: BENCH_WORLDS, BENCH_STEPS, BENCH_CHUNK.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

NORTH_STAR = 10_000_000.0

NUM_WORLDS = int(os.environ.get("BENCH_WORLDS", 16384))
NUM_STEPS = int(os.environ.get("BENCH_STEPS", 240))
CHUNK = int(os.environ.get("BENCH_CHUNK", 40))


def main():
    cfg = EnvConfig(
        num_worlds=NUM_WORLDS,
        min_hiders=2, max_hiders=2, min_seekers=2, max_seekers=2,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams,
        rand_seed=5,
    )
    # The benchmark drives the worlds-minor packed step (env/packed.py):
    # same semantics as HideAndSeekEnv.step (equivalence pinned by
    # tests/test_packed.py), laid out for the TPU hot loop.
    from marl_hideandseek_tpu.env.packed import PackedEnv

    env = PackedEnv(cfg)
    key = jax.random.PRNGKey(cfg.rand_seed)

    state, _ = jax.jit(env.init)(key)

    n_move = 5 if cfg.zero_agent_velocity else 11

    state0, result0 = jax.jit(lambda s: env.step(
        s, jnp.zeros((cfg.max_agents, 5, cfg.num_worlds), jnp.int32)))(
            state)

    @jax.jit
    def run_chunk(carry, base):
        # The step RESULT rides the loop carry so the observation tensors
        # are materialized every iteration (the reference benchmark's step
        # writes all exported obs tensors each step, benchmark.py:75) —
        # without this XLA dead-code-eliminates the obs assembly.
        def body(i, carry):
            state, _ = carry
            k = jax.random.fold_in(key, base + i)
            k1, k2 = jax.random.split(k)
            move = jax.random.randint(
                k1, (cfg.max_agents, 3, cfg.num_worlds), 0, n_move)
            gl = jax.random.randint(
                k2, (cfg.max_agents, 2, cfg.num_worlds), 0, 2)
            actions = jnp.concatenate([move, gl], axis=1)
            return env.step(state, actions)

        return jax.lax.fori_loop(0, CHUNK, body, carry)

    # Warmup/compile. Two rounds: the first chunk's output state can carry
    # different XLA layouts than init's output (the Pallas physics kernel
    # constrains operand layouts), and jit respecializes on the new
    # layouts — the second call absorbs that recompile so the timed loop
    # measures steady state.
    carry = run_chunk((state0, result0), 0)
    jax.block_until_ready(carry)
    carry = run_chunk(carry, CHUNK)
    jax.block_until_ready(carry)

    n_chunks = max(NUM_STEPS // CHUNK, 1)
    start = time.perf_counter()
    for c in range(n_chunks):
        carry = run_chunk(carry, (c + 1) * CHUNK)
    jax.block_until_ready(carry)
    elapsed = time.perf_counter() - start

    total_steps = n_chunks * CHUNK * NUM_WORLDS
    steps_per_sec = total_steps / elapsed

    print(json.dumps({
        "metric": f"env_steps_per_sec_{NUM_WORLDS}worlds_2v2",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_sec / NORTH_STAR, 4),
    }))


if __name__ == "__main__":
    main()
