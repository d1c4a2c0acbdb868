"""Cumulative-phase breakdown of env.step (TPU): bisects where the step
time goes by benchmarking jitted prefixes of the step pipeline.

Usage: python scripts/profile_break.py [num_worlds]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv, observations
from marl_hideandseek_tpu.env.env import SweepResults
from marl_hideandseek_tpu.ops import pallas_step


def bench(name, fn, *args, iters=20):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters
    print(f"{name:38s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    cfg = EnvConfig(
        num_worlds=w, min_hiders=2, max_hiders=2, min_seekers=2,
        max_seekers=2,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams)
    env = HideAndSeekEnv(cfg)
    state, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    actions = jnp.full((w, cfg.max_agents, 5), 2, jnp.int32)
    actions = actions.at[..., 3:].set(0)

    def pre(state, actions):
        return jax.vmap(functools.partial(env._pre_physics, cfg))(
            state, actions.astype(jnp.int32), state.act_hit_t,
            state.act_hit_id)

    bench("1 pre_physics", pre, state, actions)

    def kern(state, actions):
        st, f, tq = pre(state, actions)
        bodies, sweep = pallas_step.fused_step(cfg, st, f, tq)
        return bodies, sweep

    bench("2 + fused kernel", kern, state, actions)

    def reward(state, actions):
        st, f, tq = pre(state, actions)
        bodies, sweep = pallas_step.fused_step(cfg, st, f, tq)
        sweep = SweepResults(*sweep)
        st = st.replace(bodies=bodies)
        st = jax.vmap(functools.partial(
            __import__("marl_hideandseek_tpu.env.env", fromlist=["x"]).
            _zero_agent_velocities, cfg))(st)
        st, team_r, rew, dones = jax.vmap(
            functools.partial(env._reward_phase, cfg))(st, sweep.rew_seen)
        return st, sweep, rew, dones

    bench("3 + zero-vel + rewards", reward, state, actions)

    def with_cond(state, actions):
        st, sweep, rew, dones = reward(state, actions)
        auto = st.step == cfg.episode_len - 1
        trigger = auto

        def advance(s):
            return s.replace(step=s.step + 1)

        def do_resets(s):
            return advance(s), env._standalone_sweep(s)

        def no_resets(s):
            return advance(s), sweep

        st, sweep = jax.lax.cond(
            jnp.any(trigger), do_resets, no_resets, st)
        return st, sweep, rew, dones

    bench("4 + reset cond", with_cond, state, actions)

    def full(state, actions):
        st, sweep, rew, dones = with_cond(state, actions)
        st = st.replace(act_hit_t=sweep.act_t, act_hit_id=sweep.act_id)
        return st, env._assemble(st, sweep, rew, dones)

    bench("5 + assemble (== full step)", full, state, actions)
    bench("real step", lambda s, a: env.step(s, a), state, actions)

    # Physics substep scaling: separates the once-per-step manifold build
    # from the per-substep solve cost inside the fused kernel.
    for nsub in (1, 4):
        cfg_n = cfg.replace(num_physics_substeps=nsub)
        bench(f"fused kernel (substeps={nsub})",
              lambda s, a, c=cfg_n: pallas_step.fused_step(
                  c, pre(s, a)[0], pre(s, a)[1], pre(s, a)[2]),
              state, actions)


if __name__ == "__main__":
    main()
