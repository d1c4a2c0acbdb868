"""Micro-profile of env.step components on the current backend.

Times each phase of the step in isolation (jitted, vmapped over worlds) to
locate the bottleneck. Usage: python scripts/profile_step.py [num_worlds]
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


def bench(name, fn, *args, iters=20):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters
    print(f"{name:30s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = EnvConfig(
        num_worlds=w, min_hiders=2, max_hiders=2, min_seekers=2,
        max_seekers=2,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.RandomFlipTeams)
    env = HideAndSeekEnv(cfg)
    state, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    actions = jnp.full((w, cfg.max_agents, 5), 2, jnp.int32)
    actions = actions.at[..., 3:].set(0)

    from marl_hideandseek_tpu.ops import pallas_physics, pallas_step

    zeros_b = jnp.zeros((w, cfg.num_dyn_bodies, 3))
    bench("physics only (batch path)", lambda b, s, g: pallas_physics.
          physics_step_batch(cfg, b, s, g, zeros_b, zeros_b),
          state.bodies, state.statics, state.grab)

    if pallas_step.use_fused(cfg, state):
        bench("fused physics+sweep kernel",
              lambda s: pallas_step.fused_step(cfg, s, zeros_b, zeros_b),
              state)

    bench("standalone sweep (3 launches)",
          lambda s: env._standalone_sweep(s), state)

    def obs_rays(state):
        q = jax.vmap(
            functools.partial(observations.obs_ray_queries, cfg))(state)
        return env._raycast(state, *q)

    t_obs, id_obs = bench("obs raycast", obs_rays, state)

    def assemble(s, i, t):
        vis, lid = jax.vmap(
            functools.partial(observations.consume_obs_sweep, cfg))(s, i, t)
        return jax.vmap(
            functools.partial(observations.build_observations, cfg)
        )(s, vis, lid)

    bench("obs consume+assembly", assemble, state, id_obs, t_obs)

    bench("full step", lambda s, a: env.step(s, a)[0], state, actions)


if __name__ == "__main__":
    main()
