"""Isolated-piece timings of the packed step (TPU).

Usage: python scripts/profile_pieces.py [num_worlds]
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
from marl_hideandseek_tpu.env import packed as P
from marl_hideandseek_tpu.ops import pallas_step


def bench(name, fn, *args, iters=30):
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
    env = P.PackedEnv(cfg)
    ps, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    actions = jnp.full((cfg.max_agents, 5, w), 2, jnp.int32)
    actions = actions.at[:, 3:].set(0)
    n_body = cfg.num_dyn_bodies
    f = jnp.zeros((n_body, 3, w))
    tq = jnp.zeros((n_body, 3, w))

    bench("movement only", lambda s, a: P._movement_packed(cfg, s, a),
          ps, actions)
    bench("action system only",
          lambda s, a: P._action_system_packed(cfg, s, a, s.act_hit_t,
                                               s.act_hit_id),
          ps, actions)
    bench("kernel only (fixed f)",
          lambda s: pallas_step.fused_step_packed(cfg, s, f, tq), ps)
    sweep = jax.jit(
        lambda s: pallas_step.fused_step_packed(cfg, s, f, tq)[1])(ps)
    bench("zerovel+rewards+episode only",
          lambda s, t: (P._zero_agent_velocities_packed(cfg, s),
                        P._rewards_dones_packed(cfg, s, t),
                        P._episode_results_packed(cfg, s, t)),
          ps, jnp.ones((w,)))
    bench("obs assembly only",
          lambda s, sv, sl: P.build_observations_packed(cfg, s, sv, sl),
          ps, sweep.vis_seen, sweep.lidar)


if __name__ == "__main__":
    main()
