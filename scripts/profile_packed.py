"""Phase breakdown of PackedEnv.step (TPU): jitted prefixes of the packed
step pipeline, cumulative timings.

Usage: python scripts/profile_packed.py [num_worlds]
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
    env = P.PackedEnv(cfg)
    ps, _ = jax.jit(env.init)(jax.random.PRNGKey(5))
    actions = jnp.full((cfg.max_agents, 5, w), 2, jnp.int32)
    actions = actions.at[:, 3:].set(0)

    def pre(ps, actions):
        ext_force, ext_torque = P._movement_packed(cfg, ps, actions)
        ps = P._action_system_packed(cfg, ps, actions, ps.act_hit_t,
                                     ps.act_hit_id)
        return ps, ext_force, ext_torque

    bench("1 movement+actions", pre, ps, actions)

    def kern(ps, actions):
        ps2, f, tq = pre(ps, actions)
        bodies, sweep = pallas_step.fused_step_packed(cfg, ps2, f, tq)
        return bodies, sweep

    bench("2 + fused kernel", kern, ps, actions)

    def rewards(ps, actions):
        ps2, f, tq = pre(ps, actions)
        bodies, sweep = pallas_step.fused_step_packed(cfg, ps2, f, tq)
        ps2 = ps2.replace(bodies=bodies)
        if cfg.zero_agent_velocity:
            ps2 = P._zero_agent_velocities_packed(cfg, ps2)
        team_r = jnp.where(sweep.rew_seen, -1.0, 1.0)
        ps2 = ps2.replace(hider_team_reward=team_r)
        rw, dn = P._rewards_dones_packed(cfg, ps2, team_r)
        ps2 = P._episode_results_packed(cfg, ps2, team_r)
        return ps2, sweep, rw, dn

    bench("3 + zerovel+rewards", rewards, ps, actions)

    def obs_only(ps, actions):
        ps2, sweep, rw, dn = rewards(ps, actions)
        return P.build_observations_packed(cfg, ps2, sweep.vis_seen,
                                           sweep.lidar)

    bench("4 + obs assembly", obs_only, ps, actions)
    bench("full step", lambda s, a: env.step(s, a), ps, actions)


if __name__ == "__main__":
    main()
