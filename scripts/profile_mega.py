"""Production-path phase timing: megastep kernel alone vs the full
PackedEnv.step (reset cond + obs assembly residue), with a forced
device_get readback (the tunnel's block_until_ready can lie).

Usage: python scripts/profile_mega.py [num_worlds]
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
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf[..., :1])
    dt = (time.perf_counter() - start) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
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

    bench("megastep kernel only",
          lambda ps, a: pallas_step.megastep_packed(cfg, ps, a),
          ps, actions)

    def mega_resets(ps, a):
        ps2, sweep, rewards, dones, team_r = pallas_step.megastep_packed(
            cfg, ps, a)
        # reset phase as in PackedEnv.step
        resets = jnp.zeros((w,), jnp.int32)
        auto = ps2.step == cfg.episode_len - 1
        trigger = (resets != 0) | auto

        def no_resets(p):
            return p.replace(step=p.step + 1)

        def do_resets(p):
            return no_resets(p)

        ps2 = jax.lax.cond(jnp.any(trigger), do_resets, no_resets, ps2)
        return ps2, rewards

    bench("+ trivial reset cond", mega_resets, ps, actions)

    def mega_obs_nocond(ps, a):
        ps2, sweep, rewards, dones, team_r = pallas_step.megastep_packed(
            cfg, ps, a)
        ps2 = ps2.replace(step=ps2.step + 1,
                          act_hit_t=sweep.act_t, act_hit_id=sweep.act_id)
        obs = P.build_observations_packed(cfg, ps2, sweep.vis_seen,
                                          sweep.lidar)
        return ps2, obs, rewards

    bench("megastep + obs, NO reset cond", mega_obs_nocond, ps, actions)

    def mega_cond_diff(ps, a):
        """Cond with genuinely different branches carrying the FULL state:
        measures XLA's untaken-branch copy cost."""
        ps2, sweep, rewards, dones, team_r = pallas_step.megastep_packed(
            cfg, ps, a)
        trigger = ps2.step == cfg.episode_len - 1

        def no_resets(p):
            return p.replace(step=p.step + 1)

        def do_resets(p):
            return jax.tree.map(lambda x: x + jnp.ones_like(x), p)

        ps2 = jax.lax.cond(jnp.any(trigger), do_resets, no_resets, ps2)
        obs = P.build_observations_packed(cfg, ps2, sweep.vis_seen,
                                          sweep.lidar)
        return ps2, obs, rewards

    bench("mega + obs + full-state cond (diff br)", mega_cond_diff,
          ps, actions)

    from marl_hideandseek_tpu.env.env import SweepResults

    def step_like(ps, a, which):
        """PackedEnv.step structure with selectable do_resets content."""
        resets = jnp.zeros((w,), jnp.int32)
        base_key = jax.random.PRNGKey(cfg.rand_seed)
        ps2, sweep, rewards, dones, team_r = pallas_step.megastep_packed(
            cfg, ps, a)
        auto = ps2.step == cfg.episode_len - 1
        trigger = (resets != 0) | auto

        def no_resets(p):
            return p.replace(step=p.step + 1), sweep

        def do_trivial(p):
            return p.replace(step=jnp.zeros_like(p.step)), sweep

        def do_real(p):
            state = P.unpack_state(p)
            wm_sweep = SweepResults(
                vis_seen=jnp.moveaxis(sweep.vis_seen, -1, 0),
                lidar=jnp.moveaxis(sweep.lidar, -1, 0),
                act_t=jnp.moveaxis(sweep.act_t, -1, 0),
                act_id=jnp.moveaxis(sweep.act_id, -1, 0),
                rew_seen=sweep.rew_seen,
            )
            state, wm_sweep = env.classic._apply_resets(
                state, wm_sweep, trigger, resets, base_key)
            return P.pack_state(state), SweepResults(
                vis_seen=jnp.moveaxis(wm_sweep.vis_seen, 0, -1),
                lidar=jnp.moveaxis(wm_sweep.lidar, 0, -1),
                act_t=jnp.moveaxis(wm_sweep.act_t, 0, -1),
                act_id=jnp.moveaxis(wm_sweep.act_id, 0, -1),
                rew_seen=wm_sweep.rew_seen,
            )

        br = {"trivial": do_trivial, "real": do_real}[which]
        ps2, sweep2 = jax.lax.cond(jnp.any(trigger), br, no_resets, ps2)
        ps2 = ps2.replace(act_hit_t=sweep2.act_t,
                          act_hit_id=sweep2.act_id)
        return ps2, env._result(ps2, sweep2, rewards, dones, team_r)

    bench("step structure, trivial reset branch",
          lambda p, a: step_like(p, a, "trivial"), ps, actions)
    bench("step structure, real reset branch",
          lambda p, a: step_like(p, a, "real"), ps, actions)

    def full(ps, a):
        return env.step(ps, a)

    bench("full PackedEnv.step", full, ps, actions)

    def full_obs(ps, a):
        ps2, res = env.step(ps, a)
        return ps2, res.obs

    bench("full step + obs (bench protocol)", full_obs, ps, actions)


if __name__ == "__main__":
    main()
