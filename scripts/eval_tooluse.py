"""Tool-use evaluation of training checkpoints: the domain's
fort-building signal. For each checkpoint, runs a fixed-seed eval
(train policies in self-play teams) and reports per-seek-step fractions
of worlds with >= 1 locked box / >= 1 active grab, plus hidden_frac.

Usage: python scripts/eval_tooluse.py CKPT_DIR STEP [STEP ...]
       [--num-worlds 128] [--num-steps 480] [--num-hiders 2]
       [--num-seekers 2]

Reported per-seek-step world fractions: >=1 locked box, >=1 locked
ramp, >=1 active grab, any ramp displaced >0.5 from its episode spawn
(ramp-move — the ramp-use signal of the reference's late curriculum),
hiders hidden.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from marl_hideandseek_tpu.config import EnvConfig, NUM_PREP_STEPS, SimFlags
from marl_hideandseek_tpu.env.packed import PackedEnv
from marl_hideandseek_tpu.models import DiscreteActionDistributions
from marl_hideandseek_tpu.policy import make_policy
from marl_hideandseek_tpu.train import eval_load_ckpt
from marl_hideandseek_tpu.train.rollout import apply_ensemble
from marl_hideandseek_tpu.types import AGENT_HIDER, body_slot_ranges


def eval_ckpt(ckpt_path, num_worlds, num_steps, num_hiders=2,
              num_seekers=2):
    cfg = EnvConfig(
        num_worlds=num_worlds,
        min_hiders=num_hiders, max_hiders=num_hiders,
        min_seekers=num_seekers, max_seekers=num_seekers,
        sim_flags=(SimFlags.RandomFlipTeams | SimFlags.UseFixedWorld |
                   SimFlags.ZeroAgentVelocity), rand_seed=5)
    penv = PackedEnv(cfg)
    policy = make_policy(dtype=jnp.bfloat16,
                         action_buckets=(5, 5, 5, 2, 2))
    params, obs_stats, _ = eval_load_ckpt(policy, ckpt_path,
                                          train_only=True)
    n_pol = jax.tree_util.tree_leaves(params)[0].shape[0]
    norm = policy.obs_preprocess
    n_agents = num_worlds * cfg.max_agents
    (box_lo, box_hi), (ramp_lo, ramp_hi), _ = body_slot_ranges(cfg)

    def flat(o):
        return jax.tree.map(
            lambda x: x.reshape((n_agents,) + x.shape[2:]), norm.prep(o))

    w_idx = jnp.arange(num_worlds)
    t0 = (w_idx % n_pol).astype(jnp.int32)
    t1 = ((w_idx + 1) % n_pol).astype(jnp.int32)

    @jax.jit
    def step(env_state, obs, rnn, key, spawn_ramp_xy):
        is_h = (env_state.agent_type == AGENT_HIDER).T
        assigns = jnp.where(is_h, t0[:, None],
                            t1[:, None]).reshape(-1).astype(jnp.int32)
        normalized = norm.normalize(obs_stats, obs)
        logits, _, new_rnn = apply_ensemble(
            policy, params, rnn, normalized, assigns, n_pol)
        dists = DiscreteActionDistributions((5, 5, 5, 2, 2), logits)
        actions = dists.sample(key)
        ap = jnp.moveaxis(
            actions.reshape(num_worlds, cfg.max_agents, -1), 0, -1)
        pre_step = env_state.step
        env_state, result = penv.step(env_state, ap)
        dones = result.dones.T.reshape(-1).astype(bool)
        new_rnn = policy.actor_critic.clear_recurrent_state(new_rnn,
                                                            dones)
        in_seek = pre_step >= NUM_PREP_STEPS - 1
        locked_w = jnp.any(env_state.bodies.locked[box_lo:box_hi],
                           axis=0)
        ramp_locked_w = jnp.any(
            env_state.bodies.locked[ramp_lo:ramp_hi], axis=0)
        ramp_act = env_state.bodies.active[ramp_lo:ramp_hi]
        ramp_xy = env_state.bodies.pos[ramp_lo:ramp_hi, :2]  # [R, 2, W]
        ramp_moved_w = jnp.any(
            (jnp.linalg.norm(ramp_xy - spawn_ramp_xy, axis=1) > 0.5) &
            ramp_act, axis=0)
        grab_w = jnp.any(env_state.grab.target >= 0, axis=0)
        hidden_w = result.team_reward > 0.0
        # Fresh episodes re-baseline the ramp spawn positions; on the
        # reset step itself the post-step positions belong to the NEW
        # episode, so exclude it from the displacement stat.
        fresh = env_state.step == 0
        stats = (jnp.sum(in_seek),
                 jnp.sum(locked_w & in_seek),
                 jnp.sum(grab_w & in_seek),
                 jnp.sum(hidden_w & in_seek),
                 jnp.sum(ramp_locked_w & in_seek),
                 jnp.sum(ramp_moved_w & in_seek & ~fresh))
        spawn_ramp_xy = jnp.where(fresh[None, None, :], ramp_xy,
                                  spawn_ramp_xy)
        return env_state, flat(result.obs), new_rnn, stats, spawn_ramp_xy

    env_state, result0 = jax.jit(penv.init)(jax.random.PRNGKey(7))
    obs = flat(result0.obs)
    rnn = policy.actor_critic.init_recurrent_state(n_agents)
    key = jax.random.PRNGKey(11)
    spawn_ramp_xy = env_state.bodies.pos[ramp_lo:ramp_hi, :2]
    tot = np.zeros(6)
    for _ in range(num_steps):
        key, sub = jax.random.split(key)
        env_state, obs, rnn, stats, spawn_ramp_xy = step(
            env_state, obs, rnn, sub, spawn_ramp_xy)
        tot += np.asarray(jax.device_get(stats))
    seek = max(tot[0], 1.0)
    return {"seek_steps": int(tot[0]),
            "lock_frac": tot[1] / seek,
            "grab_frac": tot[2] / seek,
            "hidden_frac": tot[3] / seek,
            "ramp_lock_frac": tot[4] / seek,
            "ramp_move_frac": tot[5] / seek}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir")
    p.add_argument("steps", nargs="+", type=int)
    p.add_argument("--num-worlds", type=int, default=128)
    p.add_argument("--num-steps", type=int, default=480)
    p.add_argument("--num-hiders", type=int, default=2)
    p.add_argument("--num-seekers", type=int, default=2)
    args = p.parse_args()
    for s in args.steps:
        r = eval_ckpt(os.path.join(args.ckpt_dir, str(s)),
                      args.num_worlds, args.num_steps,
                      args.num_hiders, args.num_seekers)
        print(f"ckpt {s}: lock {r['lock_frac'] * 100:.1f}%  "
              f"grab {r['grab_frac'] * 100:.1f}%  "
              f"hidden {r['hidden_frac'] * 100:.1f}%  "
              f"ramp_lock {r['ramp_lock_frac'] * 100:.1f}%  "
              f"ramp_move {r['ramp_move_frac'] * 100:.1f}%  "
              f"({r['seek_steps']} seek world-steps)", flush=True)


if __name__ == "__main__":
    main()
