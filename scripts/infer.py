"""Inference / evaluation entrypoint (reference: scripts/jax_infer.py).

Loads a training checkpoint, runs eval episodes on a fixed-world sim,
prints per-policy ELOs and episode scores, and can stream per-step sim
checkpoints to a binary record log for the 2-D replay viewer
(reference record path: jax_infer.py:102-129 io_callback + tofile).

Usage:
  python scripts/infer.py --ckpt-path ckpts/run/500 --num-worlds 16 \
      --num-steps 3600 --record-log record.bin
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

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.env.checkpoint import (
    pack_checkpoints, save_checkpoints)
from marl_hideandseek_tpu.policy import make_policy
from marl_hideandseek_tpu.models import DiscreteActionDistributions
from marl_hideandseek_tpu.train import (
    ActionsConfig, PPOConfig, TrainConfig, init_training, print_elos,
)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-path", type=str, default=None)
    p.add_argument("--num-worlds", type=int, default=16)
    p.add_argument("--num-steps", type=int, default=3600)
    p.add_argument("--num-hiders", type=int, default=3)
    p.add_argument("--num-seekers", type=int, default=3)
    p.add_argument("--record-log", type=str, default=None)
    p.add_argument("--print-obs", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--deterministic", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    env = HideAndSeekEnv(EnvConfig(
        num_worlds=args.num_worlds,
        min_hiders=args.num_hiders, max_hiders=args.num_hiders,
        min_seekers=args.num_seekers, max_seekers=args.num_seekers,
        sim_flags=SimFlags.UseFixedWorld | SimFlags.ZeroAgentVelocity,
        rand_seed=5,
    ))
    policy = make_policy(dtype=dtype)

    cfg = TrainConfig(
        num_worlds=args.num_worlds,
        num_agents_per_world=args.num_hiders + args.num_seekers,
        num_updates=1,
        actions=ActionsConfig(actions_num_buckets=[5, 5, 5, 2, 2]),
        steps_per_update=40,
        num_bptt_chunks=4,
        algo=PPOConfig(),
        compute_dtype=dtype,
        seed=5,
    )
    mgr = init_training(None, cfg, env, policy,
                        restore_ckpt=args.ckpt_path)

    st = mgr.state
    norm = policy.obs_preprocess
    n_agents = args.num_worlds * env.cfg.max_agents
    params = jax.tree.map(lambda x: x[0], st.params)

    @jax.jit
    def eval_step(env_state, obs, rnn_states, key):
        normalized = norm.normalize(st.obs_stats, obs)
        dists, critic_out, new_rnn = policy.actor_critic.apply(
            params, rnn_states, normalized)
        if args.deterministic:
            actions = dists.best()
        else:
            actions = dists.sample(key)
        env_state, result = env.step(
            env_state, actions.reshape(args.num_worlds, -1, 5))
        next_obs = jax.tree.map(
            lambda x: x.reshape((n_agents,) + x.shape[2:]),
            norm.prep(result.obs))
        dones = result.dones.reshape(-1).astype(bool)
        new_rnn = policy.actor_critic.clear_recurrent_state(new_rnn, dones)
        ckpt_blob = pack_checkpoints(save_checkpoints(env.cfg, env_state))
        return env_state, next_obs, new_rnn, result, ckpt_blob

    env_state = st.rollout.env_state
    obs = st.rollout.obs
    rnn = policy.actor_critic.init_recurrent_state(n_agents)
    key = jax.random.PRNGKey(7)

    record_f = None
    wins = np.zeros(2)
    for i in range(args.num_steps):
        key, sub = jax.random.split(key)
        env_state, obs, rnn, result, ckpt_blob = eval_step(
            env_state, obs, rnn, sub)
        if args.record_log is not None:
            if record_f is None:
                from marl_hideandseek_tpu.utils.ckptlog import CkptLogWriter
                blob_np = np.asarray(ckpt_blob)
                record_f = CkptLogWriter(
                    args.record_log, blob_np.shape[0], blob_np.shape[1])
            record_f.append(np.asarray(ckpt_blob))
        finished = np.asarray(result.episode_results)
        dones = np.asarray(result.dones)[:, 0, 0]
        if dones.any():
            wins += finished[dones.astype(bool)].sum(0)
            print(f"step {i}: episode scores {finished[dones.astype(bool)]}")
        if args.print_obs:
            print({k: np.asarray(v)[0, 0] for k, v in result.obs.items()})
    print(f"total wins by team slot: {wins}")
    print_elos(st.elo)
    if record_f is not None:
        record_f.close()
        print(f"checkpoint record log -> {args.record_log}")


if __name__ == "__main__":
    main()
