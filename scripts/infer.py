"""Inference / evaluation entrypoint (reference: scripts/jax_infer.py).

Loads a training checkpoint (any ensemble size, via eval_load_ckpt with
the reference's single_policy / train_only selectors), runs eval episodes
on a fixed-world sim with round-robin team-vs-team matchups, prints
per-policy ELOs and episode scores, and can stream per-step sim
checkpoints to a binary record log for the 2-D/3-D replay viewers
(reference record path: jax_infer.py:102-129 io_callback + tofile).

Drives the packed (worlds-minor) env — the same layout the trainer's
rollout used, so the checkpointed obs-normalizer stats apply as-is.

Usage:
  python scripts/infer.py --ckpt-path ckpts/run/500 --num-worlds 16 \
      --num-steps 3600 --record-log record.bin [--train-only]
      [--single-policy K] [--deterministic]
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
from marl_hideandseek_tpu.env.checkpoint import (
    pack_checkpoints, save_checkpoints)
from marl_hideandseek_tpu.env.packed import PackedEnv, unpack_state
from marl_hideandseek_tpu.policy import make_policy
from marl_hideandseek_tpu.models import DiscreteActionDistributions
from marl_hideandseek_tpu.train import print_elos
from marl_hideandseek_tpu.train.evaluate import eval_load_ckpt
from marl_hideandseek_tpu.train.rollout import apply_ensemble


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-path", type=str, required=True)
    p.add_argument("--num-worlds", type=int, default=16)
    p.add_argument("--num-steps", type=int, default=3600)
    p.add_argument("--num-hiders", type=int, default=3)
    p.add_argument("--num-seekers", type=int, default=3)
    p.add_argument("--record-log", type=str, default=None)
    p.add_argument("--print-obs", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--single-policy", type=int, default=None,
                   help="evaluate one policy against itself "
                        "(reference: eval_load_ckpt single_policy)")
    p.add_argument("--train-only", action="store_true",
                   help="drop past policies from the eval population")
    return p.parse_args()


def main():
    args = parse_args()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    cfg = EnvConfig(
        num_worlds=args.num_worlds,
        min_hiders=args.num_hiders, max_hiders=args.num_hiders,
        min_seekers=args.num_seekers, max_seekers=args.num_seekers,
        sim_flags=SimFlags.UseFixedWorld | SimFlags.ZeroAgentVelocity,
        rand_seed=5,
    )
    penv = PackedEnv(cfg)
    policy = make_policy(dtype=dtype)
    params, obs_stats, elo = eval_load_ckpt(
        policy, args.ckpt_path, single_policy=args.single_policy,
        train_only=args.train_only)
    n_pol = jax.tree_util.tree_leaves(params)[0].shape[0]
    norm = policy.obs_preprocess
    n_agents = args.num_worlds * cfg.max_agents

    # Round-robin team-vs-team matchups over the policy axis, keyed by
    # actual team membership per step (hiders play t0, seekers t1;
    # the pairing covers both orders across worlds) — valid for any
    # hider/seeker composition.
    w_idx = jnp.arange(args.num_worlds)
    t0 = (w_idx % n_pol).astype(jnp.int32)
    t1 = ((w_idx + 1 + (w_idx // n_pol)) % n_pol).astype(jnp.int32)

    def team_assigns(env_state):
        from marl_hideandseek_tpu.types import AGENT_HIDER
        # env_state is packed (worlds-minor): agent_type is [A, W].
        is_h = (env_state.agent_type == AGENT_HIDER).T       # [W, A]
        return jnp.where(
            is_h, t0[:, None], t1[:, None]).reshape(-1).astype(jnp.int32)

    def flat(o):
        return jax.tree.map(
            lambda x: x.reshape((n_agents,) + x.shape[2:]), norm.prep(o))

    @jax.jit
    def eval_step(env_state, obs, rnn_states, key):
        normalized = norm.normalize(obs_stats, obs)
        logits, _, new_rnn = apply_ensemble(
            policy, params, rnn_states, normalized,
            team_assigns(env_state), n_pol)
        dists = DiscreteActionDistributions((5, 5, 5, 2, 2), logits)
        if args.deterministic:
            actions = dists.best()
        else:
            actions = dists.sample(key)
        ap = jnp.moveaxis(
            actions.reshape(args.num_worlds, cfg.max_agents, -1), 0, -1)
        env_state, result = penv.step(env_state, ap)
        next_obs = flat(result.obs)
        dones = result.dones.T.reshape(-1).astype(bool)
        new_rnn = policy.actor_critic.clear_recurrent_state(new_rnn, dones)
        ckpt_blob = pack_checkpoints(
            save_checkpoints(cfg, unpack_state(env_state)))
        return env_state, next_obs, new_rnn, result, ckpt_blob

    env_state, result0 = jax.jit(penv.init)(jax.random.PRNGKey(7))
    obs = flat(result0.obs)
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
        finished = np.asarray(result.episode_results).T   # [W, 2]
        dones = np.asarray(result.dones)[0].astype(bool)  # [W]
        if dones.any():
            wins += finished[dones].sum(0)
            print(f"step {i}: episode scores {finished[dones]}")
        if args.print_obs:
            print({k: np.asarray(v)[0, 0] for k, v in result.obs.items()})
    print(f"total wins by team slot: {wins}")
    print_elos(elo)
    if record_f is not None:
        record_f.close()
        print(f"checkpoint record log -> {args.record_log}")


if __name__ == "__main__":
    main()
