"""Bisect one training update into rollout / GAE / loss-fwd / fwd+bwd /
full-ppo pieces on the real chip.

Usage: python scripts/profile_ppo.py [--num-worlds 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.policy import make_policy
from marl_hideandseek_tpu.train import (
    ActionsConfig, PBTConfig, PPOConfig, ParamExplore, TrainConfig,
    init_training,
)
from marl_hideandseek_tpu.train import ppo as ppo_mod
from marl_hideandseek_tpu.train.rollout import collect_rollout, compute_gae


def bench(name, fn, *args, iters=5):
    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(2):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - start) / iters
    print(f"{name:34s} {dt * 1e3:9.1f} ms", flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-worlds", type=int, default=1024)
    args = p.parse_args()

    env = HideAndSeekEnv(EnvConfig(
        num_worlds=args.num_worlds,
        min_hiders=2, max_hiders=2, min_seekers=2, max_seekers=2,
        sim_flags=(SimFlags.RandomFlipTeams | SimFlags.UseFixedWorld |
                   SimFlags.ZeroAgentVelocity),
        rand_seed=5, num_pbt_policies=2))
    pbt = PBTConfig(num_teams=2, team_size=2, num_train_policies=2,
                    num_past_policies=2, self_play_portion=0.0,
                    cross_play_portion=0.0, past_play_portion=1.0)
    cfg = TrainConfig(
        num_worlds=args.num_worlds, num_agents_per_world=4,
        num_updates=1000,
        actions=ActionsConfig(actions_num_buckets=[5, 5, 5, 2, 2]),
        steps_per_update=40, num_bptt_chunks=4,
        lr=ParamExplore(base=1e-4, min_scale=0.1, max_scale=10.0,
                        log10_scale=True),
        gamma=0.998, gae_lambda=0.95,
        algo=PPOConfig(num_mini_batches=1, clip_coef=0.2,
                       value_loss_coef=1.0,
                       entropy_coef=ParamExplore(
                           base=0.01, min_scale=0.1, max_scale=10.0,
                           log10_scale=True),
                       max_grad_norm=5, num_epochs=2,
                       clip_value_loss=False),
        pbt=pbt, dreamer_v3_critic=True, compute_dtype=jnp.bfloat16,
        seed=5, metrics_buffer_size=10,
        ppo_group_trainable=True)
    policy = make_policy(dtype=jnp.bfloat16, action_buckets=(5, 5, 5, 2, 2))
    mgr = init_training(jax.devices()[0], cfg, env, policy)
    st = mgr.state

    def roll(st):
        return collect_rollout(cfg, env, policy, mgr.all_params(),
                               st.obs_stats, st.rollout, st.value_stats)

    new_rollout, buffer, roll_metrics = bench("rollout (40 steps)", roll, st)

    bench("GAE", lambda b: compute_gae(cfg, b), buffer)

    tx = ppo_mod.make_optimizer(cfg)
    key = jax.random.PRNGKey(0)

    def full_ppo(params, opts, buffer):
        return ppo_mod.ppo_update(cfg, policy, tx, params, opts,
                                  st.obs_stats, st.value_stats,
                                  st.hyper_params, buffer, key)

    bench("ppo_update (2 epochs)", full_ppo, st.params, st.opt_states,
          buffer)

    # single-policy single-epoch loss fwd and fwd+bwd
    advantages, returns = jax.jit(
        lambda b: compute_gae(cfg, b))(buffer)
    data = {
        "obs": buffer.obs, "actions": buffer.actions,
        "log_probs": buffer.log_probs, "values": buffer.values,
        "dones": buffer.dones, "assignments": buffer.assignments,
        "advantages": advantages, "returns": returns,
        "rnn_start": buffer.rnn_start_states,
    }
    p0 = jax.tree.map(lambda x: x[0], st.params)

    def loss_only(p):
        a_l, v_l, ent, *_ = ppo_mod._policy_loss(
            cfg, policy, p, st.obs_stats, st.value_stats, data, 0)
        return a_l + v_l - 0.01 * ent

    bench("loss fwd (1 policy)", loss_only, p0)
    bench("loss fwd+bwd (1 policy)",
          lambda p: jax.grad(loss_only)(p), p0)


if __name__ == "__main__":
    main()
