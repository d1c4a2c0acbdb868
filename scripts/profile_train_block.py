"""Profile one 10-update AOT training block on the real chip.

Splits the observed training wall-clock into:
  - pure device compute of the fused 10-update block (block_until_ready
    around the AOT call),
  - dispatch overhead (call returns vs ready),
  - host metric readback cost (the between-block logging path).

Usage: python scripts/profile_train_block.py [--num-worlds 1024]
       [--pbt 2 2] [--blocks 5] [--no-pbt]

Reference context: the reference logs FPS per 10 updates from inside the
compiled loop (jax_train.py:182-224); our default reads the device metric
ring between AOT blocks instead (see scripts/train.py).
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
from jax import lax

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.policy import make_policy
from marl_hideandseek_tpu.train import (
    ActionsConfig, PBTConfig, PPOConfig, ParamExplore, TrainConfig,
    aot_compile, init_training,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-worlds", type=int, default=1024)
    p.add_argument("--blocks", type=int, default=5)
    p.add_argument("--block-size", type=int, default=10)
    p.add_argument("--no-pbt", action="store_true")
    p.add_argument("--num-minibatches", type=int, default=1,
                   help="PPO minibatches; raise to fit large world counts "
                        "(peak activation memory divides by this)")
    p.add_argument("--trace-dir", type=str, default=None,
                   help="write a jax.profiler trace of one block")
    args = p.parse_args()

    env = HideAndSeekEnv(EnvConfig(
        num_worlds=args.num_worlds,
        min_hiders=2, max_hiders=2, min_seekers=2, max_seekers=2,
        sim_flags=(SimFlags.RandomFlipTeams | SimFlags.UseFixedWorld |
                   SimFlags.ZeroAgentVelocity),
        rand_seed=5,
        num_pbt_policies=0 if args.no_pbt else 2,
    ))
    if args.no_pbt:
        pbt = None
        lr: object = 1e-4
        ent: object = 0.01
    else:
        pbt = PBTConfig(num_teams=2, team_size=2, num_train_policies=2,
                        num_past_policies=2, self_play_portion=0.0,
                        cross_play_portion=0.0, past_play_portion=1.0)
        lr = ParamExplore(base=1e-4, min_scale=0.1, max_scale=10.0,
                          log10_scale=True)
        ent = ParamExplore(base=0.01, min_scale=0.1, max_scale=10.0,
                           log10_scale=True)

    cfg = TrainConfig(
        num_worlds=args.num_worlds,
        num_agents_per_world=4,
        num_updates=1000,
        actions=ActionsConfig(actions_num_buckets=[5, 5, 5, 2, 2]),
        steps_per_update=40,
        num_bptt_chunks=4,
        lr=lr, gamma=0.998, gae_lambda=0.95,
        algo=PPOConfig(num_mini_batches=args.num_minibatches,
                       clip_coef=0.2,
                       value_loss_coef=1.0, entropy_coef=ent,
                       max_grad_norm=5, num_epochs=2,
                       clip_value_loss=False),
        pbt=pbt,
        dreamer_v3_critic=True,
        compute_dtype=jnp.bfloat16,
        seed=5,
        metrics_buffer_size=args.block_size,
        ppo_group_trainable=not args.no_pbt,
    )
    policy = make_policy(dtype=jnp.bfloat16, action_buckets=(5, 5, 5, 2, 2))
    mgr = init_training(jax.devices()[0], cfg, env, policy)

    def block(m):
        return lax.fori_loop(0, args.block_size, lambda i, mm:
                             mm.update_iter(), m)

    t0 = time.perf_counter()
    block_c = aot_compile(block, mgr)
    print(f"compile: {time.perf_counter() - t0:.1f}s", flush=True)

    env_steps = args.num_worlds * 40 * args.block_size

    # Warm up twice (tunnel backend relayouts on first re-entry).
    for _ in range(2):
        err, mgr = block_c(mgr)
        jax.block_until_ready(mgr.state.params)

    rows = []
    for i in range(args.blocks):
        t0 = time.perf_counter()
        err, mgr = block_c(mgr)
        t_call = time.perf_counter() - t0
        jax.block_until_ready(mgr.state.params)
        t_ready = time.perf_counter() - t0

        t1 = time.perf_counter()
        st = mgr.state
        host = jax.device_get(
            (st.update_idx, st.metrics, st.hyper_params, st.elo))
        t_host = time.perf_counter() - t1
        rows.append((t_call, t_ready, t_host))
        print(f"block {i}: call-return {t_call*1e3:8.1f} ms | "
              f"ready {t_ready*1e3:8.1f} ms | metric readback "
              f"{t_host*1e3:7.1f} ms | {env_steps / t_ready:,.0f} steps/s",
              flush=True)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            err, mgr = block_c(mgr)
            jax.block_until_ready(mgr.state.params)
        print(f"trace written to {args.trace_dir}")

    best_ready = min(r[1] for r in rows)
    med_host = sorted(r[2] for r in rows)[len(rows) // 2]
    print(f"\nbest block: {best_ready:.3f}s = "
          f"{env_steps / best_ready:,.0f} env-steps/s fused; "
          f"metric readback {med_host*1e3:.0f} ms/block "
          f"({med_host / (best_ready + med_host) * 100:.0f}% of loop)")


if __name__ == "__main__":
    main()
