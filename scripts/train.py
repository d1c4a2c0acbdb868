"""Training entrypoint.

Equivalent capability to the reference's scripts/jax_train.py: builds the
sim (RandomFlipTeams | UseFixedWorld | ZeroAgentVelocity, seed 5), a
TrainConfig with the reference hyperparameters, optional PBT, then runs the
AOT-compiled update loop in blocks of 10 updates with a host callback for
FPS/metrics logging and periodic ELO evaluation + checkpointing.

Usage (reference recipe, jax_train.sh:16-41):
  python scripts/train.py --num-worlds 1024 --num-updates 100000 \
      --ckpt-dir ckpts --tb-dir tb --run-name r0 --bf16 \
      --pbt-ensemble-size 2 --pbt-past-policies 2
"""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.policy import make_policy
from marl_hideandseek_tpu import train as mhs_train
from marl_hideandseek_tpu.train import (
    ActionsConfig, PBTConfig, PPOConfig, ParamExplore, TrainConfig,
    TensorboardWriter, WandbWriter, init_training, aot_compile,
    ring_scalar, stop_training, print_elos,
)

mhs_train.cfg_jax_mem(0.8)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", type=str, required=True)
    p.add_argument("--tb-dir", type=str, required=True)
    p.add_argument("--run-name", type=str, required=True)
    p.add_argument("--restore", type=int)

    p.add_argument("--num-worlds", type=int, required=True)
    p.add_argument("--num-updates", type=int, required=True)
    p.add_argument("--steps-per-update", type=int, default=40)
    p.add_argument("--num-bptt-chunks", type=int, default=4)
    p.add_argument("--num-minibatches", type=int, default=1)
    p.add_argument("--num-epochs", type=int, default=2)

    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--gamma", type=float, default=0.998)
    p.add_argument("--entropy-loss-coef", type=float, default=0.01)
    p.add_argument("--value-loss-coef", type=float, default=1.0)
    p.add_argument("--clip-value-loss", action="store_true")

    p.add_argument("--fp16", action="store_true")
    p.add_argument("--bf16", action="store_true")

    p.add_argument("--pbt-ensemble-size", type=int, default=0)
    p.add_argument("--pbt-past-policies", type=int, default=0)

    p.add_argument("--num-hiders", type=int, default=3)
    p.add_argument("--num-seekers", type=int, default=3)
    p.add_argument("--eval-frequency", type=int, default=500)
    p.add_argument("--profile-port", type=int, default=None)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--backbone", type=str, default="pooled",
                   choices=["pooled", "attention", "hash"])
    p.add_argument("--data-parallel", action="store_true",
                   help="shard worlds over all local chips "
                        "(('data','model') mesh; grads all-reduce on ICI)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() first "
                        "(run one process per host of the pod slice)")
    p.add_argument("--compilation-cache", type=str, default=None,
                   help="persistent XLA compilation cache dir")
    p.add_argument("--io-callback-metrics", action="store_true",
                   help="log metrics via an ordered io_callback inside the "
                        "compiled loop (the reference's scheme, "
                        "jax_train.py:236-237). Off by default: some "
                        "backends (e.g. tunneled TPU) hang compiling "
                        "programs that contain host callbacks; the default "
                        "reads the device-side metric ring buffer between "
                        "AOT blocks, which observes the identical data.")
    return p.parse_args()


def main():
    args = parse_args()

    if args.distributed:
        from marl_hideandseek_tpu.utils.runtime import init_distributed

        init_distributed()
    from marl_hideandseek_tpu.utils.runtime import (
        enable_compilation_cache)

    if args.compilation_cache:
        enable_compilation_cache(args.compilation_cache)
    else:
        enable_compilation_cache()

    env = HideAndSeekEnv(EnvConfig(
        num_worlds=args.num_worlds,
        min_hiders=args.num_hiders, max_hiders=args.num_hiders,
        min_seekers=args.num_seekers, max_seekers=args.num_seekers,
        sim_flags=(SimFlags.RandomFlipTeams | SimFlags.UseFixedWorld |
                   SimFlags.ZeroAgentVelocity),
        rand_seed=5,
        num_pbt_policies=args.pbt_ensemble_size,
    ))

    if args.fp16:
        dtype = jnp.float16
    elif args.bf16:
        dtype = jnp.bfloat16
    else:
        dtype = jnp.float32

    if args.pbt_ensemble_size != 0:
        # Asymmetric/variable team sizes are supported: matchmaking, PPO
        # grouping and ELO attribution key off agent_type, not slot
        # halves (train/rollout.py::_resample_assignments).
        pbt_cfg = PBTConfig(
            num_teams=2,
            team_size=max(args.num_hiders, args.num_seekers),
            num_train_policies=args.pbt_ensemble_size,
            num_past_policies=args.pbt_past_policies,
            self_play_portion=0.0,
            cross_play_portion=0.0,
            past_play_portion=1.0,
        )
        lr = ParamExplore(base=args.lr, min_scale=0.1, max_scale=10.0,
                          log10_scale=True)
        entropy = ParamExplore(base=args.entropy_loss_coef, min_scale=0.1,
                               max_scale=10.0, log10_scale=True)
    else:
        pbt_cfg = None
        lr = args.lr
        entropy = args.entropy_loss_coef

    cfg = TrainConfig(
        num_worlds=args.num_worlds,
        num_agents_per_world=args.num_hiders + args.num_seekers,
        num_updates=args.num_updates,
        actions=ActionsConfig(actions_num_buckets=[5, 5, 5, 2, 2]),
        steps_per_update=args.steps_per_update,
        num_bptt_chunks=args.num_bptt_chunks,
        lr=lr,
        gamma=args.gamma,
        gae_lambda=0.95,
        algo=PPOConfig(
            num_mini_batches=args.num_minibatches,
            clip_coef=0.2,
            value_loss_coef=args.value_loss_coef,
            entropy_coef=entropy,
            max_grad_norm=5,
            num_epochs=args.num_epochs,
            clip_value_loss=args.clip_value_loss,
        ),
        pbt=pbt_cfg,
        dreamer_v3_critic=True,
        compute_dtype=dtype,
        seed=5,
        metrics_buffer_size=10,
        # Grouped PPO is exact-capacity only for fixed symmetric teams
        # under pure past-play (see TrainConfig.ppo_group_trainable).
        ppo_group_trainable=(
            args.pbt_ensemble_size != 0
            and args.pbt_past_policies > 0
            and args.num_hiders == args.num_seekers),
    )

    policy = make_policy(dtype=dtype, action_buckets=(5, 5, 5, 2, 2),
                         backbone=args.backbone)

    if args.wandb:
        tb_writer = WandbWriter(os.path.join(args.tb_dir, args.run_name),
                                args=args)
    else:
        tb_writer = TensorboardWriter(os.path.join(args.tb_dir,
                                                   args.run_name))

    restore = (os.path.join(args.ckpt_dir, args.run_name, str(args.restore))
               if args.restore else None)

    mgr = init_training(jax.devices()[0], cfg, env, policy,
                        restore_ckpt=restore,
                        profile_port=args.profile_port)

    if args.data_parallel and len(jax.devices()) > 1:
        from marl_hideandseek_tpu.parallel import (
            make_mesh, shard_training_manager)

        mesh = make_mesh()
        mgr, _ = shard_training_manager(mgr, mesh)
        print(f"sharding worlds over mesh {mesh.shape}")

    last = {"time": 0.0, "update": 0}

    def _log_metrics_host_cb(update_idx, metrics, lrs, entropy_coefs, elos):
        # One device_get for the whole scalar bundle: through the tunneled
        # backend every lazy int()/float() pull is a separate device
        # roundtrip (~10s of ms each), which dominated block time in r2.
        update_idx, metrics, lrs, entropy_coefs, elos = jax.device_get(
            (update_idx, metrics, lrs, entropy_coefs, elos))
        update_id = int(update_idx)
        cur = time()
        diff = update_id - last["update"]
        print(f"Update: {update_id}")
        if last["time"] != 0:
            fps = (args.num_worlds * args.steps_per_update * diff /
                   (cur - last["time"]))
            print(f"  FPS: {fps:.0f}")
        last["time"] = cur
        last["update"] = update_id

        if args.pbt_ensemble_size > 0:
            print_elos(elos)
            for i, e in enumerate(elos):
                tb_writer.scalar(f"p{i}/elo", float(e), update_id)
            for i in range(len(lrs)):
                tb_writer.scalar(f"p{i}/lr", float(lrs[i]), update_id)
                tb_writer.scalar(f"p{i}/entropy_coef",
                                 float(entropy_coefs[i]), update_id)
        for k, v in metrics.items():
            # Ring mean, not v[-1]: the last slot aliases against the
            # episode cycle (see train.manager.ring_scalar).
            tb_writer.scalar(f"train/{k}", ring_scalar(v), update_id)
        return ()

    assert args.eval_frequency % 10 == 0

    def inner(i, m):
        return m.update_iter()

    def update_block(mgr):
        """10 fused updates, no host exits."""
        return lax.fori_loop(0, 10, inner, mgr)

    def update_loop(mgr):
        """eval_frequency updates with in-loop io_callback logging
        (reference scheme, jax_train.py:230-241)."""
        def outer(i, m):
            m = lax.fori_loop(0, 10, inner, m)
            jax.experimental.io_callback(
                _log_metrics_host_cb, (), m.state.update_idx,
                m.state.metrics, m.state.hyper_params["lr"],
                m.state.hyper_params["entropy_coef"], m.state.elo,
                ordered=True)
            return m

        return lax.fori_loop(0, args.eval_frequency // 10, outer, mgr)

    def eval_elo_fn(mgr):
        return mhs_train.eval_elo(mgr)

    print("compiling update loop...", flush=True)
    if args.io_callback_metrics:
        loop_c = aot_compile(update_loop, mgr)
        blocks_per_outer = 1
    else:
        loop_c = aot_compile(update_block, mgr)
        blocks_per_outer = args.eval_frequency // 10
    eval_elo_c = aot_compile(eval_elo_fn, mgr)
    print("compiled", flush=True)

    n_outer = ((args.num_updates - int(mgr.update_idx)) //
               args.eval_frequency)
    last["time"] = time()
    try:
        for _ in range(n_outer):
            for _ in range(blocks_per_outer):
                err, mgr = loop_c(mgr)
                err.throw()
                if not args.io_callback_metrics:
                    # The ring buffer holds exactly the last 10 updates =
                    # one block: host-side reads observe the same data the
                    # in-loop callback would.
                    st = mgr.state
                    _log_metrics_host_cb(
                        st.update_idx, st.metrics,
                        st.hyper_params["lr"],
                        st.hyper_params["entropy_coef"], st.elo)
            err, mgr = eval_elo_c(mgr)
            err.throw()
            print(mgr.state.elo)
            mgr.save_ckpt(os.path.join(args.ckpt_dir, args.run_name))
            tb_writer.flush()
    finally:
        tb_writer.flush()
    stop_training(mgr)


if __name__ == "__main__":
    main()
