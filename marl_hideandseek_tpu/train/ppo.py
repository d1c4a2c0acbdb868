"""PPO update with BPTT sequence replay and policy-ensemble masking.

The learner half of the fused actor-learner program. Capability parity with
madrona_learn's PPO (reference config surface: jax_train.py:154-169 —
clipped surrogate (clip 0.2), Dreamer-V3 two-hot value loss, entropy bonus,
grad-norm clip 5, Adam, num_epochs x num_minibatches, BPTT replay through
the stored LSTM chunk start states).

Ensemble (PBT) training: each train policy's loss is the assignment-masked
mean over its own agents; the per-policy (params, opt_state) are vmapped so
all members update in one program.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from marl_hideandseek_tpu.models import (
    DiscreteActionDistributions,
    Policy,
)
from marl_hideandseek_tpu.train.cfg import TrainConfig
from marl_hideandseek_tpu.train.rollout import RolloutBuffer, compute_gae


def make_optimizer(cfg: TrainConfig):
    """Gradient transform without the lr step — per-policy learning rates
    (PBT-explorable) are applied in ppo_update."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.algo.max_grad_norm),
        optax.scale_by_adam(),
    )


def init_value_stats(cfg: TrainConfig):
    """Per-policy EMA return-normalizer state for the plain (non-Dreamer)
    critic (reference: TrainConfig.value_normalizer_decay,
    jax_train.py:165). Sized to the full population so assignment-routed
    denormalization is total; only train entries are ever updated."""
    p = cfg.total_policies
    return {"mu": jnp.zeros((p,)), "sigma": jnp.ones((p,))}


def update_value_stats(cfg: TrainConfig, value_stats, returns, assignments):
    """EMA-update the per-train-policy return mean/scale from this
    rollout's returns (masked by policy assignment)."""
    if cfg.dreamer_v3_critic:
        return value_stats
    d = cfg.value_normalizer_decay
    mu, sigma = value_stats["mu"], value_stats["sigma"]
    for p in range(cfg.num_train_policies):
        mask = (assignments == p).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        m = jnp.sum(returns * mask) / denom
        v = jnp.sum(jnp.square(returns - m) * mask) / denom
        s = jnp.sqrt(jnp.maximum(v, 1e-6))
        mu = mu.at[p].set(d * mu[p] + (1.0 - d) * m)
        sigma = sigma.at[p].set(d * sigma[p] + (1.0 - d) * s)
    return {"mu": mu, "sigma": sigma}


def _policy_loss(cfg: TrainConfig, policy: Policy, params, obs_stats,
                 value_stats, minibatch, policy_idx):
    """Loss for one train policy over one minibatch.

    minibatch leaves: [C, T, M, ...] sequences for M agents.
    """
    norm = policy.obs_preprocess
    ac = policy.actor_critic
    c, t, m = minibatch["log_probs"].shape

    # Merge the chunk axis into batch: sequences of length T, batch C*M.
    def merge(x):  # [C, T, M, ...] -> [T, C*M, ...]
        x = jnp.swapaxes(x, 0, 1)  # [T, C, M, ...]
        return x.reshape((t, c * m) + x.shape[3:])

    seq_obs = jax.tree.map(merge, minibatch["obs"])
    seq_obs = norm.normalize(obs_stats, seq_obs)
    seq_ends = merge(minibatch["dones"])
    start_rnn = jax.tree.map(
        lambda x: _merge_rnn(x, c, m), minibatch["rnn_start"])

    dists, critic_out = ac.apply(params, start_rnn, seq_ends, seq_obs,
                                 method=ac.sequence)

    actions = merge(minibatch["actions"])
    old_lp = merge(minibatch["log_probs"])
    advantages = merge(minibatch["advantages"])
    returns = merge(minibatch["returns"])
    old_values = merge(minibatch["values"])
    mask = (merge(minibatch["assignments"]) == policy_idx).astype(
        jnp.float32)
    denom = jnp.maximum(jnp.sum(mask), 1.0)

    # Masked advantage normalization.
    adv_mean = jnp.sum(advantages * mask) / denom
    adv_var = jnp.sum(jnp.square(advantages - adv_mean) * mask) / denom
    advantages = (advantages - adv_mean) * jax.lax.rsqrt(adv_var + 1e-5)

    new_lp = dists.log_prob(actions)
    ratio = jnp.exp(new_lp - old_lp)
    clip = cfg.algo.clip_coef
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * advantages
    action_loss = -jnp.sum(jnp.minimum(surr1, surr2) * mask) / denom

    if cfg.dreamer_v3_critic:
        v_losses = ac.critic.two_hot_loss(critic_out["logits"], returns)
    else:
        # Plain critic learns EMA-normalized returns
        # (reference: value_normalizer_decay, jax_train.py:165); the
        # stored buffer values/returns are in true-return space, so map
        # the targets into the normalized space here.
        mu_p = value_stats["mu"][policy_idx]
        sig_p = value_stats["sigma"][policy_idx]
        returns_n = (returns - mu_p) / sig_p
        old_values_n = (old_values - mu_p) / sig_p
        values = critic_out["value"][..., 0]

        def v_err(v):
            err = v - returns_n
            if cfg.algo.huber_value_loss:
                a = jnp.abs(err)
                return jnp.where(a <= 1.0, 0.5 * jnp.square(err), a - 0.5)
            return jnp.square(err)

        if cfg.algo.clip_value_loss:
            v_clipped = old_values_n + jnp.clip(
                values - old_values_n, -clip, clip)
            v_losses = jnp.maximum(v_err(values), v_err(v_clipped))
        else:
            v_losses = v_err(values)
    value_loss = jnp.sum(v_losses * mask) / denom

    entropy = jnp.sum(dists.entropy() * mask) / denom

    return action_loss, value_loss, entropy, ratio, mask, denom


def _merge_rnn(x, c, m):
    """rnn start leaves [C, L, M, H] -> [L, C*M, H]."""
    x = jnp.moveaxis(x, 0, -3)  # [L, C, M, H]
    return x.reshape(x.shape[:-3] + (c * m,) + x.shape[-1:])


def use_grouped_ppo(cfg: TrainConfig) -> bool:
    """True when the grouped (gather-trainable-slots) PPO path applies.

    Grouping is only valid under pure past-play PBT: every world is one
    train policy vs one frozen past policy, so exactly half the agent
    slots carry trainable data. Any self-play or cross-play portion (two
    TRAIN policies can share a world) routes to the masked full-batch
    path, which keeps every agent-step.
    """
    pbt = cfg.pbt
    return bool(cfg.ppo_group_trainable and pbt is not None
                and pbt.num_past_policies > 0
                and pbt.self_play_portion == 0.0
                and pbt.cross_play_portion == 0.0)


def group_gather_indices(n_train: int, n: int, start_assign):
    """[P, cap] slot indices gathering each train policy's agents.

    Per-policy capacity: n/2 trainable slots split ~evenly between the
    train policies by matchmaking; cap at 1.25x the even share (> 8
    sigma of the binomial world draw at 1024+ worlds, and never above
    the n/2 total), rounded up to a lane multiple. In the
    astronomically rare overflow, the excess agents of that policy are
    dropped from this update's loss (stable slot order keeps the drop
    deterministic). Returns (g_idx [P, cap], cap).
    """
    n_group = n // 2
    if n_train > 1:
        share = n_group // n_train
        cap = min(n_group, ((share + share // 4) + 127) // 128 * 128)
    else:
        cap = n_group

    def idx_for(p):
        order = jnp.argsort(
            (start_assign != p).astype(jnp.int32), stable=True)
        return order[:cap]

    return jnp.stack([idx_for(p) for p in range(n_train)]), cap


def grouped_dropped_frac(assignments, g_idx, n_train: int):
    """Visibility metric for the two silent truncations of grouping.

    (a) overflow — slots assigned to p at rollout start beyond the cap;
    (b) mid-rollout switches — agent-steps whose per-timestep assignment
    is p but whose slot was gathered into another policy's group (or
    none). Both are dropped from the loss; dropped_agent_frac[p] is
    their fraction of p's trainable agent-steps. assignments: [C, T, N].
    """
    n = assignments.shape[-1]
    member = jax.vmap(
        lambda idx: jnp.zeros((n,), bool).at[idx].set(True))(g_idx)
    p_arr = jnp.arange(n_train)
    assign_is_p = (assignments[None] ==
                   p_arr[:, None, None, None])              # [P,C,T,N]
    covered = member[:, None, None, :]
    dropped = jnp.sum(assign_is_p & ~covered, axis=(1, 2, 3))
    total_p = jnp.sum(assign_is_p, axis=(1, 2, 3))
    return dropped / jnp.maximum(total_p, 1)


def ppo_update(cfg: TrainConfig, policy: Policy, tx, all_params,
               all_opt_states, obs_stats, value_stats, hyper_params,
               buffer: RolloutBuffer, key):
    """Full PPO update: epochs x minibatches over the rollout buffer.

    all_params/all_opt_states: leading axis = num_train_policies.
    hyper_params: dict with per-policy 'lr' and 'entropy_coef' arrays.
    Returns (params, opt_states, value_stats, metrics).
    """
    n_train = cfg.num_train_policies
    c, t, n = buffer.log_probs.shape
    advantages, returns = compute_gae(cfg, buffer)
    value_stats = update_value_stats(
        cfg, value_stats, returns, buffer.assignments)

    data = {
        "obs": buffer.obs,
        "actions": buffer.actions,
        "log_probs": buffer.log_probs,
        "values": buffer.values,
        "dones": buffer.dones,
        "assignments": buffer.assignments,
        "advantages": advantages,
        "returns": returns,
        "rnn_start": buffer.rnn_start_states,
    }

    # Grouped PPO (cfg.ppo_group_trainable): under pure past-play PBT
    # only the train-side team slots (statically N/2 of the batch) carry
    # trainable data — the other half belongs to frozen past policies.
    # Gather the trainable slots once (keyed by each slot's assignment at
    # rollout start) so every epoch's forward/backward runs on half the
    # batch. Assignment masking inside the loss is unchanged and still
    # exact per timestep; the only lost data is the post-switch fragment
    # of slots whose policy changed mid-rollout (an episode ended AND the
    # resample moved the slot between train/past sides), which is a few
    # percent of agent-steps — the same fragments the reference's
    # per-update policy_assignments routing attributes statically.
    grouped = use_grouped_ppo(cfg)
    if grouped:
        g_idx, cap = group_gather_indices(
            n_train, n, buffer.assignments[0, 0])
        dropped_agent_frac = grouped_dropped_frac(
            buffer.assignments, g_idx, n_train)

        def take_n(idx, x):
            return jnp.take(x, idx, axis=2)

        def take_rnn(idx, x):                                # [C,..,N,H]
            return jnp.take(x, idx, axis=-2)

        # Leaves become [P, C, T, cap, ...]: each train policy sees only
        # (a superset padding of) its own agents' sequences.
        data = {k: (jax.tree.map(
                        lambda x: jax.vmap(take_rnn, in_axes=(0, None))(
                            g_idx, x), v) if k == "rnn_start"
                    else jax.tree.map(
                        lambda x: jax.vmap(take_n, in_axes=(0, None))(
                            g_idx, x), v))
                for k, v in data.items()}
        n = cap
    else:
        dropped_agent_frac = jnp.zeros((n_train,))

    num_mb = cfg.algo.num_mini_batches
    assert n % num_mb == 0, "agents must divide into minibatches"
    mb_size = n // num_mb

    def epoch_fn(carry, epoch_key):
        all_params, all_opt_states = carry
        perm = jax.random.permutation(epoch_key, n)

        def mb_fn(carry, mb_idx):
            all_params, all_opt_states = carry

            if num_mb == 1:
                # Single minibatch = the full batch; the loss is a mean so
                # ordering is irrelevant — skip the permutation gather
                # (jnp.take over the agent axis of the whole buffer
                # scalarizes on TPU and costs real time).
                mb = data
            else:
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * mb_size, mb_size)
                ag_axis = 3 if grouped else 2

                def take_agents(x):  # [(P,) C, T, N, ...] agent axis
                    return jnp.take(x, idx, axis=ag_axis)

                def take_agents_rnn(x):  # [(P,) C, .., N, H]
                    return jnp.take(x, idx, axis=-2)

                mb = {k: (jax.tree.map(take_agents_rnn, v)
                          if k == "rnn_start"
                          else jax.tree.map(take_agents, v))
                      for k, v in data.items()}

            def one_policy(params, opt_state, p_idx, lr, ent_coef, mb_p):
                def loss_fn(p):
                    a_l, v_l, ent, ratio, mask, denom = _policy_loss(
                        cfg, policy, p, obs_stats, value_stats, mb_p,
                        p_idx)
                    total = (a_l + cfg.algo.value_loss_coef * v_l -
                             ent_coef * ent)
                    return total, (a_l, v_l, ent)

                (total, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, new_opt = tx.update(grads, opt_state, params)
                # Apply the per-policy (PBT-explored) learning rate.
                updates = jax.tree.map(lambda u: -lr * u, updates)
                new_params = optax.apply_updates(params, updates)
                return new_params, new_opt, (total,) + aux

            p_indices = jnp.arange(n_train)
            mb_axes = 0 if grouped else None
            new_params, new_opts, auxes = jax.vmap(
                one_policy, in_axes=(0, 0, 0, 0, 0, mb_axes))(
                all_params, all_opt_states, p_indices,
                hyper_params["lr"], hyper_params["entropy_coef"], mb)
            return (new_params, new_opts), auxes

        (all_params, all_opt_states), auxes = jax.lax.scan(
            mb_fn, (all_params, all_opt_states), jnp.arange(num_mb))
        return (all_params, all_opt_states), auxes

    epoch_keys = jax.random.split(key, cfg.algo.num_epochs)
    (all_params, all_opt_states), auxes = jax.lax.scan(
        epoch_fn, (all_params, all_opt_states), epoch_keys)

    total, a_l, v_l, ent = auxes
    metrics = {
        "loss": jnp.mean(total, axis=(0, 1)),
        "action_loss": jnp.mean(a_l, axis=(0, 1)),
        "value_loss": jnp.mean(v_l, axis=(0, 1)),
        "entropy": jnp.mean(ent, axis=(0, 1)),
        "dropped_agent_frac": dropped_agent_frac,
    }
    return all_params, all_opt_states, value_stats, metrics
