"""On-device rollout collection.

The actor half of the fused actor-learner loop (SURVEY.md §3.3): a
`lax.scan` over the jitted env step interleaved with policy inference,
storing BPTT-chunked sequences exactly like the reference trainer
(steps_per_update=40 split into num_bptt_chunks sequences with LSTM start
states captured at chunk boundaries; reference recipe jax_train.sh:22-23).

Policy ensembles (PBT) are handled by applying every policy to the full
agent batch and selecting outputs by per-agent assignment — exact routing
semantics of the reference's policy_assignments tensor
(reference: src/mgr.cpp:1322-1331) at small ensemble sizes.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.models import Policy
from marl_hideandseek_tpu.train.cfg import TrainConfig


@struct.dataclass
class RolloutState:
    """Carried actor state between updates.

    env_state is in the PACKED worlds-minor layout (env/packed.py) — the
    rollout drives PackedEnv so the per-step env work runs transpose-free
    on TPU; obs are the flat-feature dict flattened to the [N = W*A]
    policy batch axis.
    """

    env_state: Any
    obs: Any                   # prepped (pre-normalization) current obs
    rnn_states: Any            # per-agent recurrent state, [.., N, C] leaves
    assignments: jnp.ndarray   # [N] i32 policy index per agent
    key: jnp.ndarray


@struct.dataclass
class RolloutBuffer:
    """[C, T/C, N, ...] stored sequences (C = bptt chunks)."""

    obs: Any
    actions: jnp.ndarray       # [C, T/C, N, n_action_dims] i32
    log_probs: jnp.ndarray     # [C, T/C, N]
    values: jnp.ndarray        # [C, T/C, N]
    rewards: jnp.ndarray       # [C, T/C, N]
    dones: jnp.ndarray         # [C, T/C, N] bool
    assignments: jnp.ndarray   # [C, T/C, N] i32
    rnn_start_states: Any      # [C, ..., N, C'] leaves: state at chunk start
    bootstrap_value: jnp.ndarray  # [N] value of the post-rollout obs


def apply_ensemble(policy: Policy, all_params, rnn_states, obs,
                   assignments, num_policies: int,
                   num_train: int | None = None):
    """Apply every policy, select by assignment.

    all_params: pytree with leading policy axis P.
    Returns (dists_logits, values, new_rnn_states) routed per agent.

    Selection over the small P axis is a one-hot contraction, NOT
    take_along_axis: XLA lowers batched gathers over [P, N, C] to
    scalarized element-at-a-time loops on TPU (~14 ms per [4,4096,256]
    leaf — 97% of round-2's training step time); the one-hot
    multiply-reduce is exact for 0/1 weights and fully vectorized.

    With `num_train` set, policies at index >= num_train are frozen past
    policies: they run actor-only (no critic forward; values report 0 and
    their agents' critic RNN state passes through — both are unused and
    cleared before any slot returns to a train policy).
    """
    ac = policy.actor_critic

    def one(params):
        dists, critic_out, new_rnn = ac.apply(params, rnn_states, obs)
        return dists.logits, critic_out["value"][..., 0], new_rnn

    if num_policies == 1:
        params0 = jax.tree.map(lambda x: x[0], all_params)
        logits, values, new_rnn = one(params0)
        return logits, values, new_rnn

    if num_train is not None and 0 < num_train < num_policies:
        def one_act(params):
            dists, new_rnn = ac.apply(params, rnn_states, obs,
                                      method=ac.act)
            return dists.logits, new_rnn

        train_params = jax.tree.map(lambda x: x[:num_train], all_params)
        past_params = jax.tree.map(lambda x: x[num_train:], all_params)
        lg_t, val_t, rnn_t = jax.vmap(one)(train_params)
        lg_p, rnn_p = jax.vmap(one_act)(past_params)
        logits_all = jnp.concatenate([lg_t, lg_p], axis=0)
        values_all = jnp.concatenate(
            [val_t, jnp.zeros((num_policies - num_train,) +
                              val_t.shape[1:], val_t.dtype)], axis=0)
        rnn_all = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), rnn_t, rnn_p)
    else:
        logits_all, values_all, rnn_all = jax.vmap(one)(
            all_params)                                      # [P, N, ..]
    onehot = jax.nn.one_hot(assignments, num_policies,
                            dtype=jnp.float32)  # [N, P]

    def sel(arr):
        """arr: [P, ..., N, C] or [P, N] — contract P with the one-hot."""
        n_axis = arr.ndim - 2 if arr.ndim >= 3 else 1
        oh = onehot.T.reshape(
            (num_policies,) + (1,) * (n_axis - 1) + (assignments.shape[0],)
            + (1,) * (arr.ndim - 1 - n_axis))
        return jnp.sum(arr.astype(jnp.float32) * oh, axis=0).astype(
            arr.dtype)

    logits = sel(logits_all)
    values = sel(values_all)
    new_rnn = jax.tree.map(sel, rnn_all)
    return logits, values, new_rnn


def denormalize_values(cfg: TrainConfig, value_stats, values, assignments):
    """Map critic outputs (normalized-return space) back to true returns,
    per agent via its policy assignment (the inverse of the EMA value
    normalizer, reference: value_normalizer_decay jax_train.py:165).
    Identity for the Dreamer critic (which normalizes internally via
    symlog/two-hot)."""
    if cfg.dreamer_v3_critic or value_stats is None:
        return values
    # One-hot table lookup (see apply_ensemble: gathers scalarize on TPU).
    p = value_stats["mu"].shape[0]
    onehot = jax.nn.one_hot(assignments, p, dtype=jnp.float32)  # [N, P]
    mu = onehot @ value_stats["mu"]
    sigma = onehot @ value_stats["sigma"]
    return values * sigma + mu


def _resample_assignments(key, dones_w, assignments, cfg: TrainConfig,
                          num_worlds, agents_per_world, agent_type):
    """Resample per-world team->policy assignments for finished episodes
    (the reference resamples the policy_assignments tensor between
    episodes). Matchmaking follows PBTConfig portions; with no PBT all
    agents use policy 0.

    Teams are keyed by ACTUAL team membership — `agent_type` [W, A] from
    the post-reset env state (AGENT_HIDER / AGENT_SEEKER), matching the
    reference's per-agent policy_assignments routing
    (src/mgr.cpp:1322-1331) for any hider/seeker composition, including
    variable per-episode team sizes and RandomFlipTeams. The train-side
    policy is given to a uniformly drawn role (hiders or seekers) per
    match, the other side follows the self/cross/past portions."""
    pbt = cfg.pbt
    if pbt is None or pbt.total_policies == 1:
        return assignments

    from marl_hideandseek_tpu.types import AGENT_HIDER

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    n_train = pbt.num_train_policies
    n_total = pbt.total_policies

    # Train side policy + opponent side per the configured portions
    # (reference defaults: past_play_portion=1.0, jax_train.py:108-110).
    t0 = jax.random.randint(k1, (num_worlds,), 0, n_train)
    r = jax.random.uniform(k2, (num_worlds,))
    past = jax.random.randint(
        k3, (num_worlds,), n_train, max(n_total, n_train + 1))
    cross = jax.random.randint(k4, (num_worlds,), 0, n_train)
    t1 = jnp.where(r < pbt.self_play_portion, t0,
                   jnp.where(r < pbt.self_play_portion +
                             pbt.cross_play_portion, cross,
                             jnp.where(jnp.array(pbt.num_past_policies > 0),
                                       past, cross)))

    # Which role the train side controls this episode (uniform draw —
    # the slot-half scheme got this implicitly from RandomFlipTeams).
    hiders_train = jax.random.bernoulli(k5, 0.5, (num_worlds,))
    h_pol = jnp.where(hiders_train, t0, t1)                  # [W]
    s_pol = jnp.where(hiders_train, t1, t0)
    is_hider = agent_type == AGENT_HIDER                     # [W, A]
    world_assign = jnp.where(is_hider, h_pol[:, None], s_pol[:, None])

    new_flat = world_assign.reshape(-1)
    done_flat = jnp.repeat(dones_w, agents_per_world)
    return jnp.where(done_flat, new_flat, assignments).astype(jnp.int32)


def collect_rollout(cfg: TrainConfig, env: HideAndSeekEnv, policy: Policy,
                    all_params, obs_stats, rollout: RolloutState,
                    value_stats=None):
    """Run steps_per_update env steps, return (rollout', buffer, metrics).

    obs_stats: the EMA normalizer state (frozen during collection; updated
    by the caller from the collected raw obs). value_stats: the EMA return
    normalizer (plain critic only) — stored values/bootstraps are
    denormalized so GAE runs in true-return space.
    """
    from marl_hideandseek_tpu.env.packed import PackedEnv

    num_worlds = env.cfg.num_worlds
    a_per_w = env.cfg.max_agents
    n_agents = num_worlds * a_per_w
    t_per_chunk = cfg.steps_per_update // cfg.num_bptt_chunks
    n_total_policies = cfg.total_policies
    norm = policy.obs_preprocess
    penv = PackedEnv(env.cfg)

    def flat(x):
        return x.reshape((n_agents,) + x.shape[2:])

    def step_fn(carry, step_key):
        env_state, obs, rnn_states, assignments = carry

        normalized = norm.normalize(obs_stats, obs)
        logits, values, new_rnn = apply_ensemble(
            policy, all_params, rnn_states, normalized, assignments,
            n_total_policies, num_train=cfg.num_train_policies)
        values = denormalize_values(cfg, value_stats, values, assignments)
        from marl_hideandseek_tpu.models import DiscreteActionDistributions
        dists = DiscreteActionDistributions(
            tuple(cfg.actions.actions_num_buckets), logits)
        k_act, k_assign = jax.random.split(step_key)
        actions = dists.sample(k_act)
        log_probs = dists.log_prob(actions)

        actions_packed = jnp.moveaxis(
            actions.reshape(num_worlds, a_per_w, -1), 0, -1)
        pre_step = env_state.step  # [W] counter BEFORE this transition
        # Pre-step team membership + spawn order: the episode these
        # transitions (and any end-of-episode result) belong to. Used to
        # attribute ELO matches by actual team, not slot halves.
        from marl_hideandseek_tpu.types import AGENT_HIDER
        pre_is_h = (env_state.agent_type == AGENT_HIDER).T   # [W, A]
        pre_act = env_state.agent_active.astype(bool).T      # [W, A]
        pre_sf = env_state.seekers_first.astype(bool)        # [W]
        env_state, result = penv.step(env_state, actions_packed)
        # Flatten worlds x agents into the policy batch axis.
        next_obs = jax.tree.map(flat, norm.prep(result.obs))

        dones = result.dones.T.reshape(-1).astype(bool)     # [A,W] -> [N]
        rewards = result.rewards.T.reshape(-1)

        new_rnn = policy.actor_critic.clear_recurrent_state(new_rnn, dones)
        dones_w = result.dones[0].astype(bool)              # [W]
        # Matchmaking keys off the POST-step agent_type: on reset steps
        # that is the fresh episode's composition (the one the new
        # assignment will control).
        new_assign = _resample_assignments(
            k_assign, dones_w, assignments, cfg, num_worlds, a_per_w,
            env_state.agent_type.T)

        # Per-world (first-spawned, second-spawned) team policies of the
        # pre-step episode, for ELO match attribution (episode_results
        # rows are keyed by TeamState.seekersFirst spawn order,
        # reference: src/sim.cpp:843-893).
        assign_wa = assignments.reshape(num_worlds, a_per_w)
        h_pol = jnp.max(jnp.where(pre_is_h & pre_act, assign_wa, -1),
                        axis=1)                              # [W]
        s_pol = jnp.max(jnp.where(~pre_is_h & pre_act, assign_wa, -1),
                        axis=1)
        team_pol = jnp.stack(
            [jnp.where(pre_sf, s_pol, h_pol),
             jnp.where(pre_sf, h_pol, s_pol)], axis=-1)      # [W, 2]

        # Domain learning signal: fraction of seek-phase world-steps where
        # the hiders are hidden (hider_team_reward > 0; reference semantics
        # src/sim.cpp:763-804). Robust to RandomFlipTeams, unlike slicing
        # reward rows by slot. Gated on the PRE-step counter so the final
        # seek step of each episode (where the post-step counter wraps to 0
        # on reset) still counts, matching the reward-active window in
        # _rewards_dones (cur >= NUM_PREP_STEPS - 1).
        from marl_hideandseek_tpu.config import NUM_PREP_STEPS
        in_seek = (pre_step >= NUM_PREP_STEPS - 1).astype(jnp.float32)
        hidden = (result.team_reward > 0.0).astype(jnp.float32)
        # Tool-use rates: fraction of world-steps with >= 1 locked box /
        # >= 1 active grab (post-step state; reference tool semantics
        # src/sim.cpp:281-361). The domain's fort-building signal.
        from marl_hideandseek_tpu.types import body_slot_ranges
        (box_lo, box_hi), (ramp_lo, ramp_hi), _ = \
            body_slot_ranges(penv.cfg)
        locked_w = jnp.any(env_state.bodies.locked[box_lo:box_hi],
                           axis=0).astype(jnp.float32)
        grab_w = jnp.any(env_state.grab.target >= 0,
                         axis=0).astype(jnp.float32)
        # Ramp-use signals of the reference's late curriculum: >= 1
        # locked ramp, and >= 1 active ramp with nonzero planar speed
        # (being carried/pushed).
        ramp_locked_w = jnp.any(
            env_state.bodies.locked[ramp_lo:ramp_hi],
            axis=0).astype(jnp.float32)
        ramp_act = env_state.bodies.active[ramp_lo:ramp_hi]
        ramp_speed = jnp.linalg.norm(
            env_state.bodies.vel[ramp_lo:ramp_hi, :2], axis=1)
        ramp_move_w = jnp.any((ramp_speed > 0.25) & ramp_act,
                              axis=0).astype(jnp.float32)

        store = {
            "obs": obs,
            "actions": actions,
            "log_probs": log_probs,
            "values": values,
            "rewards": rewards,
            "dones": dones,
            "assignments": assignments,
            "episode_results": result.episode_results.T,   # [W, 2]
            "dones_w": dones_w,
            "team_pol": team_pol,                          # [W, 2]
            "seek_steps": jnp.sum(in_seek),
            "hidden_steps": jnp.sum(hidden * in_seek),
            "locked_steps": jnp.sum(locked_w),
            "grab_steps": jnp.sum(grab_w),
            "ramp_locked_steps": jnp.sum(ramp_locked_w),
            "ramp_move_steps": jnp.sum(ramp_move_w),
        }
        return (env_state, next_obs, new_rnn, new_assign), store

    def chunk_fn(carry, chunk_keys):
        env_state, obs, rnn_states, assignments = carry
        start_rnn = rnn_states
        carry, stores = jax.lax.scan(
            step_fn, (env_state, obs, rnn_states, assignments), chunk_keys)
        stores["rnn_start"] = start_rnn
        return carry, stores

    key, sub = jax.random.split(rollout.key)
    step_keys = jax.random.split(
        sub, cfg.steps_per_update).reshape(
            cfg.num_bptt_chunks, t_per_chunk, -1)

    carry = (rollout.env_state, rollout.obs, rollout.rnn_states,
             rollout.assignments)
    carry, chunks = jax.lax.scan(chunk_fn, carry, step_keys)
    env_state, final_obs, final_rnn, final_assign = carry

    # Bootstrap value for GAE from the post-rollout obs.
    normalized = norm.normalize(obs_stats, final_obs)
    _, boot_values, _ = apply_ensemble(
        policy, all_params, final_rnn, normalized, final_assign,
        n_total_policies, num_train=cfg.num_train_policies)
    boot_values = denormalize_values(
        cfg, value_stats, boot_values, final_assign)

    buffer = RolloutBuffer(
        obs=chunks["obs"],
        actions=chunks["actions"],
        log_probs=chunks["log_probs"],
        values=chunks["values"],
        rewards=chunks["rewards"],
        dones=chunks["dones"],
        assignments=chunks["assignments"],
        rnn_start_states=chunks["rnn_start"],
        bootstrap_value=boot_values,
    )
    total_ws = float(cfg.steps_per_update * num_worlds)
    metrics = {
        "episode_results": chunks["episode_results"],
        "dones_w": chunks["dones_w"],
        "team_pol": chunks["team_pol"],
        "mean_reward": jnp.mean(chunks["rewards"]),
        "hidden_frac": (jnp.sum(chunks["hidden_steps"]) /
                        jnp.maximum(jnp.sum(chunks["seek_steps"]), 1.0)),
        "lock_rate": jnp.sum(chunks["locked_steps"]) / total_ws,
        "grab_rate": jnp.sum(chunks["grab_steps"]) / total_ws,
        "ramp_lock_rate": jnp.sum(chunks["ramp_locked_steps"]) / total_ws,
        "ramp_move_rate": jnp.sum(chunks["ramp_move_steps"]) / total_ws,
    }
    new_rollout = RolloutState(
        env_state=env_state, obs=final_obs, rnn_states=final_rnn,
        assignments=final_assign, key=key)
    return new_rollout, buffer, metrics


def compute_gae(cfg: TrainConfig, buffer: RolloutBuffer):
    """Masked GAE over the [C*T/C] time axis (gamma/lambda from
    reference: jax_train.py:152-153).

    The first-order recurrence A_t = delta_t + gamma*lambda*(1-d_t)*
    A_{t+1} runs as an associative scan (log2 T passes over full arrays)
    instead of a sequential lax.scan of T tiny ops — the sequential form
    cost ~12 ms/update at 1024 worlds purely in per-step scheduling."""
    c, t, n = buffer.rewards.shape
    rewards = buffer.rewards.reshape(c * t, n)
    values = buffer.values.reshape(c * t, n)
    dones = buffer.dones.reshape(c * t, n).astype(jnp.float32)

    nonterminal = 1.0 - dones
    next_values = jnp.concatenate(
        [values[1:], buffer.bootstrap_value[None]], axis=0)
    delta = rewards + cfg.gamma * next_values * nonterminal - values
    coef = cfg.gamma * cfg.gae_lambda * nonterminal

    # Reverse-time linear recurrence s_i = a_i * s_{i-1} + b_i.
    def comb(l, r):
        return (r[0] * l[0], r[0] * l[1] + r[1])

    _, adv_r = jax.lax.associative_scan(
        comb, (jnp.flip(coef, 0), jnp.flip(delta, 0)))
    advantages = jnp.flip(adv_r, 0)
    returns = advantages + values
    return (advantages.reshape(c, t, n), returns.reshape(c, t, n))
