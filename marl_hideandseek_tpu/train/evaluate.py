"""Policy evaluation: eval_policies / eval_load_ckpt.

Capability parity with madrona_learn's evaluation entry points (reference
usage: jax_infer.py:59-64 eval_load_ckpt(..., single_policy | train_only)
and madrona_learn.eval_policies with a per-step iter_cb; SURVEY.md §2.4
E13). Evaluation runs the same fused rollout machinery with frozen
parameters and reports ELOs + episode scores.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.models import DiscreteActionDistributions, Policy
from marl_hideandseek_tpu.train.cfg import EvalConfig
from marl_hideandseek_tpu.train import elo as elo_mod


def eval_load_ckpt(policy: Policy, ckpt_path: str,
                   single_policy: Optional[int] = None,
                   train_only: bool = False):
    """Load policy weights (and normalizer stats) from a training
    checkpoint directory for evaluation.

    Returns (params [P, ...], obs_stats, elo). With `single_policy`, the
    policy axis is sliced to that single entry; with `train_only`, past
    policies are dropped.
    """
    import orbax.checkpoint as ocp
    import os

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(ckpt_path)
    try:
        raw = ckptr.restore(path)
    except ValueError:
        # Checkpoint written on a different device type (e.g. saved on
        # TPU, restored on CPU): the saved shardings name devices that
        # don't exist here and the target-less restore raises. Rebuild
        # a sharding-free target from metadata so the arrays land on
        # the local default device instead.
        meta = ckptr.metadata(path)
        meta = getattr(meta, "item_metadata", meta)  # StepMetadata wrapper
        sharding = jax.sharding.SingleDeviceSharding(
            jax.local_devices()[0])
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding), meta)
        raw = ckptr.restore(path, target)
    params = raw["params"]
    past = raw.get("past_params", {})
    elo = raw["elo"]
    # Target-less orbax restore yields plain dicts; rebuild the typed
    # normalizer state the policy's normalize() expects.
    from marl_hideandseek_tpu.models.normalizer import NormalizerState

    os_raw = raw["obs_stats"]
    if isinstance(os_raw, dict) and "mean" in os_raw:
        obs_stats = NormalizerState(
            mean=os_raw["mean"], var=os_raw["var"], count=os_raw["count"])
    else:
        obs_stats = os_raw

    # Keep elo aligned with the params slice: elo[i] must be the rating
    # of params[i] for every selector combination.
    n_train = jax.tree_util.tree_leaves(params)[0].shape[0]
    if not train_only and jax.tree_util.tree_leaves(past):
        params = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), params, past)
    else:
        elo = elo[:n_train]
    if single_policy is not None:
        params = jax.tree.map(
            lambda x: x[single_policy:single_policy + 1], params)
        elo = elo[single_policy:single_policy + 1]
    return params, obs_stats, elo


def eval_policies(dev, eval_cfg: EvalConfig, env, policy: Policy,
                  params, obs_stats,
                  iter_cb: Optional[Callable] = None):
    """Run eval episodes; returns dict with episode scores and win counts.

    `iter_cb(step_data)` is called per step with the env state, obs,
    actions, rewards, dones and episode results (the reference's per-step
    callback used to stream checkpoints, jax_infer.py:131-153).
    """
    num_worlds = env.cfg.num_worlds
    a_per_w = env.cfg.max_agents
    n_agents = num_worlds * a_per_w
    norm = policy.obs_preprocess

    n_pol = jax.tree_util.tree_leaves(params)[0].shape[0]

    state, result = jax.jit(env.init)(jax.random.PRNGKey(7))
    obs = jax.tree.map(
        lambda x: x.reshape((n_agents,) + x.shape[2:]),
        norm.prep(result.obs))
    rnn = policy.actor_critic.init_recurrent_state(n_agents)

    # Matchup generation (reference: EvalConfig.eval_competitive,
    # jax_infer.py:155-164 — competitive iff more than one policy):
    # competitive = round-robin cross-play over the policy axis (drives
    # ELO); non-competitive = self-play (both teams share a policy; no
    # relative-skill information, so ELO stays untouched).
    competitive = eval_cfg.eval_competitive and n_pol > 1
    w_idx = jnp.arange(num_worlds)
    t0 = (w_idx % n_pol).astype(jnp.int32)
    if competitive:
        t1 = ((w_idx + 1 + (w_idx // n_pol)) % n_pol).astype(jnp.int32)
    else:
        t1 = t0

    @jax.jit
    def eval_step(state, obs, rnn, key):
        from marl_hideandseek_tpu.train.rollout import apply_ensemble
        from marl_hideandseek_tpu.types import AGENT_HIDER

        # Per-step team-keyed assignment: hiders play t0, seekers t1
        # (round-robin pairing covers both orders across worlds) — valid
        # for any per-episode hider/seeker composition.
        is_h = state.agent_type == AGENT_HIDER               # [W, A]
        assignments = jnp.where(
            is_h, t0[:, None], t1[:, None]).reshape(-1).astype(jnp.int32)
        # Spawn-ordered team policies of the CURRENT episode for ELO
        # attribution (episode_results rows follow seekersFirst).
        sf = state.seekers_first.astype(bool)                # [W]
        team_pol = jnp.stack(
            [jnp.where(sf, t1, t0), jnp.where(sf, t0, t1)], axis=-1)

        normalized = norm.normalize(obs_stats, obs)
        logits, _, new_rnn = apply_ensemble(
            policy, params, rnn, normalized, assignments, n_pol)
        dists = DiscreteActionDistributions(
            tuple(eval_cfg.actions.actions_num_buckets), logits)
        if eval_cfg.use_deterministic_policy:
            actions = dists.best()
        else:
            actions = dists.sample(key)
        state, result = env.step(
            state, actions.reshape(num_worlds, a_per_w, -1))
        next_obs = jax.tree.map(
            lambda x: x.reshape((n_agents,) + x.shape[2:]),
            norm.prep(result.obs))
        dones = result.dones.reshape(-1).astype(bool)
        new_rnn = policy.actor_critic.clear_recurrent_state(new_rnn, dones)
        return state, next_obs, new_rnn, result, actions, team_pol

    elo = jnp.full((n_pol,), elo_mod.ELO_START)
    key = jax.random.PRNGKey(11)
    total_scores = jnp.zeros((num_worlds, 2))
    n_finished = 0
    for step in range(eval_cfg.num_eval_steps):
        key, sub = jax.random.split(key)
        state, obs, rnn, result, actions, team_pol = eval_step(
            state, obs, rnn, sub)
        dones_w = result.dones[:, 0, 0].astype(bool)
        if competitive:
            idx_a, idx_b, score_a, valid = \
                elo_mod.matches_from_episode_results(
                    result.episode_results[None], team_pol[None],
                    dones_w[None])
            elo = elo_mod.update_elo_pairwise(
                elo, idx_a, idx_b, score_a, valid)
        total_scores = total_scores + result.episode_results * \
            dones_w[:, None]
        n_finished += int(dones_w.sum())
        if iter_cb is not None:
            iter_cb({
                "step": step,
                "state": state,
                "obs": result.obs,
                "actions": actions,
                "rewards": result.rewards,
                "dones": result.dones,
                "episode_results": result.episode_results,
            })

    return {
        "elo": elo,
        "total_scores": total_scores,
        "episodes_finished": n_finished,
        "matchups": (t0, t1),
    }
