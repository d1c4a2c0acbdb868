"""Training manager: the fused actor-learner state machine.

Capability parity with madrona_learn's `init_training` / `TrainingManager`
(reference usage: jax_train.py:246-279 — update_iter inside
lax.fori_loop, AOT compilation, checkpoint save/restore, stop_training,
cfg_jax_mem). The entire update (rollout scan + PPO epochs + PBT
bookkeeping + ELO) is one pure function on a pytree state, so
`lax.fori_loop(0, K, update_iter)` compiles into a single XLA program —
the defining performance property of the reference design (SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.models import Policy
from marl_hideandseek_tpu.train import elo as elo_mod
from marl_hideandseek_tpu.train import pbt as pbt_mod
from marl_hideandseek_tpu.train.cfg import TrainConfig


def ring_scalar(buf) -> float:
    """Scalar to log for one ring-buffered metric: the mean over all
    ring slots, NOT the last slot.

    The last slot is a single update's 40-step rollout window; with all
    worlds episode-synchronized (240-step episodes = 6 updates), a
    10-update log cadence aliases against the 6-update episode cycle
    with period 3 and every third sample lands entirely in the prep
    phase — reward/hidden_frac log as exact 0.0. The ring exists to
    average over a full episode cycle (metrics_buffer_size=10 > 6,
    reference jax_train.py:168); use it.
    """
    import numpy as np
    return float(np.asarray(buf).mean())
from marl_hideandseek_tpu.train.ppo import (
    init_value_stats,
    make_optimizer,
    ppo_update,
)
from marl_hideandseek_tpu.train.rollout import (
    RolloutState,
    collect_rollout,
)


@dataclasses.dataclass(frozen=True)
class TrainHooks:
    """Extension hooks called inside the jitted update
    (reference: TrainHooks subclassed at jax_train.py:91-93). Subclass and
    override; every method must be pure/traceable (it runs inside the
    compiled update program — use jax.experimental.io_callback inside a
    hook for host-side effects).

    post_rollout(update_idx, buffer, metrics) -> metrics
        Runs after rollout collection, before the PPO update; may add
        entries consumed by post_update.
    post_update(update_idx, metrics, train_state) -> metrics
        Runs at the end of update_iter; the returned dict's scalar entries
        are written into the ring-buffered metrics when their key exists.
    """

    def post_rollout(self, update_idx, buffer, metrics):
        return metrics

    def post_update(self, update_idx, metrics, train_state):
        return metrics


@struct.dataclass
class PolicyStatesMMR:
    elo: jnp.ndarray  # [P_total]


@struct.dataclass
class PolicyStates:
    mmr: PolicyStatesMMR


@struct.dataclass
class TrainStates:
    hyper_params: Any  # dict with 'lr', 'entropy_coef' per train policy


@struct.dataclass
class TrainingState:
    """All mutable training state (one pytree)."""

    params: Any          # leading axis = num_train_policies
    opt_states: Any
    past_params: Any     # leading axis = num_past_policies (may be empty)
    obs_stats: Any       # EMA normalizer state
    value_stats: Any     # EMA return normalizer (plain critic path)
    rollout: RolloutState
    hyper_params: Dict[str, jnp.ndarray]
    elo: jnp.ndarray     # [P_total]
    update_idx: jnp.ndarray
    key: jnp.ndarray
    metrics: Dict[str, jnp.ndarray]  # ring buffers [metrics_buffer_size]


@struct.dataclass
class TrainingManager:
    """Facade bundling static objects with the mutable TrainingState.

    Mirrors the reference training_mgr object surface: `update_iter()`,
    `update_idx`, `state.train_states.hyper_params.lr`,
    `state.policy_states.mmr.elo`, `save_ckpt`, `log_metrics_tensorboard`.
    """

    state: TrainingState
    env: HideAndSeekEnv = struct.field(pytree_node=False)
    policy: Policy = struct.field(pytree_node=False)
    cfg: TrainConfig = struct.field(pytree_node=False)
    hooks: Optional[TrainHooks] = struct.field(
        pytree_node=False, default=None)

    # -- reference-shaped accessors ---------------------------------------

    @property
    def update_idx(self):
        return self.state.update_idx

    @property
    def train_states(self):
        return TrainStates(hyper_params=_HyperView(self.state.hyper_params))

    @property
    def policy_states(self):
        return PolicyStates(mmr=PolicyStatesMMR(elo=self.state.elo))

    # -- core update -------------------------------------------------------

    def all_params(self):
        """Concatenate train + past policies along the policy axis."""
        st = self.state
        if not jax.tree_util.tree_leaves(st.past_params):
            return st.params
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            st.params, st.past_params)

    def update_iter(self) -> "TrainingManager":
        """One training update: rollout + normalizer update + PPO + PBT.

        Pure; usable inside lax.fori_loop (reference: jax_train.py:230-241).
        """
        cfg = self.cfg
        st = self.state
        norm = self.policy.obs_preprocess

        new_rollout, buffer, roll_metrics = collect_rollout(
            cfg, self.env, self.policy, self.all_params(), st.obs_stats,
            st.rollout, st.value_stats)
        if self.hooks is not None:
            roll_metrics = self.hooks.post_rollout(
                st.update_idx, buffer, roll_metrics)

        # EMA normalizer update from the freshly collected obs.
        flat_obs = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[3:]), buffer.obs)
        obs_stats = norm.update_state(st.obs_stats, flat_obs)

        key, k_ppo, k_pbt = jax.random.split(st.key, 3)
        tx = make_optimizer(cfg)
        params, opt_states, value_stats, ppo_metrics = ppo_update(
            cfg, self.policy, tx, st.params, st.opt_states, obs_stats,
            st.value_stats, st.hyper_params, buffer, k_ppo)

        # ELO from finished training episodes, attributed by ACTUAL team
        # membership (rollout stores per-step spawn-ordered team policies
        # derived from agent_type — valid for any hider/seeker
        # composition, reference: src/mgr.cpp:1322-1331).
        idx_a, idx_b, score_a, valid = elo_mod.matches_from_episode_results(
            roll_metrics["episode_results"], roll_metrics["team_pol"],
            roll_metrics["dones_w"])
        elo = elo_mod.update_elo_pairwise(st.elo, idx_a, idx_b, score_a,
                                          valid)

        update_idx = st.update_idx + 1
        past_params = st.past_params

        if cfg.pbt is not None:
            def do_pbt(args):
                params, opt_states, hyper, past, elo = args
                params, opt_states, hyper = pbt_mod.explore_exploit(
                    cfg, k_pbt, elo, params, opt_states, hyper)
                past, elo = pbt_mod.refresh_past_policies(
                    cfg, update_idx, params, past, elo)
                return params, opt_states, hyper, past, elo

            do = (update_idx % cfg.pbt.explore_interval) == 0
            params, opt_states, hyper_params, past_params, elo = \
                jax.lax.cond(
                    do, do_pbt, lambda a: a,
                    (params, opt_states, st.hyper_params, past_params, elo))
        else:
            hyper_params = st.hyper_params

        # Ring-buffered metrics (reference: metrics_buffer_size=10,
        # jax_train.py:168).
        slot = st.update_idx % cfg.metrics_buffer_size
        metrics = dict(st.metrics)
        scalars = {
            "loss": jnp.mean(ppo_metrics["loss"]),
            "action_loss": jnp.mean(ppo_metrics["action_loss"]),
            "value_loss": jnp.mean(ppo_metrics["value_loss"]),
            "entropy": jnp.mean(ppo_metrics["entropy"]),
            "dropped_agent_frac": jnp.mean(
                ppo_metrics["dropped_agent_frac"]),
            "mean_reward": roll_metrics["mean_reward"],
            "hidden_frac": roll_metrics["hidden_frac"],
            "lock_rate": roll_metrics["lock_rate"],
            "grab_rate": roll_metrics["grab_rate"],
            "ramp_lock_rate": roll_metrics["ramp_lock_rate"],
            "ramp_move_rate": roll_metrics["ramp_move_rate"],
        }
        new_state = TrainingState(
            params=params,
            opt_states=opt_states,
            past_params=past_params,
            obs_stats=obs_stats,
            value_stats=value_stats,
            rollout=new_rollout,
            hyper_params=hyper_params,
            elo=elo,
            update_idx=update_idx,
            key=key,
            metrics=metrics,
        )
        if self.hooks is not None:
            scalars = self.hooks.post_update(
                st.update_idx, scalars, new_state)
        for k, v in scalars.items():
            if k in metrics:
                metrics[k] = metrics[k].at[slot].set(v)
        new_state = new_state.replace(metrics=metrics)
        return self.replace(state=new_state)

    # -- evaluation --------------------------------------------------------

    def eval_elo(self, num_steps: Optional[int] = None) -> "TrainingManager":
        """Dedicated ELO evaluation pass: FRESH round-robin matchups over
        the whole population, frozen params (reference:
        madrona_learn.eval_elo resamples matchups rather than reusing the
        training rollout's assignments, jax_train.py:243-275)."""
        cfg = self.cfg
        st = self.state
        steps = num_steps or cfg.steps_per_update * 6

        # Fresh round-robin team-vs-team assignments over ALL policies
        # (train + past) — same scheme as train/evaluate.py — so eval ELO
        # is unbiased by the training matchmaking portions.
        from marl_hideandseek_tpu.types import AGENT_HIDER

        n_pol = cfg.total_policies
        w = self.env.cfg.num_worlds
        w_idx = jnp.arange(w)
        t0 = (w_idx % n_pol).astype(jnp.int32)
        t1 = ((w_idx + 1 + (w_idx // n_pol)) % n_pol).astype(jnp.int32)
        # Assign by CURRENT team membership (hiders get t0, seekers t1;
        # the round-robin pairing covers both orders across worlds), so
        # seeding is correct for any hider/seeker composition.
        is_h = (st.rollout.env_state.agent_type == AGENT_HIDER).T  # [W, A]
        fresh_assign = jnp.where(
            is_h, t0[:, None], t1[:, None]).reshape(-1).astype(jnp.int32)

        eval_cfg = dataclasses.replace(
            cfg, steps_per_update=steps, num_bptt_chunks=1)
        rollout = st.rollout.replace(assignments=fresh_assign)
        _, buffer, metrics = collect_rollout(
            eval_cfg, self.env, self.policy, self.all_params(),
            st.obs_stats, rollout, st.value_stats)

        idx_a, idx_b, score_a, valid = elo_mod.matches_from_episode_results(
            metrics["episode_results"], metrics["team_pol"],
            metrics["dones_w"])
        elo = elo_mod.update_elo_pairwise(st.elo, idx_a, idx_b, score_a,
                                          valid)
        return self.replace(state=st.replace(elo=elo))

    # -- host-side utilities (not jittable) -------------------------------

    def save_ckpt(self, ckpt_dir: str):
        """Write the training state with orbax (reference:
        training_mgr.save_ckpt, jax_train.py:277)."""
        import orbax.checkpoint as ocp

        step = int(self.state.update_idx)
        path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self.state, force=True)
        ckptr.wait_until_finished()
        return path

    def restore_ckpt(self, path: str) -> "TrainingManager":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            restored = ckptr.restore(os.path.abspath(path), self.state)
        except ValueError as e:
            # Metrics-ring keys grow over time; restore checkpoints whose
            # ring predates newer keys by matching the on-disk key set and
            # zero-filling the rest. Only the metrics subtree is handled
            # here — any other structural mismatch re-raises.
            if "metrics" not in str(e):
                raise
            # Orbax metadata layouts differ across versions; if the probe
            # does not yield the expected dict shape, surface the
            # ORIGINAL restore error rather than a probing artifact.
            try:
                md = ckptr.metadata(os.path.abspath(path))
                tree = getattr(md, "item_metadata", None) or getattr(
                    md, "tree", None) or md
                disk_keys = set(tree["metrics"].keys())
            except (KeyError, TypeError, AttributeError):
                raise e from None
            legacy = {k: v for k, v in self.state.metrics.items()
                      if k in disk_keys}
            if disk_keys - set(self.state.metrics):
                raise  # disk has keys this code no longer knows
            target = self.state.replace(metrics=legacy)
            restored = ckptr.restore(os.path.abspath(path), target)
            merged = dict(self.state.metrics)
            merged.update(restored.metrics)
            restored = restored.replace(metrics=merged)
        return self.replace(state=restored)

    def log_metrics_tensorboard(self, writer):
        """Flush the ring-buffered metrics to a writer."""
        step = int(self.state.update_idx)
        n = min(step, self.cfg.metrics_buffer_size)
        for k, buf in self.state.metrics.items():
            vals = jax.device_get(buf)
            for i in range(n):
                writer.scalar(f"train/{k}", float(vals[i]),
                              step - n + i + 1)


class _HyperView:
    """Attribute view over the hyper_params dict (reference spelling:
    training_mgr.state.train_states.hyper_params.lr)."""

    def __init__(self, d):
        self._d = d

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e


def init_training(dev, cfg: TrainConfig, env_or_fns, policy: Policy,
                  restore_ckpt: Optional[str] = None,
                  profile_port: Optional[int] = None,
                  hooks: Optional[TrainHooks] = None) -> TrainingManager:
    """Build env state, policy params, optimizer and rollout state
    (reference: madrona_learn.init_training, jax_train.py:249-251)."""
    if profile_port is not None:
        jax.profiler.start_server(profile_port)

    from marl_hideandseek_tpu.env.packed import PackedEnv

    env: HideAndSeekEnv = env_or_fns
    key = jax.random.PRNGKey(cfg.seed)
    k_env, k_param, k_roll, k_hyper, k_state = jax.random.split(key, 5)

    # The rollout drives the worlds-minor packed env (env/packed.py);
    # init through it so the carried env_state has the packed layout.
    penv = PackedEnv(env.cfg)
    env_state, result = jax.jit(penv.init)(k_env)
    norm = policy.obs_preprocess
    n_agents = env.cfg.num_worlds * env.cfg.max_agents
    # Policy batch axis = flattened worlds x agents.
    obs = jax.tree.map(
        lambda x: x.reshape((n_agents,) + x.shape[2:]),
        norm.prep(result.obs))
    obs_stats = norm.init_state(obs)

    rnn0 = policy.actor_critic.init_recurrent_state(n_agents)
    flat_obs = obs

    def init_one(k):
        return policy.actor_critic.init(k, rnn0, flat_obs)

    n_train = cfg.num_train_policies
    params = jax.vmap(init_one)(jax.random.split(k_param, n_train))

    tx = make_optimizer(cfg)
    opt_states = jax.vmap(tx.init)(params)

    n_past = cfg.total_policies - n_train
    if n_past > 0:
        past_params = jax.tree.map(
            lambda x: jnp.repeat(x[:1], n_past, axis=0), params)
    else:
        past_params = {}  # empty pytree (orbax rejects zero-size arrays)

    # Initial matchmaking over all worlds (all-done resample) so the very
    # first rollout already has team-keyed, portion-correct assignments —
    # required by the grouped PPO path's trainable-slot capacity.
    from marl_hideandseek_tpu.train.rollout import _resample_assignments
    k_roll, k_assign0 = jax.random.split(k_roll)
    assignments = _resample_assignments(
        k_assign0, jnp.ones((env.cfg.num_worlds,), bool),
        jnp.zeros((n_agents,), jnp.int32), cfg, env.cfg.num_worlds,
        env.cfg.max_agents, env_state.agent_type.T)
    rollout = RolloutState(
        env_state=env_state,
        obs=obs,
        rnn_states=rnn0,
        assignments=assignments,
        key=k_roll,
    )

    metrics = {
        k: jnp.zeros((cfg.metrics_buffer_size,))
        for k in ("loss", "action_loss", "value_loss", "entropy",
                  "dropped_agent_frac",
                  "mean_reward", "hidden_frac", "lock_rate", "grab_rate",
                  "ramp_lock_rate", "ramp_move_rate")
    }

    state = TrainingState(
        params=params,
        opt_states=opt_states,
        past_params=past_params,
        obs_stats=obs_stats,
        value_stats=init_value_stats(cfg),
        rollout=rollout,
        hyper_params=pbt_mod.init_hyper_params(cfg, k_hyper),
        elo=jnp.full((cfg.total_policies,), elo_mod.ELO_START),
        update_idx=jnp.zeros((), jnp.int32),
        key=k_state,
        metrics=metrics,
    )
    mgr = TrainingManager(state=state, env=env, policy=policy, cfg=cfg,
                          hooks=hooks)
    if restore_ckpt:
        mgr = mgr.restore_ckpt(restore_ckpt)
    return mgr


def aot_compile(fn, mgr: TrainingManager, nan_guards: Optional[bool] = None):
    """Ahead-of-time compile fn(mgr) -> mgr (reference:
    madrona_learn.aot_compile, jax_train.py:257-259) with the (err, result)
    checkify contract.

    nan_guards=True (or the MHS_NAN_GUARDS env var) compiles the program
    under jax.experimental.checkify float checks, so `err.throw()` raises
    on any NaN/Inf/div-by-zero produced inside the update — the real
    capability behind the reference's stubbed checkify guards
    (jax_policy.py:30-37). Off by default: the checks add device work.
    """
    if nan_guards is None:
        nan_guards = os.environ.get("MHS_NAN_GUARDS", "") not in ("", "0")

    if nan_guards:
        from jax.experimental import checkify

        checked = checkify.checkify(fn, errors=checkify.float_checks)
        compiled = jax.jit(checked).lower(mgr).compile()
        return lambda m: compiled(m)  # -> (err, result)

    compiled = jax.jit(fn).lower(mgr).compile()

    class _NoErr:
        def throw(self):
            return None

    def call(m):
        return _NoErr(), compiled(m)

    return call


def stop_training(mgr: TrainingManager):
    """Tear-down hook (reference: madrona_learn.stop_training). The TPU
    build has no external sim process to stop; provided for API parity."""
    return None


def cfg_jax_mem(fraction: float):
    """Set the XLA preallocation fraction (reference:
    madrona_learn.cfg_jax_mem, jax_train.py:28)."""
    os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", str(fraction))
