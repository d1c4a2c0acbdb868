"""Trainer smoke tests: update_iter runs, losses finite, params update,
PBT ensemble + ELO machinery work at tiny scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marl_hideandseek_tpu.config import EnvConfig, SimFlags
from marl_hideandseek_tpu.env import HideAndSeekEnv
from marl_hideandseek_tpu.policy import make_policy
from marl_hideandseek_tpu.train import (
    ActionsConfig,
    PBTConfig,
    ParamExplore,
    PPOConfig,
    TrainConfig,
    init_training,
)

W = 4


def make_env():
    cfg = EnvConfig(
        num_worlds=W, min_hiders=1, max_hiders=1, min_seekers=1,
        max_seekers=1,
        sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.UseFixedWorld)
    return HideAndSeekEnv(cfg)


def make_train_cfg(pbt=None, steps=8):
    return TrainConfig(
        num_worlds=W,
        num_agents_per_world=2,
        num_updates=2,
        actions=ActionsConfig(actions_num_buckets=[5, 5, 5, 2, 2]),
        steps_per_update=steps,
        num_bptt_chunks=2,
        lr=ParamExplore(base=1e-3, min_scale=0.1, max_scale=10.0,
                        log10_scale=True) if pbt else 1e-3,
        gamma=0.99,
        gae_lambda=0.95,
        algo=PPOConfig(num_mini_batches=1, num_epochs=1),
        pbt=pbt,
        dreamer_v3_critic=True,
        seed=5,
    )


def test_single_policy_update():
    env = make_env()
    cfg = make_train_cfg()
    policy = make_policy(dtype=jnp.float32)
    mgr = init_training(None, cfg, env, policy)

    update = jax.jit(lambda m: m.update_iter())
    mgr2 = update(mgr)
    assert int(mgr2.state.update_idx) == 1

    # Params changed.
    p0 = jax.tree_util.tree_leaves(mgr.state.params)
    p1 = jax.tree_util.tree_leaves(mgr2.state.params)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in
        zip(p0, p1))
    assert changed

    # Metrics finite.
    for k in ("loss", "action_loss", "value_loss", "entropy"):
        v = np.asarray(mgr2.state.metrics[k])
        assert np.isfinite(v).all(), (k, v)

    # Second update composes.
    mgr3 = update(mgr2)
    assert int(mgr3.state.update_idx) == 2
    # Normalizer stats advanced.
    assert float(mgr3.state.obs_stats.count) == 2.0


def test_pbt_ensemble_update():
    env = make_env()
    pbt = PBTConfig(
        num_teams=2, team_size=1, num_train_policies=2,
        num_past_policies=2, past_play_portion=1.0,
        explore_interval=1, past_policy_update_interval=1)
    cfg = make_train_cfg(pbt=pbt)
    policy = make_policy(dtype=jnp.float32)
    mgr = init_training(None, cfg, env, policy)

    # Ensemble axes.
    leaf = jax.tree_util.tree_leaves(mgr.state.params)[0]
    assert leaf.shape[0] == 2
    past_leaf = jax.tree_util.tree_leaves(mgr.state.past_params)[0]
    assert past_leaf.shape[0] == 2
    assert mgr.state.elo.shape == (4,)
    assert mgr.state.hyper_params["lr"].shape == (2,)

    update = jax.jit(lambda m: m.update_iter())
    mgr2 = update(mgr)
    assert int(mgr2.state.update_idx) == 1
    for k in ("loss", "entropy"):
        assert np.isfinite(np.asarray(mgr2.state.metrics[k])).all()

    # Reference-shaped accessors.
    assert mgr2.state.elo.shape == (4,)
    lrs = mgr2.train_states.hyper_params.lr
    assert lrs.shape == (2,)
    assert mgr2.policy_states.mmr.elo.shape == (4,)


def test_eval_elo():
    env = make_env()
    pbt = PBTConfig(num_teams=2, team_size=1, num_train_policies=2,
                    num_past_policies=0, past_play_portion=0.0,
                    cross_play_portion=1.0)
    cfg = make_train_cfg(pbt=pbt)
    policy = make_policy(dtype=jnp.float32)
    mgr = init_training(None, cfg, env, policy)
    mgr2 = jax.jit(lambda m: m.eval_elo(num_steps=8))(mgr)
    assert np.isfinite(np.asarray(mgr2.state.elo)).all()


def test_elo_stays_bounded_under_lopsided_matches():
    """10K simulated lopsided matches (policy 0 always beats 1-3, fed in
    large same-pair batches like a rollout window) must keep ratings in a
    plausible band: the per-pair aggregation caps movement at K per ordered
    pair per call, and the mean stays anchored at 1500. Guards against the
    divergent per-match-summed Jacobi update (round-2 ELO hit 6166)."""
    from marl_hideandseek_tpu.train import elo as elo_mod

    p = 4
    elo = jnp.full((p,), elo_mod.ELO_START)
    key = jax.random.PRNGKey(0)
    matches_per_call = 200
    update = jax.jit(elo_mod.update_elo_pairwise)
    for i in range(50):  # 50 calls x 200 matches = 10K matches
        key, sub = jax.random.split(key)
        idx_b = jax.random.randint(sub, (matches_per_call,), 1, p)
        idx_a = jnp.zeros((matches_per_call,), jnp.int32)
        score_a = jnp.ones((matches_per_call,))  # policy 0 always wins
        valid = jnp.ones((matches_per_call,), bool)
        elo = update(elo, idx_a, idx_b, score_a, valid)
    elo = np.asarray(elo)
    assert np.isfinite(elo).all()
    assert abs(elo.mean() - elo_mod.ELO_START) < 1.0  # anchored
    assert elo[0] == elo.max()
    # A dominant policy separates but stays in a plausible ELO band.
    assert 100.0 < elo[0] - elo[1:].max() < 1500.0, elo
    assert elo.max() < 3000.0 and elo.min() > 0.0, elo


def test_elo_self_play_is_noop():
    """Self-play matches carry no relative-skill information; with a
    mean-centered population the update must leave ratings untouched
    (the mean anchor re-centers by design, so start centered)."""
    from marl_hideandseek_tpu.train import elo as elo_mod

    elo = jnp.array([1450.0, 1550.0])
    idx = jnp.zeros((32,), jnp.int32)
    out = elo_mod.update_elo_pairwise(
        elo, idx, idx, jnp.ones((32,)), jnp.ones((32,), bool))
    np.testing.assert_allclose(np.asarray(out), np.asarray(elo), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    env = make_env()
    cfg = make_train_cfg()
    policy = make_policy(dtype=jnp.float32)
    mgr = init_training(None, cfg, env, policy)
    mgr = jax.jit(lambda m: m.update_iter())(mgr)

    path = mgr.save_ckpt(str(tmp_path))
    mgr2 = init_training(None, cfg, env, policy, restore_ckpt=path)
    assert int(mgr2.state.update_idx) == 1
    for a, b in zip(jax.tree_util.tree_leaves(mgr.state.params),
                    jax.tree_util.tree_leaves(mgr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_eval_load_ckpt_roundtrip(tmp_path):
    """The inference path: save a PBT checkpoint, reload it through
    eval_load_ckpt, and run the policy on normalizer-prepped obs — this
    is scripts/infer.py's load path (regression: target-less orbax
    restore used to yield plain dicts where NormalizerState is needed,
    and a config-mismatched init_training restore blew up)."""
    from marl_hideandseek_tpu.train.evaluate import eval_load_ckpt
    from marl_hideandseek_tpu.train.rollout import apply_ensemble
    from marl_hideandseek_tpu.env.packed import PackedEnv

    env = make_env()
    pbt = PBTConfig(num_teams=2, team_size=1, num_train_policies=2,
                    num_past_policies=2, past_play_portion=1.0)
    cfg = make_train_cfg(pbt=pbt)
    policy = make_policy(dtype=jnp.float32)
    mgr = init_training(None, cfg, env, policy)
    path = mgr.save_ckpt(str(tmp_path))

    params, obs_stats, elo = eval_load_ckpt(policy, path)
    n_pol = jax.tree_util.tree_leaves(params)[0].shape[0]
    assert n_pol == 4  # 2 train + 2 past
    assert elo.shape == (4,)

    penv = PackedEnv(env.cfg)
    _, result = jax.jit(penv.init)(jax.random.PRNGKey(0))
    n_agents = env.cfg.num_worlds * env.cfg.max_agents
    norm = policy.obs_preprocess
    obs = jax.tree.map(lambda x: x.reshape((n_agents,) + x.shape[2:]),
                       norm.prep(result.obs))
    normalized = norm.normalize(obs_stats, obs)  # typed state required
    rnn = policy.actor_critic.init_recurrent_state(n_agents)
    assigns = jnp.zeros((n_agents,), jnp.int32)
    logits, values, _ = apply_ensemble(policy, params, rnn, normalized,
                                       assigns, n_pol)
    assert np.isfinite(np.asarray(logits)).all()

    # train_only / single_policy selectors (reference: jax_infer.py:59-64).
    p_train, _, _ = eval_load_ckpt(policy, path, train_only=True)
    assert jax.tree_util.tree_leaves(p_train)[0].shape[0] == 2
    p_one, _, _ = eval_load_ckpt(policy, path, single_policy=1)
    assert jax.tree_util.tree_leaves(p_one)[0].shape[0] == 1


def test_restore_ckpt_legacy_metrics(tmp_path):
    """Checkpoints written before a metrics-ring key existed must still
    restore (new keys zero-filled)."""
    env = make_env()
    cfg = make_train_cfg()
    policy = make_policy(dtype=jnp.float32)
    mgr = init_training(None, cfg, env, policy)
    # Simulate a legacy checkpoint: drop a ring key before saving.
    legacy_metrics = {k: v for k, v in mgr.state.metrics.items()
                      if k not in ("lock_rate", "grab_rate")}
    legacy = mgr.replace(state=mgr.state.replace(metrics=legacy_metrics))
    path = legacy.save_ckpt(str(tmp_path))

    mgr2 = init_training(None, cfg, env, policy, restore_ckpt=path)
    assert "lock_rate" in mgr2.state.metrics
    assert "grab_rate" in mgr2.state.metrics
    np.testing.assert_allclose(
        np.asarray(mgr2.state.metrics["lock_rate"]), 0.0)


def test_ring_scalar_logs_mean_not_last_slot():
    """Logged scalar must be the ring mean: with 240-step episodes (6
    updates) and a 10-update log cadence, the LAST slot aliases to the
    prep phase every 3rd sample and logs exact 0.0 (r4 metrics defect)."""
    from marl_hideandseek_tpu.train import ring_scalar

    # Ring of 10 updates where the final slot landed in prep (0.0).
    ring = np.array([0.5, 0.4, 0.0, 0.6, 0.5, 0.0, 0.4, 0.5, 0.0, 0.0])
    v = ring_scalar(jnp.asarray(ring))
    assert v == pytest.approx(ring.mean())
    assert v != 0.0  # the v[-1] bug would log 0.0 here


def test_grouped_ppo_routing():
    """Asymmetric/self-play/cross-play configs must route to the masked
    full-batch path (which keeps every agent-step); grouping only under
    pure past-play PBT."""
    from marl_hideandseek_tpu.train.ppo import use_grouped_ppo
    import dataclasses

    def cfg_with(**pbt_kw):
        kw = dict(
            num_teams=2, team_size=1, num_train_policies=2,
            num_past_policies=2, past_play_portion=1.0,
            explore_interval=1, past_policy_update_interval=1)
        kw.update(pbt_kw)
        pbt = PBTConfig(**kw)
        c = make_train_cfg(pbt=pbt)
        return dataclasses.replace(c, ppo_group_trainable=True)

    assert use_grouped_ppo(cfg_with())
    assert not use_grouped_ppo(cfg_with(
        self_play_portion=0.5, past_play_portion=0.5))
    assert not use_grouped_ppo(cfg_with(
        cross_play_portion=0.5, past_play_portion=0.5))
    # No frozen past policies -> nothing to group away.
    no_past = dataclasses.replace(
        cfg_with(), pbt=dataclasses.replace(
            cfg_with().pbt, num_past_policies=0))
    assert not use_grouped_ppo(no_past)
    # Flag off -> masked path.
    flag_off = dataclasses.replace(cfg_with(), ppo_group_trainable=False)
    assert not use_grouped_ppo(flag_off)
    # Default config never groups.
    assert not use_grouped_ppo(make_train_cfg())


def test_grouped_dropped_frac_mid_rollout_switch():
    """dropped_agent_frac must report exactly the agent-steps lost when a
    slot switches between train/past sides mid-rollout, and the overflow
    beyond the per-policy cap."""
    from marl_hideandseek_tpu.train.ppo import (
        group_gather_indices, grouped_dropped_frac)

    n_train, n, T = 2, 16, 40
    # Slots 0-3 -> p0, 4-7 -> p1, 8-15 -> past policies (2, 3).
    start = np.array([0] * 4 + [1] * 4 + [2] * 4 + [3] * 4, np.int32)
    g_idx, cap = group_gather_indices(n_train, n, jnp.asarray(start))
    assert cap == n // 2
    # Group p0 holds its own slots; groups never reach slots 8-15.
    g = np.asarray(g_idx)
    assert set(range(4)) <= set(g[0].tolist())
    assert not (set(g[0].tolist()) | set(g[1].tolist())) & set(range(8, 16))

    # Forced mid-rollout switch: slot 12 flips past(2) -> train(0) at
    # T/2. Its post-switch fragment has trainable assignment 0 but the
    # slot was never gathered into group 0 -> dropped.
    assigns = np.broadcast_to(start, (1, T, n)).copy()
    assigns[0, T // 2:, 12] = 0
    frac = np.asarray(grouped_dropped_frac(
        jnp.asarray(assigns), g_idx, n_train))
    # p0 trainable steps: 4 full slots * T + T/2 switched-in; dropped T/2.
    assert frac[0] == pytest.approx((T // 2) / (4 * T + T // 2))
    assert frac[1] == 0.0

    # Documented bound: under a realistic episode-end resample (~5% of
    # slots switch once), the dropped fraction stays "a few percent".
    rng = np.random.RandomState(0)
    n_big = 256
    start_b = rng.permutation(
        np.repeat(np.arange(4, dtype=np.int32), n_big // 4))
    g_b, _ = group_gather_indices(n_train, n_big, jnp.asarray(start_b))
    assigns_b = np.broadcast_to(start_b, (1, T, n_big)).copy()
    switch = rng.choice(n_big, size=n_big // 20, replace=False)
    for s in switch:
        t0 = rng.randint(1, T)
        assigns_b[0, t0:, s] = rng.randint(0, 2)
    frac_b = np.asarray(grouped_dropped_frac(
        jnp.asarray(assigns_b), g_b, n_train))
    assert frac_b.max() <= 0.05


def test_grouped_dropped_frac_overflow_beyond_cap():
    from marl_hideandseek_tpu.train.ppo import (
        group_gather_indices, grouped_dropped_frac)

    n_train, n, T = 2, 16, 10
    # 9 slots claim p0 at rollout start: one exceeds the cap (n/2 = 8).
    start = np.array([0] * 9 + [1] * 3 + [2] * 4, np.int32)
    g_idx, cap = group_gather_indices(n_train, n, jnp.asarray(start))
    assigns = jnp.broadcast_to(jnp.asarray(start), (1, T, n))
    frac = np.asarray(grouped_dropped_frac(assigns, g_idx, n_train))
    assert frac[0] == pytest.approx(1.0 / 9.0)  # 1 of 9 slots dropped
    assert frac[1] == 0.0
