"""Model-layer unit tests: shapes, distributions, LSTM semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from marl_hideandseek_tpu.models import (
    MLP,
    DiscreteActionDistributions,
    DenseLayerDiscreteActor,
    DreamerV3Critic,
    EntitySelfAttentionNet,
    LayerNorm,
    ObservationsEMANormalizer,
)
from marl_hideandseek_tpu.models.rnn import LSTM
from marl_hideandseek_tpu.policy import make_policy

N = 8


def _fake_obs(key, n=N):
    ks = jax.random.split(key, 11)
    return {
        "prep_counter": jax.random.randint(ks[0], (n, 1), 0, 97),
        "self_data": jax.random.normal(ks[1], (n, 13)),
        "self_type": jax.random.randint(ks[2], (n, 1), 0, 2),
        "self_mask": jnp.ones((n, 1)),
        "self_lidar": jax.random.uniform(ks[3], (n, 30)),
        "agent_data": jax.random.normal(ks[4], (n, 5, 14)),
        "box_data": jax.random.normal(ks[5], (n, 9, 17)),
        "ramp_data": jax.random.normal(ks[6], (n, 2, 14)),
        "vis_agents_mask": jax.random.bernoulli(
            ks[7], 0.5, (n, 5, 1)).astype(jnp.float32),
        "vis_boxes_mask": jax.random.bernoulli(
            ks[8], 0.5, (n, 9, 1)).astype(jnp.float32),
        "vis_ramps_mask": jax.random.bernoulli(
            ks[9], 0.5, (n, 2, 1)).astype(jnp.float32),
    }


def test_mlp_layernorm():
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 32))
    mlp = MLP(num_channels=64, num_layers=3)
    params = mlp.init(jax.random.PRNGKey(1), x)
    y = mlp.apply(params, x)
    assert y.shape == (N, 64)
    ln = LayerNorm()
    p = ln.init(jax.random.PRNGKey(2), x)
    z = ln.apply(p, x)
    np.testing.assert_allclose(np.asarray(z.mean(-1)), 0.0, atol=1e-5)


def test_discrete_actor_distribution():
    buckets = (5, 5, 5, 2, 2)
    feats = jax.random.normal(jax.random.PRNGKey(0), (N, 64))
    head = DenseLayerDiscreteActor(buckets=buckets)
    params = head.init(jax.random.PRNGKey(1), feats)
    dist = head.apply(params, feats)
    acts = dist.sample(jax.random.PRNGKey(2))
    assert acts.shape == (N, 5)
    for i, b in enumerate(buckets):
        assert int(acts[:, i].max()) < b
    lp = dist.log_prob(acts)
    assert lp.shape == (N,)
    assert (np.asarray(lp) <= 0).all()
    ent = dist.entropy()
    max_ent = sum(np.log(b) for b in buckets)
    assert ((np.asarray(ent) > 0) & (np.asarray(ent) <= max_ent + 1e-4)).all()


def test_dreamer_critic_two_hot():
    feats = jax.random.normal(jax.random.PRNGKey(0), (N, 64))
    critic = DreamerV3Critic()
    params = critic.init(jax.random.PRNGKey(1), feats)
    out = critic.apply(params, feats)
    assert out["value"].shape == (N, 1)
    # Zero-initialized head -> uniform categorical -> value approx 0... the
    # symexp of the mean bin; just require finite.
    assert np.isfinite(np.asarray(out["value"])).all()
    targets = jnp.linspace(-5.0, 5.0, N)
    loss = critic.two_hot_loss(out["logits"], targets)
    assert loss.shape == (N,)
    assert (np.asarray(loss) > 0).all()


def test_lstm_state_clear():
    lstm = LSTM(num_hidden_channels=32, num_layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, 16))
    state0 = lstm.init_recurrent_state(N)
    params = lstm.init(jax.random.PRNGKey(1), state0, x)
    out, state1 = lstm.apply(params, state0, x)
    assert out.shape == (N, 32)
    assert not np.allclose(np.asarray(state1[0]), 0.0)
    cleared = lstm.clear_recurrent_state(state1, jnp.ones((N,), bool))
    np.testing.assert_allclose(np.asarray(cleared[0]), 0.0)

    # Sequence replay matches step-by-step application.
    T = 6
    seq = jax.random.normal(jax.random.PRNGKey(2), (T, N, 16))
    ends = jnp.zeros((T, N), bool).at[2].set(True)
    outs_seq = lstm.apply(params, state0, ends, seq,
                          method=lstm.sequence)
    s = state0
    outs_manual = []
    for t in range(T):
        o, s = lstm.apply(params, s, seq[t])
        outs_manual.append(o)
        s = lstm.clear_recurrent_state(s, ends[t])
    np.testing.assert_allclose(np.asarray(outs_seq),
                               np.asarray(jnp.stack(outs_manual)),
                               rtol=2e-5, atol=2e-5)


def test_normalizer():
    norm = ObservationsEMANormalizer.create(
        decay=0.99, dtype=jnp.float32,
        prep_fns={"prep_counter": lambda x: x.astype(jnp.float32) / 96.0},
        skip_normalization={"prep_counter", "self_mask", "self_type",
                            "vis_agents_mask", "vis_boxes_mask",
                            "vis_ramps_mask"})
    obs = _fake_obs(jax.random.PRNGKey(0))
    prepped = norm.prep(obs)
    state = norm.init_state(prepped)
    assert "prep_counter" not in state.mean
    assert "self_data" in state.mean
    for _ in range(200):
        state = norm.update_state(state, prepped)
    out = norm.normalize(state, prepped)
    # After many updates on constant data, normalized output approx 0 mean.
    assert abs(float(out["self_data"].mean())) < 1.0
    np.testing.assert_allclose(np.asarray(out["prep_counter"]),
                               np.asarray(prepped["prep_counter"]))


def test_full_policy_forward():
    policy = make_policy(dtype=jnp.float32)
    obs = _fake_obs(jax.random.PRNGKey(0))
    prepped = policy.obs_preprocess.prep(obs)
    ac = policy.actor_critic
    rnn0 = ac.init_recurrent_state(N)
    params = ac.init(jax.random.PRNGKey(1), rnn0, prepped)
    dists, critic_out, rnn1 = ac.apply(params, rnn0, prepped)
    acts = dists.sample(jax.random.PRNGKey(2))
    assert acts.shape == (N, 5)
    assert critic_out["value"].shape == (N, 1)

    # Sequence path produces the same structures over [T, N, ...].
    T = 4
    seq_obs = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (T,) + x.shape), prepped)
    ends = jnp.zeros((T, N), bool)
    dists_seq, critic_seq = ac.apply(params, rnn0, ends, seq_obs,
                                     method=ac.sequence)
    assert critic_seq["value"].shape == (T, N, 1)
    lp = dists_seq.log_prob(jnp.broadcast_to(acts[None], (T, N, 5)))
    assert lp.shape == (T, N)


def test_attention_backbone():
    policy = make_policy(dtype=jnp.float32, backbone="attention")
    obs = _fake_obs(jax.random.PRNGKey(0))
    prepped = policy.obs_preprocess.prep(obs)
    ac = policy.actor_critic
    rnn0 = ac.init_recurrent_state(N)
    params = ac.init(jax.random.PRNGKey(1), rnn0, prepped)
    dists, critic_out, _ = ac.apply(params, rnn0, prepped)
    assert critic_out["value"].shape == (N, 1)
