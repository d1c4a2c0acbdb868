"""Actor-critic composition: backbones, encoders, the Policy bundle.

Capability parity with the madrona_learn composition objects used by the
reference policy (scripts/jax_policy.py:13-18, 336-399): Backbone{Shared,
Separate}, (Recurrent)BackboneEncoder, ActorCritic, Policy. Functional
recurrent state is threaded explicitly so the whole rollout/train loop stays
inside one jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from marl_hideandseek_tpu.models.normalizer import ObservationsEMANormalizer


class BackboneEncoder(nn.Module):
    """Feed-forward encoder (no recurrence)."""

    net: nn.Module

    def init_recurrent_state(self, n):
        return ()

    def clear_recurrent_state(self, states, should_clear):
        return ()

    @nn.compact
    def __call__(self, rnn_states, obs, train):
        return self.net(obs, train), ()

    def sequence(self, start_states, seq_ends, seq_obs, train):
        return self.net(seq_obs, train)


class RecurrentBackboneEncoder(nn.Module):
    """Feature net followed by an RNN (reference:
    scripts/jax_policy.py:337-353 — SimpleNet + LSTM(256) + LayerNorm)."""

    net: nn.Module
    rnn: nn.Module

    def setup(self):
        # Shared by __call__ and sequence; must live in setup so both
        # methods resolve the same parameters.
        self.rnn_norm = nn.LayerNorm()

    def init_recurrent_state(self, n):
        return self.rnn.init_recurrent_state(n)

    def clear_recurrent_state(self, states, should_clear):
        return self.rnn.clear_recurrent_state(states, should_clear)

    def __call__(self, rnn_states, obs, train):
        features = self.net(obs, train)
        out, new_states = self.rnn(rnn_states, features, train)
        return self.rnn_norm(out), new_states

    def sequence(self, start_states, seq_ends, seq_obs, train):
        features = self.net(seq_obs, train)
        outs = self.rnn.sequence(start_states, seq_ends, features, train)
        return self.rnn_norm(outs)


class BackboneShared(nn.Module):
    """One encoder feeding both heads."""

    prefix: Callable
    encoder: nn.Module

    def init_recurrent_state(self, n):
        return (self.encoder.init_recurrent_state(n),)

    def clear_recurrent_state(self, states, should_clear):
        return (self.encoder.clear_recurrent_state(states[0], should_clear),)

    @nn.compact
    def __call__(self, rnn_states, obs, train):
        obs = self.prefix(obs, train) if self.prefix else obs
        feat, new_state = self.encoder(rnn_states[0], obs, train)
        return (feat, feat), (new_state,)

    def actor_only(self, rnn_states, obs, train):
        """Shared encoder: actor-only is the full encoder pass."""
        obs = self.prefix(obs, train) if self.prefix else obs
        feat, new_state = self.encoder(rnn_states[0], obs, train)
        return feat, (new_state,)

    def sequence(self, start_states, seq_ends, seq_obs, train):
        seq_obs = self.prefix(seq_obs, train) if self.prefix else seq_obs
        feat = self.encoder.sequence(start_states[0], seq_ends, seq_obs,
                                     train)
        return feat, feat


class BackboneSeparate(nn.Module):
    """Separate actor/critic encoders (reference:
    scripts/jax_policy.py:355-361)."""

    prefix: Callable
    actor_encoder: nn.Module
    critic_encoder: nn.Module

    def init_recurrent_state(self, n):
        return (self.actor_encoder.init_recurrent_state(n),
                self.critic_encoder.init_recurrent_state(n))

    def clear_recurrent_state(self, states, should_clear):
        return (
            self.actor_encoder.clear_recurrent_state(states[0], should_clear),
            self.critic_encoder.clear_recurrent_state(states[1],
                                                      should_clear),
        )

    @nn.compact
    def __call__(self, rnn_states, obs, train):
        obs = self.prefix(obs, train) if self.prefix else obs
        a_feat, a_state = self.actor_encoder(rnn_states[0], obs, train)
        c_feat, c_state = self.critic_encoder(rnn_states[1], obs, train)
        return (a_feat, c_feat), (a_state, c_state)

    def actor_only(self, rnn_states, obs, train):
        """Actor encoder only (frozen-policy rollouts skip the critic);
        the critic recurrent state passes through unchanged — it is
        cleared at the same episode boundary where a slot can be
        reassigned, so no stale state ever reaches a live critic."""
        obs = self.prefix(obs, train) if self.prefix else obs
        a_feat, a_state = self.actor_encoder(rnn_states[0], obs, train)
        return a_feat, (a_state, rnn_states[1])

    def sequence(self, start_states, seq_ends, seq_obs, train):
        seq_obs = self.prefix(seq_obs, train) if self.prefix else seq_obs
        a = self.actor_encoder.sequence(start_states[0], seq_ends, seq_obs,
                                        train)
        c = self.critic_encoder.sequence(start_states[1], seq_ends, seq_obs,
                                         train)
        return a, c


class ActorCritic(nn.Module):
    """Backbone + discrete actor head + critic head."""

    backbone: nn.Module
    actor: nn.Module
    critic: nn.Module

    def init_recurrent_state(self, n):
        return self.backbone.init_recurrent_state(n)

    def clear_recurrent_state(self, states, should_clear):
        return self.backbone.clear_recurrent_state(states, should_clear)

    @nn.compact
    def __call__(self, rnn_states, obs, train: bool = False):
        """Single rollout step: returns (action_dists, critic_out,
        new_rnn_states)."""
        (a_feat, c_feat), new_states = self.backbone(rnn_states, obs, train)
        dists = self.actor(a_feat)
        critic_out = self.critic(c_feat)
        return dists, critic_out, new_states

    def act(self, rnn_states, obs, train: bool = False):
        """Actor-only rollout step for frozen (past) policies: returns
        (action_dists, new_rnn_states) without evaluating the critic."""
        a_feat, new_states = self.backbone.actor_only(rnn_states, obs,
                                                      train)
        dists = self.actor(a_feat)
        return dists, new_states

    def sequence(self, start_states, seq_ends, seq_obs, train: bool = True):
        """BPTT replay over stored [T, N, ...] sequences."""
        a_feat, c_feat = self.backbone.sequence(
            start_states, seq_ends, seq_obs, train)
        dists = self.actor(a_feat)
        critic_out = self.critic(c_feat)
        return dists, critic_out


@dataclasses.dataclass(frozen=True)
class Policy:
    """Bundle of actor-critic module + observation preprocessing
    (reference: madrona_learn.Policy, scripts/jax_policy.py:395-399)."""

    actor_critic: ActorCritic
    obs_preprocess: Optional[ObservationsEMANormalizer] = None
    get_episode_scores: Callable = lambda episode_result: episode_result
