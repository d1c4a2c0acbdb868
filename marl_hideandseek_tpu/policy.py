"""Default hide-and-seek policy assembly.

Functionally equivalent to the reference's policy definition
(scripts/jax_policy.py): per-entity-class embedding backbone with max-pool
("SimpleNet": embed 64 + LayerNorm + leaky-relu per class, max over
entities, concat, MLP 256x3 — jax_policy.py:113-167), LSTM(256) recurrent
encoder per branch, separate actor/critic backbones, discrete actor head
over [5,5,5,2,2] buckets and a Dreamer-V3 critic, with an EMA observation
normalizer whose prep/skip sets match jax_policy.py:372-390. An
entity-self-attention backbone is available as an alternative.

The obs->entity wiring (visibility masking of entity rows, self-obs concat
of prep counter/self data/type/lidar) mirrors jax_policy.py:84-98,260-292.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from marl_hideandseek_tpu.models import (
    MLP,
    ActorCritic,
    BackboneSeparate,
    DenseLayerDiscreteActor,
    DreamerV3Critic,
    EntitySelfAttentionNet,
    LayerNorm,
    ObservationsEMANormalizer,
    Policy,
    RecurrentBackboneEncoder,
)
from marl_hideandseek_tpu.models.layers import EmbedBlock
from marl_hideandseek_tpu.models.rnn import LSTM

DEFAULT_ACTION_BUCKETS = (5, 5, 5, 2, 2)  # reference: jax_train.py:147


def split_obs(obs):
    """Group the 11 named tensors into self + entity-class groups with
    visibility masking applied to entity rows.

    Accepts either the reference-shaped entity tensors (box_data
    [..., 9, 17] + vis_boxes_mask [..., 9, 1]) or the flat-feature layout
    the packed env emits (box_data [..., 153] + vis mask [..., 9];
    env/packed.py) — flat tensors are reshaped here, inside the policy's
    program, where XLA fuses the reshape into the entity embedding instead
    of materializing the padded [..., E, F] layout.
    """
    self_ob = jnp.concatenate([
        obs["prep_counter"],
        obs["self_data"],
        obs["self_type"],
        obs["self_lidar"],
    ], axis=-1)

    def entity(data, mask):
        if mask.ndim == data.ndim and mask.shape[-1] == 1:
            # Reference layout: data [..., E, F], mask [..., E, 1].
            return data * mask
        # Flat layout: data [..., E*F], mask [..., E]. The entity count
        # comes from the mask so non-default max_boxes/max_ramps configs
        # reshape correctly.
        data = data.reshape(*data.shape[:-1], mask.shape[-1], -1)
        return data * mask[..., None]

    agents = entity(obs["agent_data"], obs["vis_agents_mask"])
    boxes = entity(obs["box_data"], obs["vis_boxes_mask"])
    ramps = entity(obs["ramp_data"], obs["vis_ramps_mask"])
    return {"self": self_ob, "agents": agents, "boxes": boxes,
            "ramps": ramps}


class PooledEntityNet(nn.Module):
    """Embed each entity class, max-pool over entities, concat, MLP."""

    dtype: jnp.dtype
    embed_dim: int = 64
    num_channels: int = 256
    num_layers: int = 3

    @nn.compact
    def __call__(self, obs, train: bool = False):
        grouped = split_obs(obs)
        feats = [EmbedBlock(self.embed_dim, self.dtype, name="embed_self")(
            grouped["self"])]
        for name in ("agents", "boxes", "ramps"):
            e = EmbedBlock(self.embed_dim, self.dtype,
                           name=f"embed_{name}")(grouped[name])
            feats.append(jnp.max(e, axis=-2))
        x = jnp.concatenate(feats, axis=-1)
        return MLP(num_channels=self.num_channels,
                   num_layers=self.num_layers, dtype=self.dtype)(x, train)


class HashNet(nn.Module):
    """Experimental simhash lookup-table backbone (capability of the
    reference's HashNet, scripts/jax_policy.py:170-247): random projection
    of the concatenated obs to sign bits -> hash bin -> learned feature
    table row, with a stop-gradient on the hash."""

    dtype: jnp.dtype
    hash_power: int = 8
    feature_dim: int = 32

    @nn.compact
    def __call__(self, obs, train: bool = False):
        import jax

        grouped = split_obs(obs)
        flat = jnp.concatenate([
            grouped["self"],
            grouped["agents"].reshape(*grouped["agents"].shape[:-2], -1),
            grouped["boxes"].reshape(*grouped["boxes"].shape[:-2], -1),
            grouped["ramps"].reshape(*grouped["ramps"].shape[:-2], -1),
        ], axis=-1)

        proj = self.param(
            "proj",
            lambda rng, shape: jax.random.normal(rng, shape, self.dtype),
            (self.hash_power, flat.shape[-1]))
        bits = jnp.einsum("hf,...f->...h", proj, flat) > 0
        powers = 2 ** jnp.arange(self.hash_power)
        idx = jnp.sum(bits.astype(jnp.int32) * powers, axis=-1)
        idx = jax.lax.stop_gradient(idx)

        table = self.param(
            "table", jax.nn.initializers.he_normal(dtype=self.dtype),
            (2 ** self.hash_power, self.feature_dim))
        feats = table[idx]
        return LayerNorm(dtype=self.dtype)(feats)


class AttentionEntityNet(nn.Module):
    """Entity self-attention backbone alternative
    (reference: jax_policy.py:287-292)."""

    dtype: jnp.dtype
    num_embed_channels: int = 128
    num_out_channels: int = 256
    num_heads: int = 4

    @nn.compact
    def __call__(self, obs, train: bool = False):
        grouped = split_obs(obs)
        return EntitySelfAttentionNet(
            num_embed_channels=self.num_embed_channels,
            num_out_channels=self.num_out_channels,
            num_heads=self.num_heads,
            dtype=self.dtype,
        )(grouped, train)


def make_policy(dtype=jnp.float32,
                action_buckets: Sequence[int] = DEFAULT_ACTION_BUCKETS,
                backbone: str = "pooled",
                num_rnn_channels: int = 256) -> Policy:
    """Build the default policy (reference: make_policy,
    jax_policy.py:336-399)."""

    def encoder():
        if backbone == "pooled":
            net = PooledEntityNet(dtype=dtype)
        elif backbone == "attention":
            net = AttentionEntityNet(dtype=dtype)
        elif backbone == "hash":
            net = HashNet(dtype=dtype)
        else:
            raise ValueError(f"unknown backbone {backbone!r}")
        return RecurrentBackboneEncoder(
            net=net,
            rnn=LSTM(num_hidden_channels=num_rnn_channels, num_layers=1,
                     dtype=dtype),
        )

    actor_critic = ActorCritic(
        backbone=BackboneSeparate(
            prefix=None,
            actor_encoder=encoder(),
            critic_encoder=encoder(),
        ),
        actor=DenseLayerDiscreteActor(buckets=tuple(action_buckets),
                                      dtype=dtype),
        critic=DreamerV3Critic(dtype=dtype),
    )

    obs_preprocess = ObservationsEMANormalizer.create(
        decay=0.99999,
        dtype=dtype,
        prep_fns={
            "prep_counter":
                lambda x: (x.astype(jnp.float32) / 96.0).astype(dtype),
            "self_type": lambda x: x.astype(dtype),
            "vis_agents_mask": lambda x: x.astype(dtype),
            "vis_boxes_mask": lambda x: x.astype(dtype),
            "vis_ramps_mask": lambda x: x.astype(dtype),
        },
        skip_normalization={
            "prep_counter", "self_type", "self_mask", "vis_agents_mask",
            "vis_boxes_mask", "vis_ramps_mask",
        },
    )

    return Policy(
        actor_critic=actor_critic,
        obs_preprocess=obs_preprocess,
        get_episode_scores=lambda episode_result: episode_result,
    )
