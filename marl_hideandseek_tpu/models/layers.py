"""Core layers: LayerNorm, MLP, entity attention, actor/critic heads.

Capability parity targets (SURVEY.md §2.4 E13): the `madrona_learn.models`
surface consumed by the reference policy (scripts/jax_policy.py:20-27).
TPU notes: dense layers run in the caller-chosen compute dtype (bf16 for
training) with fp32 params; LayerNorm statistics accumulate in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _orthogonal(scale: float = 2.0 ** 0.5):
    return jax.nn.initializers.orthogonal(scale=scale)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype."""

    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", jax.nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        bias = self.param("bias", jax.nn.initializers.zeros, (x.shape[-1],),
                          jnp.float32)
        return (normed * scale + bias).astype(orig_dtype)


class MLP(nn.Module):
    """Stack of Dense + LayerNorm + leaky-relu blocks."""

    num_channels: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_layers):
            x = nn.Dense(
                self.num_channels,
                use_bias=True,
                kernel_init=_orthogonal(),
                bias_init=jax.nn.initializers.zeros,
                dtype=self.dtype,
            )(x)
            x = LayerNorm(dtype=self.dtype)(x)
            x = nn.leaky_relu(x)
        return x


class EmbedBlock(nn.Module):
    """Dense + LayerNorm + leaky-relu entity embedding."""

    num_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.num_channels, use_bias=True, kernel_init=_orthogonal(),
            bias_init=jax.nn.initializers.zeros, dtype=self.dtype)(x)
        x = LayerNorm(dtype=self.dtype)(x)
        return nn.leaky_relu(x)


class EntitySelfAttentionNet(nn.Module):
    """Per-entity embed -> multi-head self attention over the entity axis ->
    mean-pool -> output MLP (the reference alternative backbone,
    scripts/jax_policy.py:287-292 config: 128 embed, 256 out, 4 heads).

    Input: dict with 'self' [.., F] and entity groups [.., N_i, F_i].
    """

    num_embed_channels: int = 128
    num_out_channels: int = 256
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, train: bool = False):
        self_ob = obs["self"]
        groups = [(k, v) for k, v in sorted(obs.items()) if k != "self"]

        self_embed = EmbedBlock(self.num_embed_channels, self.dtype)(self_ob)
        tokens = [self_embed[..., None, :]]
        for name, g in groups:
            tokens.append(
                EmbedBlock(self.num_embed_channels, self.dtype,
                           name=f"embed_{name}")(g))
        seq = jnp.concatenate(tokens, axis=-2)  # [.., T, C]

        attn_out = nn.SelfAttention(
            num_heads=self.num_heads,
            qkv_features=self.num_embed_channels,
            out_features=self.num_embed_channels,
            dtype=self.dtype,
            kernel_init=_orthogonal(1.0),
        )(seq)
        seq = LayerNorm(dtype=self.dtype)(seq + attn_out)

        pooled = jnp.mean(seq, axis=-2)
        out = nn.Dense(self.num_out_channels, dtype=self.dtype,
                       kernel_init=_orthogonal())(pooled)
        out = LayerNorm(dtype=self.dtype)(out)
        return nn.leaky_relu(out)


@dataclasses.dataclass(frozen=True)
class DiscreteActionDistributions:
    """Factored categorical distribution over independent action dims
    (capability of madrona_learn's action distribution object)."""

    buckets: tuple
    logits: Any  # [.., sum(buckets)] raw logits

    def _split(self):
        out = []
        off = 0
        for n in self.buckets:
            out.append(self.logits[..., off:off + n].astype(jnp.float32))
            off += n
        return out

    def sample(self, key):
        keys = jax.random.split(key, len(self.buckets))
        actions = [
            jax.random.categorical(k, lg)
            for k, lg in zip(keys, self._split())
        ]
        return jnp.stack(actions, axis=-1)

    def best(self):
        return jnp.stack(
            [jnp.argmax(lg, axis=-1) for lg in self._split()], axis=-1)

    def log_prob(self, actions):
        # One-hot contraction instead of take_along_axis: per-row gathers
        # scalarize on TPU; the multiply-reduce over <=5 buckets is exact.
        lps = []
        for i, lg in enumerate(self._split()):
            logp = jax.nn.log_softmax(lg, axis=-1)
            oh = jax.nn.one_hot(actions[..., i], lg.shape[-1],
                                dtype=logp.dtype)
            lps.append(jnp.sum(logp * oh, axis=-1))
        return jnp.sum(jnp.stack(lps, axis=-1), axis=-1)

    def entropy(self):
        ents = []
        for lg in self._split():
            logp = jax.nn.log_softmax(lg, axis=-1)
            p = jnp.exp(logp)
            ents.append(-jnp.sum(p * logp, axis=-1))
        return jnp.sum(jnp.stack(ents, axis=-1), axis=-1)


class DenseLayerDiscreteActor(nn.Module):
    """Single dense head emitting factored categorical logits
    (reference: DenseLayerDiscreteActor with buckets [5,5,5,2,2],
    scripts/jax_policy.py:365-368)."""

    buckets: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        total = sum(self.buckets)
        logits = nn.Dense(
            total, use_bias=True, kernel_init=_orthogonal(0.01),
            bias_init=jax.nn.initializers.zeros, dtype=self.dtype,
        )(features)
        return DiscreteActionDistributions(tuple(self.buckets), logits)


class DenseLayerCritic(nn.Module):
    """Plain scalar value head."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        v = nn.Dense(1, use_bias=True, kernel_init=_orthogonal(1.0),
                     dtype=self.dtype)(features)
        return v.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Dreamer-V3 style critic: symlog two-hot categorical value head.
# ---------------------------------------------------------------------------


def symlog(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


class DreamerV3Critic(nn.Module):
    """Categorical critic over symlog-spaced bins with two-hot targets
    (capability of madrona_learn's DreamerV3Critic; cfg
    dreamer_v3_critic=True at scripts/jax_train.py:164).

    __call__ returns dict with 'logits' [.., num_bins] and 'value' [.., 1]
    (expected symexp value). Use `two_hot_loss` as the regression loss.
    """

    dtype: jnp.dtype = jnp.float32
    num_bins: int = 255
    lo: float = -20.0
    hi: float = 20.0

    def bin_centers(self):
        return jnp.linspace(self.lo, self.hi, self.num_bins)

    @nn.compact
    def __call__(self, features):
        logits = nn.Dense(
            self.num_bins, use_bias=True,
            kernel_init=jax.nn.initializers.zeros,
            bias_init=jax.nn.initializers.zeros, dtype=self.dtype,
        )(features).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        value = symexp(jnp.sum(probs * self.bin_centers(), axis=-1))
        return {"logits": logits, "value": value[..., None]}

    def two_hot_loss(self, logits, target_values):
        """Cross-entropy against the two-hot encoding of symlog targets."""
        target = symlog(target_values)
        centers = self.bin_centers()
        target = jnp.clip(target, self.lo, self.hi)
        idx = (target - self.lo) / (self.hi - self.lo) * (self.num_bins - 1)
        lo_idx = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0,
                          self.num_bins - 1)
        hi_idx = jnp.clip(lo_idx + 1, 0, self.num_bins - 1)
        hi_w = idx - lo_idx.astype(jnp.float32)
        lo_w = 1.0 - hi_w

        logp = jax.nn.log_softmax(logits, axis=-1)
        # One-hot contractions (row gathers scalarize on TPU; exact).
        oh_lo = jax.nn.one_hot(lo_idx, self.num_bins, dtype=logp.dtype)
        oh_hi = jax.nn.one_hot(hi_idx, self.num_bins, dtype=logp.dtype)
        lp_lo = jnp.sum(logp * oh_lo, axis=-1)
        lp_hi = jnp.sum(logp * oh_hi, axis=-1)
        return -(lo_w * lp_lo + hi_w * lp_hi)
