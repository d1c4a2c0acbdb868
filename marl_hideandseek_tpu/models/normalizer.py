"""EMA observation normalizer.

Capability parity with `ObservationsEMANormalizer`
(reference usage: scripts/jax_policy.py:372-390 — decay 0.99999, per-key
prep functions applied first, and a skip set that passes masks/flags
through unnormalized). Functional: statistics are explicit state updated
during rollout collection, frozen during inference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, FrozenSet, Mapping

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NormalizerState:
    mean: Dict[str, jnp.ndarray]
    var: Dict[str, jnp.ndarray]
    count: jnp.ndarray  # scalar update counter (for bias correction)


@dataclasses.dataclass(frozen=True)
class ObservationsEMANormalizer:
    """Per-key EMA mean/variance normalization of observation dicts."""

    decay: float = 0.99999
    dtype: jnp.dtype = jnp.float32
    prep_fns: Mapping[str, Callable] = dataclasses.field(
        default_factory=dict)
    skip_normalization: FrozenSet[str] = frozenset()
    eps: float = 1e-5

    @staticmethod
    def create(decay, dtype, prep_fns=None, skip_normalization=()):
        return ObservationsEMANormalizer(
            decay=decay, dtype=dtype, prep_fns=dict(prep_fns or {}),
            skip_normalization=frozenset(skip_normalization))

    def prep(self, obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Apply per-key preprocessing casts, then the compute dtype."""
        out = {}
        for k, v in obs.items():
            if k in self.prep_fns:
                v = self.prep_fns[k](v)
            else:
                v = v.astype(self.dtype)
            out[k] = v
        return out

    def init_state(self, obs: Dict[str, jnp.ndarray]) -> NormalizerState:
        mean = {}
        var = {}
        for k, v in obs.items():
            if k in self.skip_normalization:
                continue
            feat = v.shape[-1]
            mean[k] = jnp.zeros((feat,), jnp.float32)
            var[k] = jnp.ones((feat,), jnp.float32)
        return NormalizerState(mean=mean, var=var,
                               count=jnp.zeros((), jnp.float32))

    def update_state(self, state: NormalizerState,
                     obs: Dict[str, jnp.ndarray]) -> NormalizerState:
        """EMA update over all leading axes of each normalized key."""
        d = self.decay
        new_mean, new_var = {}, {}
        for k in state.mean:
            v = obs[k].astype(jnp.float32)
            axes = tuple(range(v.ndim - 1))
            m = jnp.mean(v, axis=axes)
            sq = jnp.mean(jnp.square(v - m), axis=axes)
            new_mean[k] = d * state.mean[k] + (1.0 - d) * m
            new_var[k] = d * state.var[k] + (1.0 - d) * sq
        return NormalizerState(mean=new_mean, var=new_var,
                               count=state.count + 1.0)

    def normalize(self, state: NormalizerState,
                  obs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = {}
        for k, v in obs.items():
            if k in state.mean:
                inv_std = jax.lax.rsqrt(state.var[k] + self.eps)
                v = ((v.astype(jnp.float32) - state.mean[k]) * inv_std
                     ).astype(self.dtype)
            out[k] = v
        return out

    def prep_and_normalize(self, state, obs):
        return self.normalize(state, self.prep(obs))


@dataclasses.dataclass(frozen=True)
class ObservationsCaster:
    """Cast-only observation preprocessor (no statistics), the
    madrona_learn.ObservationsCaster capability — a drop-in alternative to
    the EMA normalizer when raw obs scales are acceptable."""

    dtype: jnp.dtype = jnp.float32
    prep_fns: Mapping[str, Callable] = dataclasses.field(
        default_factory=dict)

    @staticmethod
    def create(dtype, prep_fns=None):
        return ObservationsCaster(dtype=dtype, prep_fns=dict(prep_fns or {}))

    def prep(self, obs):
        out = {}
        for k, v in obs.items():
            if k in self.prep_fns:
                out[k] = self.prep_fns[k](v)
            else:
                out[k] = v.astype(self.dtype)
        return out

    def init_state(self, obs):
        return NormalizerState(mean={}, var={},
                               count=jnp.zeros((), jnp.float32))

    def update_state(self, state, obs):
        return state.replace(count=state.count + 1.0)

    def normalize(self, state, obs):
        return obs

    def prep_and_normalize(self, state, obs):
        return self.prep(obs)
