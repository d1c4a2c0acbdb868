"""Recurrent cells: LSTM with explicit functional state.

Capability parity with `madrona_learn.rnn.LSTM` as used by the reference
policy (scripts/jax_policy.py:39-82): create/clear recurrent state
externally, single-step application during rollout, and full-sequence
replay (with per-step state clearing at episode boundaries) during the BPTT
training epochs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTM(nn.Module):
    """Multi-layer LSTM. Recurrent state: (h, c) each [num_layers, N, C]."""

    num_hidden_channels: int
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.nowrap
    def init_recurrent_state(self, batch_size: int):
        shape = (self.num_layers, batch_size, self.num_hidden_channels)
        return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))

    @nn.nowrap
    def clear_recurrent_state(self, rnn_states, should_clear):
        """Zero the state where should_clear (e.g. episode done) is set.

        should_clear: [N] or [N, 1] bool/float.
        """
        h, c = rnn_states
        mask = jnp.reshape(should_clear, (1, -1, 1)).astype(h.dtype)
        return (h * (1.0 - mask), c * (1.0 - mask))

    def _cell(self, layer_idx, h, c, x):
        ch = self.num_hidden_channels
        gates = nn.Dense(
            4 * ch, use_bias=True, dtype=self.dtype,
            kernel_init=jax.nn.initializers.orthogonal(1.0),
            name=f"layer_{layer_idx}_ih",
        )(x) + nn.Dense(
            4 * ch, use_bias=False, dtype=self.dtype,
            kernel_init=jax.nn.initializers.orthogonal(1.0),
            name=f"layer_{layer_idx}_hh",
        )(h.astype(self.dtype))
        gates = gates.astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f + 1.0)  # forget-gate bias init trick
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    @nn.compact
    def __call__(self, rnn_states, x, train: bool = False):
        """Single step. x: [N, F]. Returns (out [N, C], new_states)."""
        h_all, c_all = rnn_states
        new_h, new_c = [], []
        inp = x
        for layer in range(self.num_layers):
            h, c = self._cell(layer, h_all[layer], c_all[layer], inp)
            new_h.append(h)
            new_c.append(c)
            inp = h.astype(self.dtype)
        return inp, (jnp.stack(new_h, 0), jnp.stack(new_c, 0))

    def sequence(self, start_states, seq_ends, seq_x, train: bool = False):
        """Replay a stored sequence for BPTT (reference capability:
        PolicyRNN.sequence, scripts/jax_policy.py:74-82).

        seq_x: [T, N, F]; seq_ends: [T, N] bool — state is cleared *after*
        steps where the episode ended. Returns [T, N, C] outputs.
        """
        def step(carry, xs):
            states = carry
            x_t, end_t = xs
            out, new_states = self(states, x_t, train)
            new_states = self.clear_recurrent_state(new_states, end_t)
            return new_states, out

        _, outs = jax.lax.scan(step, start_states, (seq_x, seq_ends))
        return outs
