"""ELO / MMR tracking for policy populations.

Capability parity with madrona_learn's ELO machinery (reference usage:
eval_elo + policy_states.mmr.elo at jax_train.py:243-275, pretty printer at
scripts/common.py:1-16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

ELO_K = 16.0
ELO_START = 1500.0


def elo_expected(elo_a, elo_b):
    return 1.0 / (1.0 + jnp.power(10.0, (elo_b - elo_a) / 400.0))


def update_elo_pairwise(elo, idx_a, idx_b, score_a, valid):
    """Batched ELO update from match results.

    elo: [P]; idx_a/idx_b: [M] policy indices; score_a: [M] in {0, 0.5, 1};
    valid: [M] bool. Simultaneous (Jacobi) update: deltas are accumulated
    against the pre-match ratings.
    """
    ea = elo[idx_a]
    eb = elo[idx_b]
    exp_a = elo_expected(ea, eb)
    v = valid.astype(jnp.float32)
    delta_a = ELO_K * (score_a - exp_a) * v
    delta = jnp.zeros_like(elo)
    delta = delta.at[idx_a].add(delta_a)
    delta = delta.at[idx_b].add(-delta_a)
    return elo + delta


def matches_from_episode_results(episode_results, team_policies, dones_w):
    """Convert finished-episode scores to (idx_a, idx_b, score_a, valid).

    episode_results: [.., W, 2] finished scores per team slot
    (reference: EpisodeResult src/sim.hpp:113-115);
    team_policies: [.., W, 2] policy index of each team slot;
    dones_w: [.., W] bool — which worlds finished this step.
    """
    flat_res = episode_results.reshape(-1, 2)
    flat_pol = team_policies.reshape(-1, 2)
    flat_done = dones_w.reshape(-1)
    return (flat_pol[:, 0], flat_pol[:, 1], flat_res[:, 0], flat_done)


def eval_elo(training_mgr):
    """Run a dedicated evaluation pass and update population ELOs
    (reference: madrona_learn.eval_elo, jax_train.py:243-244).

    Implemented as a method call so both the class method and the module
    function spelling work (the reference exposes the latter).
    """
    return training_mgr.eval_elo()


def print_elos(elos):
    """Pretty printer (reference: scripts/common.py:1-16)."""
    elos = np.asarray(elos)
    order = np.argsort(elos)[::-1]
    print("ELOs:")
    for rank, idx in enumerate(order):
        print(f"  #{rank + 1}  policy {idx}: {elos[idx]:.1f}")
