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
    """Batched ELO update from match results — bounded per-pair update.

    elo: [P]; idx_a/idx_b: [M] policy indices; score_a: [M] in {0, 0.5, 1};
    valid: [M] bool.

    A rollout window can contain hundreds of finished matches, often many
    between the same pair. Summing a per-match Jacobi delta (K per match
    against pre-match ratings) moves a rating by K*M in one call and
    diverges without bound. Instead the matches are aggregated into a
    per-ordered-pair average score, each pair contributes at most one
    K-scaled delta per call, and the population mean is re-anchored at
    ELO_START (ratings are only meaningful relative to each other;
    reference maintains a similarly bounded MMR,
    /root/reference/scripts/jax_train.py:243-275).
    """
    p = elo.shape[0]
    v = valid.astype(jnp.float32)
    v = v * (idx_a != idx_b).astype(jnp.float32)  # self-play carries no info
    # Per-pair aggregation as a one-hot contraction (scatter-adds over a
    # [M]-sized index vector scalarize on TPU; M is ~40K per update).
    # Scale note: the [M, P^2] one-hot is a transient (e.g. 42 MB at the
    # 16K-world config with P=4); at very large populations (P >= 16)
    # combined with huge M, pre-reduce per chunk before this call.
    pair = idx_a * p + idx_b
    oh = jax.nn.one_hot(pair, p * p, dtype=jnp.float32)  # [M, P*P]
    score_sum = (score_a * v) @ oh                       # [P*P]
    count = v @ oh
    avg_score = score_sum / jnp.maximum(count, 1.0)
    have = (count > 0.0).astype(jnp.float32)

    exp_a = elo_expected(elo[:, None], elo[None, :])     # [P, P] a-vs-b
    d = (ELO_K * (avg_score.reshape(p, p) - exp_a) * have.reshape(p, p))
    delta = jnp.sum(d, axis=1) - jnp.sum(d, axis=0)      # +as-a, -as-b
    new_elo = elo + delta
    return new_elo - jnp.mean(new_elo) + ELO_START


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
    # A team slot can be policy-less (-1) when an episode spawned an
    # empty team; such matches carry no rating information.
    valid = flat_done & (flat_pol[:, 0] >= 0) & (flat_pol[:, 1] >= 0)
    return (flat_pol[:, 0], flat_pol[:, 1], flat_res[:, 0], valid)


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
