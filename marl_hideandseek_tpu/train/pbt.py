"""Population-based training: hyperparameter explore/exploit, past-policy
refresh.

Capability parity with madrona_learn's PBT (reference: PBTConfig +
ParamExplore at jax_train.py:100-137 — lr and entropy coef explored over a
x[0.1, 10] log10 range; past policies store frozen snapshots of train
policies for past-play matchmaking).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from marl_hideandseek_tpu.train.cfg import ParamExplore, TrainConfig


def sample_param(key, spec: ParamExplore, shape=()):
    """Sample a value in the explore range around spec.base."""
    u = jax.random.uniform(key, shape)
    if spec.log10_scale:
        lo = jnp.log10(jnp.asarray(spec.min_scale))
        hi = jnp.log10(jnp.asarray(spec.max_scale))
        scale = jnp.power(10.0, lo + u * (hi - lo))
    else:
        scale = spec.min_scale + u * (spec.max_scale - spec.min_scale)
    return spec.base * scale


def perturb_param(key, value, spec: ParamExplore):
    """Perturb an inherited value (exploit -> explore step): multiply by a
    random factor, clamped to the allowed range around base."""
    factor = jnp.where(jax.random.bernoulli(key), 1.2, 1.0 / 1.2)
    new = value * factor
    return jnp.clip(new, spec.base * spec.min_scale,
                    spec.base * spec.max_scale)


def _reward_specs(cfg: TrainConfig):
    """The PBT-explorable reward hyperparameters (reference:
    PBTConfig.reward_hyper_params_explore, jax_train.py:111 — empty in the
    reference recipe but a real capability of the config surface)."""
    if cfg.pbt is None:
        return {}
    return dict(cfg.pbt.reward_hyper_params_explore or {})


def init_hyper_params(cfg: TrainConfig, key) -> Dict[str, jnp.ndarray]:
    """Per-train-policy hyperparameters. With PBT each policy gets an
    independently sampled point; without, the configured scalars."""
    n = cfg.num_train_policies
    lr_spec = cfg.lr if isinstance(cfg.lr, ParamExplore) else None
    ec = cfg.algo.entropy_coef
    ec_spec = ec if isinstance(ec, ParamExplore) else None

    reward_specs = _reward_specs(cfg)
    k_lr, k_ec, *k_rw = jax.random.split(key, 2 + max(len(reward_specs), 1))
    lr = (sample_param(k_lr, lr_spec, (n,)) if lr_spec
          else jnp.full((n,), float(cfg.lr)))
    entropy = (sample_param(k_ec, ec_spec, (n,)) if ec_spec
               else jnp.full((n,), float(ec)))
    out = {"lr": lr, "entropy_coef": entropy}
    for k_spec, (name, spec) in zip(k_rw, sorted(reward_specs.items())):
        out[name] = sample_param(k_spec, spec, (n,))
    return out


def explore_exploit(cfg: TrainConfig, key, elo, params, opt_states,
                    hyper_params):
    """Copy the best policy's weights + perturbed hyperparams into the
    worst policy (classic PBT truncation selection, population >= 2)."""
    n = cfg.num_train_policies
    if n < 2:
        return params, opt_states, hyper_params

    train_elo = elo[:n]
    best = jnp.argmax(train_elo)
    worst = jnp.argmin(train_elo)

    def copy_into(tree):
        return jax.tree.map(
            lambda x: x.at[worst].set(x[best]), tree)

    params = copy_into(params)
    opt_states = copy_into(opt_states)

    k_lr, k_ec = jax.random.split(key)
    lr_spec = cfg.lr if isinstance(cfg.lr, ParamExplore) else None
    ec = cfg.algo.entropy_coef
    ec_spec = ec if isinstance(ec, ParamExplore) else None

    new_h = dict(hyper_params)
    if lr_spec is not None:
        new_h["lr"] = hyper_params["lr"].at[worst].set(
            perturb_param(k_lr, hyper_params["lr"][best], lr_spec))
    if ec_spec is not None:
        new_h["entropy_coef"] = hyper_params["entropy_coef"].at[worst].set(
            perturb_param(k_ec, hyper_params["entropy_coef"][best], ec_spec))
    reward_specs = _reward_specs(cfg)
    if reward_specs:
        k_rw = jax.random.split(key, len(reward_specs) + 2)[2:]
        for k_spec, (name, spec) in zip(k_rw, sorted(reward_specs.items())):
            new_h[name] = hyper_params[name].at[worst].set(
                perturb_param(k_spec, hyper_params[name][best], spec))
    return params, opt_states, new_h


def refresh_past_policies(cfg: TrainConfig, update_idx, params, past_params,
                          elo):
    """Rotate a snapshot of the current best train policy into the past
    population (round-robin slot)."""
    pbt = cfg.pbt
    if pbt is None or pbt.num_past_policies == 0:
        return past_params, elo

    n_train = pbt.num_train_policies
    slot = (update_idx // jnp.maximum(
        pbt.past_policy_update_interval, 1)) % pbt.num_past_policies
    best = jnp.argmax(elo[:n_train])

    new_past = jax.tree.map(
        lambda past, train: past.at[slot].set(train[best]),
        past_params, params)
    new_elo = elo.at[n_train + slot].set(elo[best])
    return new_past, new_elo
