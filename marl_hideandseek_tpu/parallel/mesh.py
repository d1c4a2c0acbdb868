"""Device mesh + sharding layout for the fused actor-learner loop.

TPU-native replacement for the reference's single-GPU execution and
`cudaMemcpyAsync` export path (SURVEY.md §2.5): worlds are the first-class
data-parallel axis, sharded over all chips via `jax.sharding.NamedSharding`;
policy/optimizer state is replicated, so XLA inserts the gradient
all-reduce over ICI automatically during the PPO update. The mesh reserves
a 'model' axis for future tensor parallelism (unused at these model sizes —
the reference has no TP either, SURVEY.md §2.5).

Multi-host: call `jax.distributed.initialize()` before building the mesh;
`make_mesh` then spans all processes' devices and each host feeds its local
shard of worlds. This module is exercised on a virtual CPU mesh in CI
(tests/conftest.py) and by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1
              ) -> Mesh:
    """('data', 'model') mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % model_parallel == 0
    arr = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def _spec_for(path: str, leaf) -> P:
    """Sharding rule by state-tree path.

    Worlds-leading arrays (env state), agents-leading arrays (obs,
    assignments) and time-batched rollout buffers shard on 'data'; RNN
    states shard their batch axis (axis 1 for [L, N, H] leaves); everything
    else (params, optimizer, normalizer stats, metrics) replicates.
    """
    if leaf.ndim == 0:
        return P()
    if "rnn_states" in path:
        if leaf.ndim >= 2:
            return P(None, "data")
        return P()
    if "rollout" in path and "env_state" in path:
        # Packed env state (env/packed.py): the worlds axis is LAST.
        return P(*([None] * (leaf.ndim - 1) + ["data"]))
    if "rollout" in path and ("obs" in path or "assignments" in path or
                              "key" in path):
        if "key" in path:
            return P()
        return P("data")
    return P()


def training_state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a TrainingState."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    specs = []
    for path, leaf in flat:
        pathstr = jax.tree_util.keystr(path)
        specs.append(NamedSharding(mesh, _spec_for(pathstr, leaf)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(state), specs)


def shard_training_manager(mgr, mesh: Mesh):
    """Device_put the manager's state with the standard layout."""
    shardings = training_state_shardings(mgr.state, mesh)
    state = jax.device_put(mgr.state, shardings)
    return mgr.replace(state=state), shardings


def packed_env_specs(ps):
    """PartitionSpec pytree for a PACKED EnvState (env/packed.py): the
    worlds axis is LAST on every leaf and shards over 'data'."""
    return jax.tree.map(
        lambda x: (P(*([None] * (x.ndim - 1) + ["data"]))
                   if x.ndim else P()), ps)


def packed_env_shardings(ps, mesh: Mesh):
    """NamedSharding pytree for a PACKED EnvState."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        packed_env_specs(ps))


def make_sharded_packed_step(env, mesh: Mesh):
    """PackedEnv.step wrapped in shard_map over the mesh's 'data' axis.

    Each device steps its local slab of worlds through the full packed
    step (megastep Pallas kernel on TPU) with NO collectives — worlds
    are independent, so the conditional-reset branches may diverge per
    device safely. Global world ids are threaded through so episode RNG
    streams stay distinct across shards. The compact-reset budget
    applies PER SHARD (each device can staggered-reset up to
    cfg.reset_budget of its local worlds per step; beyond that it takes
    the full-batch path for its shard).

    Returns a jitted step(ps, actions) -> (ps', PackedStepResult);
    shard ps with packed_env_shardings first. Requires
    (num_worlds / data_axis_size) % 128 == 0 for the Pallas path on
    TPU. Degenerates to single-device on a 1-chip mesh, so the same
    harness produces a scaling number the day multi-chip hardware
    exists (bench.py BENCH_MESH=1)."""
    try:
        from jax.experimental.shard_map import shard_map
        _rep_kw = "check_rep"
    except ImportError:                                    # newer jax
        # jax.shard_map renamed check_rep -> check_vma.
        from jax import shard_map
        _rep_kw = "check_vma"
    from marl_hideandseek_tpu.env.packed import PackedStepResult

    def local_step(ps, actions, world_ids):
        return env.step(ps, actions, world_ids=world_ids)

    def stepper(ps, actions):
        state_specs = packed_env_specs(ps)
        res_sd = jax.eval_shape(lambda p, a: env.step(p, a), ps, actions)[1]
        res_specs = PackedStepResult(
            obs=jax.tree.map(
                lambda x: P("data", *([None] * (x.ndim - 1))), res_sd.obs),
            rewards=P(None, "data"),
            dones=P(None, "data"),
            episode_results=P(None, "data"),
            team_reward=P("data"),
        )
        fn = shard_map(
            local_step, mesh=mesh,
            in_specs=(state_specs, P(None, None, "data"), P("data")),
            out_specs=(state_specs, res_specs),
            **{_rep_kw: False},
        )
        w = ps.step.shape[-1]
        return fn(ps, actions, jnp.arange(w, dtype=jnp.uint32))

    return jax.jit(stepper)


def make_sharded_update(mgr, mesh: Mesh):
    """Jitted update_iter with explicit in/out shardings, ready for
    multi-chip execution."""
    mgr, shardings = shard_training_manager(mgr, mesh)

    # Shardings propagate from the input placement; donate to avoid copies.
    update_j = jax.jit(
        lambda s: mgr.replace(state=s).update_iter().state,
        in_shardings=(shardings,),
        out_shardings=shardings,
        donate_argnums=(0,),
    )
    return mgr, update_j
