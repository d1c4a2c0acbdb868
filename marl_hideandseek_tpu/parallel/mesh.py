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
