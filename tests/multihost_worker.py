"""Worker process for the 2-process multi-host test (not a pytest module).

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh spanning 2 processes — the CI stand-in for a multi-host TPU
pod slice (SURVEY.md §4: jax.distributed over CPU devices). The worker:

  1. jax.distributed.initialize against a shared coordinator,
  2. builds the global ('data', 'model') mesh,
  3. runs ONE fully sharded training update (worlds split across
     processes; params replicated -> XLA inserts the gradient all-reduce),
  4. reduces a metric across hosts (DCN-analogue all-gather),
  5. writes an orbax checkpoint cooperatively (per-host array shards,
     host-0 metadata).

Prints "OK <loss>" on success. Usage:
  python tests/multihost_worker.py PORT PROCESS_ID NUM_PROCESSES CKPT_DIR
"""

import os
import sys

port, pid, nproc, ckpt_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from marl_hideandseek_tpu.utils.runtime import (  # noqa: E402
    global_metric_mean,
    init_distributed,
    is_primary_host,
    sync_hosts,
)

init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from marl_hideandseek_tpu.config import EnvConfig, SimFlags  # noqa: E402
from marl_hideandseek_tpu.env import HideAndSeekEnv  # noqa: E402
from marl_hideandseek_tpu.policy import make_policy  # noqa: E402
from marl_hideandseek_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    make_sharded_update,
)
from marl_hideandseek_tpu.train import (  # noqa: E402
    ActionsConfig,
    PPOConfig,
    TrainConfig,
    init_training,
)

W = 16  # global worlds; 2 per device over the 8-device global mesh

env = HideAndSeekEnv(EnvConfig(
    num_worlds=W, min_hiders=1, max_hiders=1, min_seekers=1, max_seekers=1,
    sim_flags=SimFlags.ZeroAgentVelocity | SimFlags.UseFixedWorld))
cfg = TrainConfig(
    num_worlds=W, num_agents_per_world=2, num_updates=1,
    actions=ActionsConfig(actions_num_buckets=[5, 5, 5, 2, 2]),
    steps_per_update=4, num_bptt_chunks=2, lr=1e-3, gamma=0.99,
    gae_lambda=0.95, algo=PPOConfig(num_mini_batches=1, num_epochs=1),
    dreamer_v3_critic=True, seed=5)
policy = make_policy(dtype=jnp.float32)

# Every process computes the same deterministic init, then device_put
# assembles the global (cross-process) arrays from the replicated values.
mgr = init_training(None, cfg, env, policy)
mesh = make_mesh()
mgr, update_j = make_sharded_update(mgr, mesh)

state = update_j(mgr.state)
jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
mgr = mgr.replace(state=state)
assert int(jax.device_get(state.update_idx)) == 1

# Host-local metric -> global mean over all processes (the DCN-aware
# metric reduction path).
local_loss = float(np.asarray(jax.device_get(state.metrics["loss"]))[0])
mean_loss = global_metric_mean(local_loss)
assert np.isfinite(mean_loss), mean_loss

# Cooperative orbax checkpoint: all hosts call save; array shards are
# written per-host, metadata by host 0.
path = mgr.save_ckpt(ckpt_dir)
sync_hosts("ckpt-done")
if is_primary_host():
    assert os.path.isdir(path), path

print(f"OK {mean_loss}", flush=True)
