"""Runtime configuration helpers: compilation cache, distributed init,
NaN guards.

TPU equivalents of the reference's auxiliary runtime machinery
(SURVEY.md §5): the NVRTC kernel cache (MADRONA_MWGPU_KERNEL_CACHE env,
jax_train.sh:15) maps to the XLA persistent compilation cache; the
(stubbed) checkify NaN guards (jax_policy.py:30-37) map to jax debug_nans /
checkify gates; multi-host bring-up wraps jax.distributed.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature set.

    XLA's persistent cache stores CPU AOT executables compiled for the
    EXACT machine features of the compiling host; loading them on a host
    with a different feature set only logs a warning ("could lead to
    execution errors") and can then compute silently WRONG numerics
    (observed: a stale cache from a previous VM made a stacked-cube
    fixture collapse). Namespacing the cache by CPU fingerprint makes
    stale cross-machine entries unreachable."""
    import hashlib
    import platform

    desc = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    desc += line
                    break
    except OSError:
        desc += platform.processor()
    return hashlib.sha256(desc.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str = "~/.cache/mhs_tpu_xla"):
    """Persistent XLA compilation cache — the analogue of the reference's
    megakernel cache (MADRONA_MWGPU_KERNEL_CACHE): first build is slow,
    subsequent runs hit the cache. All CLI entry points enable this by
    default (the level-generator program alone takes minutes to build on
    the TPU backend); MHS_NO_COMPILE_CACHE=1 opts out. The directory is
    namespaced per host-CPU fingerprint (see _host_fingerprint)."""
    if os.environ.get("MHS_NO_COMPILE_CACHE"):
        return
    path = os.path.join(
        os.path.expanduser(os.environ.get("MHS_COMPILE_CACHE", cache_dir)),
        _host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def enable_nan_guards(enable: bool = True):
    """Debug-NaN gate (capability of the reference's stubbed checkify
    asserts). Costly: only for debugging."""
    jax.config.update("jax_debug_nans", enable)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host bring-up (SURVEY.md §2.5: multi-host DP over ICI/DCN).

    With no arguments, uses the TPU environment's automatic configuration.
    Call before any other JAX API on every host of the pod slice; then
    `parallel.make_mesh()` spans all hosts' devices.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def sync_hosts(name: str = "sync"):
    """Barrier across hosts (control-plane sync for checkpoint writes)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def is_primary_host() -> bool:
    """True on the host that should perform IO (logging, checkpoints)."""
    return jax.process_index() == 0


def global_metric_mean(value) -> float:
    """Mean of a host-local scalar metric across all processes.

    Multi-host metric reduction (SURVEY.md §2.5 comm-backend row): rides
    the control-plane collective (DCN between hosts), so per-host FPS /
    loss scalars aggregate without touching device state. Single-process:
    identity."""
    import numpy as np

    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    import jax.numpy as jnp

    gathered = multihost_utils.process_allgather(
        jnp.asarray(value, jnp.float32))
    return float(np.mean(np.asarray(gathered)))
