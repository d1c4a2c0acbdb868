"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the standard way to
test pod-slice code without TPU hardware; see SURVEY.md §4.
"""

import os

# Force CPU: the machine environment pre-registers a TPU tunnel backend at
# interpreter startup (sitecustomize) and pins JAX_PLATFORMS to it; the env
# var alone does not win, so also override via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the env/train graphs are large and dominate
# suite wall time; repeated runs (and repeated identical jits across test
# files) hit the cache instead of recompiling.
from marl_hideandseek_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(__file__), ".xla_cache"))
