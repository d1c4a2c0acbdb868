"""marl_hideandseek_tpu: TPU-native multi-agent hide-and-seek RL framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the Madrona-engine
GPU hide-and-seek batch simulator (reference: jedward225/MARL-HideAndSeek).
The environment is a pure function stepping thousands of worlds in lockstep
under a single ``jit``; the recurrent PPO learner (with PBT + ELO eval) runs
fused in the same XLA program; scaling is via ``jax.sharding`` meshes over
ICI/DCN rather than the reference's CUDA megakernel + host memcpy export path.

Public surface:
  - :mod:`marl_hideandseek_tpu.config`   — EnvConfig / SimFlags
  - :mod:`marl_hideandseek_tpu.env`      — the batched environment (init/step/ckpt)
  - :mod:`marl_hideandseek_tpu.models`   — policy building blocks
  - :mod:`marl_hideandseek_tpu.train`    — PPO / PBT training library
  - :mod:`marl_hideandseek_tpu.parallel` — mesh / sharding helpers
"""

from marl_hideandseek_tpu.version import __version__
from marl_hideandseek_tpu.config import EnvConfig, SimFlags

__all__ = [
    "__version__",
    "EnvConfig",
    "SimFlags",
    "HideAndSeekEnv",
]


def __getattr__(name):
    # Lazy (PEP 562): an eager `from .env import HideAndSeekEnv` would
    # build module-level jnp constants at package import and initialize
    # the XLA backend — which must NOT happen before
    # jax.distributed.initialize() in multi-host workers
    # (utils/runtime.py::init_distributed, tests/test_multihost.py).
    if name == "HideAndSeekEnv":
        from marl_hideandseek_tpu.env import HideAndSeekEnv

        return HideAndSeekEnv
    raise AttributeError(name)
