"""Training library: recurrent PPO with PBT + ELO evaluation.

TPU-native re-implementation of the `madrona_learn` capability surface
consumed by the reference scripts (SURVEY.md §2.4 E13; imports at
scripts/jax_train.py:18-23 and scripts/jax_infer.py:15): fused on-device
actor-learner loop (rollout `lax.scan` over the jitted env step + PPO update
in one XLA program), BPTT-chunked recurrent training, population-based
training with per-agent policy assignments, ELO evaluation, checkpointing
and AOT compilation.
"""

from marl_hideandseek_tpu.train.cfg import (
    ActionsConfig,
    EvalConfig,
    PBTConfig,
    ParamExplore,
    PPOConfig,
    TrainConfig,
)
from marl_hideandseek_tpu.train.manager import (
    TrainHooks,
    TrainingManager,
    aot_compile,
    cfg_jax_mem,
    init_training,
    ring_scalar,
    stop_training,
)
from marl_hideandseek_tpu.train.elo import eval_elo, print_elos
from marl_hideandseek_tpu.train.evaluate import eval_load_ckpt, eval_policies
from marl_hideandseek_tpu.train.metrics import (
    TensorboardWriter,
    WandbWriter,
)

__all__ = [
    "ActionsConfig", "TrainConfig", "PPOConfig", "PBTConfig", "ParamExplore",
    "EvalConfig", "TrainHooks", "TrainingManager", "init_training",
    "aot_compile", "stop_training", "cfg_jax_mem", "ring_scalar",
    "eval_elo", "print_elos",
    "eval_policies", "eval_load_ckpt",
    "TensorboardWriter", "WandbWriter",
]
