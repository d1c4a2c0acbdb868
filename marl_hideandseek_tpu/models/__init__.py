"""Policy building blocks.

TPU-native re-implementation of the model surface the reference training
stack exposes (madrona_learn imports at scripts/jax_policy.py:13-28:
LayerNorm, MLP, EntitySelfAttentionNet, DenseLayerDiscreteActor,
DenseLayerCritic, DreamerV3Critic, LSTM, ObservationsEMANormalizer, ...).
All compute paths default to bfloat16 with float32 parameters/statistics,
sized to land on the MXU.
"""

from marl_hideandseek_tpu.models.layers import (
    MLP,
    DenseLayerCritic,
    DenseLayerDiscreteActor,
    DiscreteActionDistributions,
    DreamerV3Critic,
    EntitySelfAttentionNet,
    LayerNorm,
)
from marl_hideandseek_tpu.models.rnn import LSTM
from marl_hideandseek_tpu.models.normalizer import (
    ObservationsCaster,
    ObservationsEMANormalizer,
)
from marl_hideandseek_tpu.models.actor_critic import (
    ActorCritic,
    BackboneEncoder,
    BackboneSeparate,
    BackboneShared,
    Policy,
    RecurrentBackboneEncoder,
)

__all__ = [
    "LayerNorm", "MLP", "EntitySelfAttentionNet", "DenseLayerDiscreteActor",
    "DenseLayerCritic", "DreamerV3Critic", "DiscreteActionDistributions",
    "LSTM", "ObservationsEMANormalizer", "ObservationsCaster",
    "ActorCritic", "BackboneEncoder",
    "RecurrentBackboneEncoder", "BackboneShared", "BackboneSeparate",
    "Policy",
]
