from .domain_norm import DomainBatchNorm
from .embedding import EmbeddingCollection, FusedEmbedding
from .layers import (
    AITMAttention,
    CrossStitchLayer,
    GateNN,
    MLP,
    PredictionHeads,
    SharedSpecificDense,
    SNRGate,
    StackedDense,
    StackedMLP,
    activation_fn,
    sequence_pooling,
)

__all__ = [
    "AITMAttention",
    "CrossStitchLayer",
    "DomainBatchNorm",
    "EmbeddingCollection",
    "FusedEmbedding",
    "GateNN",
    "MLP",
    "PredictionHeads",
    "SharedSpecificDense",
    "SNRGate",
    "StackedDense",
    "StackedMLP",
    "activation_fn",
    "sequence_pooling",
]
