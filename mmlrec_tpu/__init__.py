"""mmlrec_tpu — TPU-native multi-task / multi-scenario recommendation
framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of
alipay/MMLRec-A-Unified-Multi-Task-and-Multi-Scenario-Learning-Benchmark-
for-Recommendation (mounted read-only at /root/reference during
development; cited as ``reference <file>:<line>`` throughout).
"""

__version__ = "0.1.0"

from .config import ExperimentConfig
from .features import DenseFeat, FeatureLayout, SparseFeat, VarLenSparseFeat
from .serving import ServingBundle, save_serving_bundle

__all__ = [
    "DenseFeat",
    "ExperimentConfig",
    "FeatureLayout",
    "ServingBundle",
    "SparseFeat",
    "VarLenSparseFeat",
    "save_serving_bundle",
]
