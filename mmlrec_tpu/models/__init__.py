"""Model zoo registry (reference main.py:37-68).

All 14 families from the reference, plus 'pcg' (MMoE trained with PCGrad,
reference main.py:53-54) and 'escm_dr' (reachable here; the reference's
get_model silently returns None for it).  Unknown names raise instead of
returning None (reference bug, SURVEY §2.4.6).
"""

from __future__ import annotations

from ..config import ExperimentConfig
from ..features import FeatureLayout
from .aitm import AITM
from .apg import APG
from .base import RecModel
from .cross_stitch import CrossStitch
from .esmm import ESCM, ESMM
from .hmoe import HMOE
from .mlp import MLP
from .mmoe import MMOE
from .pepnet import PepNet
from .ple import PLE
from .sharedbottom import SharedBottom
from .snr import MSSM, SNRTrans
from .star import STAR

MODEL_REGISTRY = {
    "mmoe": MMOE,
    "esmm": ESMM,
    "sharedbottom": SharedBottom,
    "ple": PLE,
    "snr_trans": SNRTrans,
    "mssm": MSSM,
    "star": STAR,
    "pcg": MMOE,
    "apg": APG,
    "mlp": MLP,
    "cross_stitch": CrossStitch,
    "aitm": AITM,
    "escm": ESCM,
    "escm_dr": ESCM,
    "hmoe": HMOE,
    "pepnet": PepNet,
}


def get_model(
    model_name: str, layout: FeatureLayout, cfg: ExperimentConfig, init_std: float = 1e-4
) -> RecModel:
    name = model_name.lower()
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {model_name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](layout=layout, cfg=cfg, init_std=init_std)


__all__ = [
    "AITM", "APG", "CrossStitch", "ESCM", "ESMM", "HMOE", "MLP", "MMOE",
    "MODEL_REGISTRY", "MSSM", "PLE", "PepNet", "RecModel", "STAR",
    "SNRTrans", "SharedBottom", "get_model",
]
