from .losses import bce_elementwise, escm_loss, l2_regularization, multitask_loss
from .metrics import get_metric_fns, masked_test_metrics, regime_eval
from .multi_seed import SeedSuiteTrainer
from .optimizers import get_optimizer
from .pcgrad import pcgrad_merge
from .sweep import GridSweepTrainer
from .trainer import Trainer, get_mask, resolve_table_container

__all__ = [
    "GridSweepTrainer",
    "SeedSuiteTrainer",
    "Trainer",
    "bce_elementwise",
    "escm_loss",
    "get_mask",
    "get_metric_fns",
    "get_optimizer",
    "l2_regularization",
    "masked_test_metrics",
    "multitask_loss",
    "pcgrad_merge",
    "regime_eval",
    "resolve_table_container",
]
