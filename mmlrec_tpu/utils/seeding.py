"""Determinism helpers (reference set_seed, main.py:23-35).

JAX threads explicit PRNGKeys instead of global seeds and XLA is
deterministic by default, so this only needs to pin the host-side numpy
stream (shuffling, synthetic data) and hand back a root key.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
