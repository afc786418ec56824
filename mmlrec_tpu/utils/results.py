"""Results CSV writer with the reference's row schema
(reference main.py:128-178): one row per (dataset, regime, model, seed) with
type, log_loss_i / auc_i per head, and total_auc for msl/mtmsl."""

from __future__ import annotations

import os
from typing import Dict

import pandas as pd


def append_result_row(path: str, row: Dict) -> None:
    if not path:
        return
    df = pd.DataFrame([row])
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        df.to_csv(path, index=False, header=True)
    else:
        df.to_csv(path, mode="a", index=False, header=False)
