"""Optimizer factory (reference _get_optim, model/basemodel.py:569-584).

optax transforms configured to match the torch defaults the reference
relies on:
  * adam:    betas (0.9, 0.999), eps 1e-8, bias correction
  * adagrad: initial accumulator 0.0, eps 1e-10 (torch defaults; optax's
             own defaults differ — 0.1 / 1e-7)
  * rmsprop: alpha/decay 0.99, eps 1e-8
  * sgd:     plain
"""

from __future__ import annotations

import optax


def get_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    name = (name or "").lower()
    if name == "sgd":
        return optax.sgd(lr)
    if name == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if name == "adagrad":
        return optax.adagrad(lr, initial_accumulator_value=0.0, eps=1e-10)
    if name == "rmsprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8)
    raise NotImplementedError(f"optimizer {name!r}")
