"""Vmapped hyperparameter sweeps: a (seed x learning-rate) grid trains as
ONE program.

The reference's only experiment axis is the sequential seed loop
(reference main.py:85-89); tuning the lr for its 12 configs means re-running
the whole driver per value.  Here each grid combo carries its own stacked
parameters, optimizer state, and RNG/shuffle stream exactly as
train/multi_seed.py does for seeds; the learning rate additionally becomes a
per-combo LEAF of the optimizer state via ``optax.inject_hyperparams``, so
one compiled step advances every (seed, lr) combination concurrently.

Numerics per combo are exactly those of a solo ``Trainer`` run with that
seed and lr (pinned by tests/test_sweep.py): ``inject_hyperparams`` only
moves the lr from a compile-time constant to an optimizer-state leaf.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from .multi_seed import SeedSuiteTrainer


def injectable_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """get_optimizer (optimizers.py) with the lr as a dynamic state leaf;
    same torch-matching hyperparameters."""
    name = (name or "").lower()
    inj = optax.inject_hyperparams
    if name == "sgd":
        return inj(optax.sgd)(learning_rate=lr)
    if name == "adam":
        return inj(optax.adam)(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
    if name == "adagrad":
        return inj(optax.adagrad)(
            learning_rate=lr, initial_accumulator_value=0.0, eps=1e-10
        )
    if name == "rmsprop":
        return inj(optax.rmsprop)(learning_rate=lr, decay=0.99, eps=1e-8)
    raise NotImplementedError(f"optimizer {name!r}")


class GridSweepTrainer(SeedSuiteTrainer):
    """Train every (seed, lr) combination concurrently.

    ``grid`` rows are ``{"seed": int, "lr": float}``; alternatively pass
    ``seeds`` and ``lrs`` for the full cross product.  Everything else
    (fit/predict/histories/early stopping) behaves like SeedSuiteTrainer
    with one stacked axis of size ``len(grid)``.
    """

    def __init__(
        self,
        model,
        seeds: Sequence[int] = (0,),
        lrs: Optional[Sequence[float]] = None,
        grid: Optional[List[Dict]] = None,
    ):
        if grid is None:
            if lrs is None:
                raise ValueError("pass lrs=[...] or an explicit grid")
            grid = [{"seed": s, "lr": float(lr)} for s in seeds for lr in lrs]
        self.grid = list(grid)
        super().__init__(model, seeds=[g["seed"] for g in self.grid])
        self.labels = [f"s{g['seed']}/lr{g['lr']:g}" for g in self.grid]
        self.row_labels = [f"{g['seed']}_lr{g['lr']:g}" for g in self.grid]

    # ------------------------------------------------------------------
    def compile(self, optimizer=None, loss=None, metrics=None):
        oc = self.tr.cfg.optim_config
        name = optimizer or oc.optimizer
        if not isinstance(name, str):
            raise ValueError("GridSweepTrainer needs an optimizer NAME to "
                             "build the lr-injectable transform")
        tx = injectable_optimizer(name, oc.lr)
        for t in self.trainers:
            t.compile(optimizer=tx, loss=loss, metrics=metrics)
        return self

    def _init_opt_state(self, params):
        st = jax.vmap(self.tr.tx.init)(params)
        lrs = jnp.asarray([g["lr"] for g in self.grid], jnp.float32)
        hp = dict(st.hyperparams)
        hp["learning_rate"] = lrs
        return st._replace(hyperparams=hp)

    # ------------------------------------------------------------------
    def results(self) -> List[Dict]:
        """Per-combo summary: grid values, best val AUC, epochs run."""
        out = []
        for i, g in enumerate(self.grid):
            hist = self.histories[i]
            best = max((h.get("val_auc", 0.0) for h in hist), default=0.0)
            out.append({**g, "best_val_auc": best, "epochs": len(hist)})
        return out
