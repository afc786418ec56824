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

Two-phase/sparse-table configs (where a stacked [S, V, D] table can never
pay — see train/multi_seed.py) instead run SEQUENTIAL-SHARED, grouped by
lr: one shared Trainer, one compile per distinct lr (the sparse table
update bakes lr into its jitted step), every seed in the group reusing
that compile via ``reset_for_seed`` — so an (S seeds x L lrs) grid costs
L compiles instead of S*L full recompiles.
Any other update-time numeric optimizer hyperparameter (adam ``b1``/
``b2``/``eps``, rmsprop ``decay``, ...) can vary along the grid the same
way via explicit ``grid`` rows; init-time ones (accumulator seeds) are
rejected, see ``_INIT_TIME_HPS``.
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


#: grid-row key -> optax hyperparam-state key
_HP_ALIASES = {"lr": "learning_rate"}

#: hyperparams consumed by tx.init (accumulator seeds): replacing them in
#: the state AFTER init would be a silent no-op, so varying them per-combo
#: is rejected — run those combos as separate suites instead
_INIT_TIME_HPS = {"initial_accumulator_value", "initial_scale"}


class GridSweepTrainer(SeedSuiteTrainer):
    """Train every (seed, hyperparam) combination concurrently.

    ``grid`` rows are ``{"seed": int, "lr": float, ...}`` — any
    update-time numeric hyperparameter of the optimizer can vary per
    combo (``lr``/``learning_rate``, and e.g. adam's ``b1``/``b2``/
    ``eps`` or rmsprop's ``decay``), since ``inject_hyperparams`` turns
    each of them into an optimizer-state leaf.  Init-time hyperparams
    (accumulator seeds) are rejected.  Alternatively pass ``seeds`` and ``lrs`` for
    the (seed x lr) cross product.  Everything else (fit/predict/
    histories/early stopping) behaves like SeedSuiteTrainer with one
    stacked axis of size ``len(grid)``.
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
        hp_keys = sorted({k for g in self.grid for k in g} - {"seed"})
        if not hp_keys:
            raise ValueError("grid rows vary no optimizer hyperparameter")
        bad = set(hp_keys) & _INIT_TIME_HPS
        if bad:
            raise ValueError(
                f"{sorted(bad)} are consumed at optimizer-state INIT time "
                "and cannot vary along the vmapped grid (the stacked state "
                "is initialized once); sweep them as separate suites"
            )
        missing = [(g, k) for g in self.grid for k in hp_keys if k not in g]
        if missing:
            raise ValueError(f"grid rows missing hyperparams: {missing[:3]}")
        self._hp_keys = hp_keys
        super().__init__(model, seeds=[g["seed"] for g in self.grid])
        if self.sequential and hp_keys != ["lr"]:
            raise NotImplementedError(
                "the two-phase/sparse table update bakes only the LEARNING "
                "RATE into its jitted step, so sequential-shared grids vary "
                f"lr only (got {hp_keys}); sweep other hyperparams as "
                "separate suites"
            )
        tag = lambda g: "/".join(f"{k}{g[k]:g}" for k in hp_keys)  # noqa: E731
        self.labels = [f"s{g['seed']}/{tag(g)}" for g in self.grid]
        self.row_labels = [
            f"{g['seed']}_" + "_".join(f"{k}{g[k]:g}" for k in hp_keys)
            for g in self.grid
        ]

    # ------------------------------------------------------------------
    def compile(self, optimizer=None, loss=None, metrics=None):
        oc = self.tr.cfg.optim_config
        name = optimizer or oc.optimizer
        if not isinstance(name, str):
            raise ValueError("GridSweepTrainer needs an optimizer NAME to "
                             "build the lr-injectable transform")
        if self.sequential:
            # sequential-shared mode rebuilds a PLAIN optimizer per lr group
            # (_fit_sequential below); stash the compile args for that
            self._compile_args = (name, loss, metrics)
            self.tr.compile(optimizer=name, loss=loss, metrics=metrics)
            return self
        tx = injectable_optimizer(name, oc.lr)
        for t in self.trainers:
            t.compile(optimizer=tx, loss=loss, metrics=metrics)
        return self

    # ------------------------------------------------------------------
    def _fit_sequential(self, x, y, batch_size, epochs, validation_data,
                        verbose):
        """Two-phase/pallas grids: combos run one after another on the ONE
        shared Trainer, GROUPED BY LR so the jitted step/eval programs
        compile once per distinct lr (the table update bakes lr into its
        program; every seed in the group reuses the group's compile via
        reset_for_seed).  Numerics per combo are exactly a solo
        Trainer(seed) run at that lr (pinned by tests/test_sweep.py)."""
        tr = self.tr
        name, loss, metrics = getattr(
            self, "_compile_args", (None, None, None)
        )
        oc = tr.cfg.optim_config
        orig_lr = oc.lr
        self._seq_best = [None] * len(self.grid)
        order = sorted(range(len(self.grid)),
                       key=lambda i: (self.grid[i]["lr"], i))
        last_lr = None
        try:
            for gi in order:
                g = self.grid[gi]
                if g["lr"] != last_lr:
                    oc.lr = float(g["lr"])
                    # rebuilds tx at the group's lr and clears the jit
                    # caches — one compile per DISTINCT lr, not per combo
                    tr.compile(optimizer=name, loss=loss, metrics=metrics)
                    last_lr = g["lr"]
                tr.reset_for_seed(g["seed"])
                tr.fit(
                    x, y, batch_size=batch_size, epochs=epochs,
                    validation_data=validation_data,
                    verbose=max(verbose - 1, 0),
                )
                self.histories[gi] = list(tr.history)
                self._seq_best[gi] = tr.best_variables
                if verbose:
                    last = tr.history[-1] if tr.history else {}
                    print(
                        f"{self.labels[gi]}: {len(tr.history)} epochs, "
                        f"loss {last.get('loss', float('nan')):.4f}"
                        + (f", val_auc {last['val_auc']:.4f}"
                           if "val_auc" in last else "")
                    )
        finally:
            oc.lr = orig_lr
        self.variables = tr.variables
        return self

    def _init_opt_state(self, params):
        st = jax.vmap(self.tr.tx.init)(params)
        hp = dict(st.hyperparams)
        for key in self._hp_keys:
            opt_key = _HP_ALIASES.get(key, key)
            if opt_key not in hp:
                raise KeyError(
                    f"{key!r} is not a hyperparameter of this optimizer "
                    f"(available: {sorted(hp)})"
                )
            hp[opt_key] = jnp.asarray(
                [g[key] for g in self.grid], jnp.float32
            )
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
