"""Concurrent seed-suite training: vmap the full train step over seeds.

The reference protocol re-runs every experiment for seeds {0, 2, 4, 8}
sequentially (reference main.py:85-89) — four complete trainings, one
after another.  On TPU the step program for these models is far from
saturating the MXU at batch 4096 (docs/perf_notes.md roofline), so the
four trainings can run *concurrently* as one vmapped program: parameters,
optimizer state, RNG and shuffle order all carry a leading seed axis
``[S, ...]`` while the staged dataset is shared.  Each seed's numerics are
exactly those of an independent ``Trainer`` run with that seed (pinned by
tests/test_multi_seed.py): same init draws, same shuffle streams, same
per-seed early stopping and best-epoch snapshots.

Scope: the vmapped form covers the default dense-optimizer path on a
single device.  The two-phase/pallas production path instead runs in
SEQUENTIAL-SHARED mode (same API): a stacked [S, V, D] table can never
pay there —

* memory: at the production 40M x 32 shape, table + packed moments are
  ~10.2 GB; S=4 stacked copies need ~41 GB against 15.75 GB HBM;
* arithmetic: the vmapped win exists because the dense step is far from
  saturating the MXU (one program amortizes fixed overhead across
  seeds), but the two-phase step is bound by PER-ROW gather/scatter/DMA
  traffic (docs/perf_notes.md "Scatter cost isolation") that scales
  linearly with S — vmapping buys no per-row amortization.

What IS shared sequentially: one Trainer instance, so the jitted step /
eval / predict programs compile ONCE for all seeds (remote compiles cost
5-390 s each here — the dominant suite overhead), with per-seed numerics
exactly equal to solo runs (seed is read at fit time; pinned by
tests/test_multi_seed.py).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import regime_eval
from .trainer import Trainer


class SeedSuiteTrainer:
    """Drop-in for the reference's seed loop: ``fit()`` trains all seeds at
    once; ``predict()``/``results`` are per-seed."""

    def __init__(self, model, seeds: Sequence[int] = (0, 2, 4, 8)):
        self.seeds = list(seeds)
        self.labels = [f"seed{s}" for s in self.seeds]
        self.row_labels = [str(s) for s in self.seeds]  # result-CSV suffixes
        self.model = model
        # one internal Trainer per seed for seed-faithful init/shuffle
        # streams; trainers[0] additionally provides the shared machinery
        # (packing, loss terms, step body, predict program).
        self.trainers = [Trainer(model, seed=s) for s in seeds]
        self.tr = self.trainers[0]
        # two-phase/sparse paths run sequential-shared (see module
        # docstring): one Trainer, compiled once, re-seeded per run.
        self.sequential = (
            self.tr.two_phase_embedding or self.tr.sparse_embedding_update
        )
        if not self.sequential:
            # The vmapped step materializes the matmul-grad one-hot once per
            # stacked seed, so FusedEmbedding's 'auto' budget must account
            # for the stack width (ops/embedding.py grad_budget_divisor).
            # Left set afterwards: a later solo run of the same model
            # degrades only toward the (always-correct) scatter cotangent.
            model.cfg.model_config.extra["_grad_budget_div"] = len(self.seeds)
        self.histories: List[List[Dict[str, float]]] = [[] for _ in seeds]
        self.best_variables = None  # stacked [S, ...] (vmapped mode)
        self._seq_best: List = []  # per-seed best variables (sequential mode)
        self._vstep = None
        self._vpred = None

    # ------------------------------------------------------------------
    def compile(self, optimizer=None, loss=None, metrics=None):
        for t in self.trainers:
            t.compile(optimizer, loss, metrics)
        return self

    # ------------------------------------------------------------------
    def _stacked_init(self, ids, dense):
        per_seed = [t._init_variables(ids, dense) for t in self.trainers]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_seed)

    def _init_opt_state(self, params):
        """Stacked per-seed optimizer state (hook: train/sweep.py overrides
        this to vary hyperparams along the stacked axis)."""
        return jax.vmap(self.tr.tx.init)(params)

    def _make_vstep(self, steps: int):
        tr = self.tr

        def one_seed(state, idx2d, w2d, staged):
            s = state["epoch_step"] % steps
            bs = idx2d.shape[1]
            idx = jax.lax.dynamic_slice(idx2d, (s, 0), (1, bs))[0]
            w = jax.lax.dynamic_slice(w2d, (s, 0), (1, bs))[0]
            rows = jnp.take(staged, idx, axis=0)
            batch = tr._split_staged(rows, w)
            new_state, tl, dl, probs = tr._step_body(state, batch)
            new_state["epoch_step"] = state["epoch_step"] + 1
            return new_state, tl, probs

        vstep = jax.vmap(one_seed, in_axes=(0, 0, None, None))
        return jax.jit(vstep, donate_argnums=(0,))

    def _make_vscan(self, steps: int, length: int):
        """length vmapped steps per dispatch via lax.scan — same body as
        _make_vstep (epoch_step indexes each seed's next batch), so
        numerics are identical to the chained loop; amortizes the
        0.4-1.1 ms per-dispatch floor (docs/perf_notes.md "Flagship
        backward")."""
        tr = self.tr

        def one_seed(state, idx2d, w2d, staged):
            s = state["epoch_step"] % steps
            bs = idx2d.shape[1]
            idx = jax.lax.dynamic_slice(idx2d, (s, 0), (1, bs))[0]
            w = jax.lax.dynamic_slice(w2d, (s, 0), (1, bs))[0]
            rows = jnp.take(staged, idx, axis=0)
            batch = tr._split_staged(rows, w)
            new_state, tl, dl, probs = tr._step_body(state, batch)
            new_state["epoch_step"] = state["epoch_step"] + 1
            return new_state, tl, probs

        vstep = jax.vmap(one_seed, in_axes=(0, 0, None, None))

        def runner(state, idx3, w2d, staged):
            def body(s, _):
                s2, tl, probs = vstep(s, idx3, w2d, staged)
                return s2, (tl, probs)

            state, (tls, probs) = jax.lax.scan(
                body, state, None, length=length
            )
            return state, tls, probs  # tls [L, S]; probs [L, S, bs, T]

        return jax.jit(runner, donate_argnums=(0,))

    def _make_vpred(self):
        tr = self.tr
        pred_one = tr._make_predict_fn()
        return jax.jit(jax.vmap(pred_one, in_axes=(0, None, None, None)))

    def _make_veval(self):
        """Fused predict+metrics vmapped over the seed axis: per-seed
        regime metrics come back as [S] scalars instead of the
        [S, N_val, H] prediction matrix (train/device_metrics.py)."""
        prog = self.tr._build_eval_program()
        return jax.jit(jax.vmap(prog, in_axes=(0, None, None, None, None, None)))

    # ------------------------------------------------------------------
    def _fit_sequential(self, x, y, batch_size, epochs, validation_data,
                        verbose):
        """Two-phase/pallas path: seeds run one after another on ONE shared
        Trainer (jit caches persist across reset_for_seed, so the step/eval
        programs compile once for the whole suite).  Numerics per seed are
        exactly a solo Trainer(seed) run."""
        tr = self.tr
        self._seq_best = []
        for si, s in enumerate(self.seeds):
            tr.reset_for_seed(s)
            tr.fit(
                x, y, batch_size=batch_size, epochs=epochs,
                validation_data=validation_data, verbose=max(verbose - 1, 0),
            )
            self.histories[si] = list(tr.history)
            self._seq_best.append(tr.best_variables)
            if verbose:
                last = tr.history[-1] if tr.history else {}
                print(
                    f"{self.labels[si]}: {len(tr.history)} epochs, "
                    f"loss {last.get('loss', float('nan')):.4f}"
                    + (f", val_auc {last['val_auc']:.4f}"
                       if "val_auc" in last else "")
                )
        self.variables = tr.variables
        return self

    def _per_seed_best(self, si):
        return self._seq_best[si]

    # ------------------------------------------------------------------
    def fit(
        self,
        x,
        y,
        batch_size: Optional[int] = None,
        epochs: int = 1,
        validation_data=None,
        verbose: int = 1,
    ):
        if self.sequential:
            return self._fit_sequential(
                x, y, batch_size, epochs, validation_data, verbose
            )
        tr = self.tr
        cfg = tr.cfg
        oc = cfg.optim_config
        batch_size = batch_size or cfg.training_config.train_batch_size
        S = len(self.seeds)

        ids, dense = tr.pack_inputs(x)
        y2 = tr._prepare_y(y)
        dmask = tr._domain_mask_from(x)
        n = len(ids)
        steps = (n - 1) // batch_size + 1

        val = None
        if validation_data is not None:
            vx, vy = validation_data[0], validation_data[1]
            v_ids, v_dense = tr.pack_inputs(vx)
            val = (v_ids, v_dense, tr._prepare_y(vy), tr._domain_mask_from(vx))

        variables = self._stacked_init(ids[:2], dense[:2])
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self._init_opt_state(params)
        state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "rng": jnp.stack(
                [jax.random.PRNGKey(s + 1) for s in self.seeds]
            ),
            "epoch_step": jnp.zeros((S,), jnp.int32),
        }
        mc = cfg.model_config
        if mc.extra.get("use_gradnorm"):
            T = tr.num_tasks
            state["task_weights"] = jnp.ones((S, T), jnp.float32)
            state["initial_losses"] = jnp.ones((S, T), jnp.float32)
            state["gn_step"] = jnp.zeros((S,), jnp.int32)

        staged = tr._stage_dataset(ids, dense, y2, dmask)
        scan_l = steps if tr._scan_steps < 0 else tr._scan_steps
        if scan_l:
            chunk = min(scan_l, steps)
            runners = {chunk: self._make_vscan(steps, chunk)}
            if steps % chunk:
                runners[steps % chunk] = self._make_vscan(steps, steps % chunk)
            vstep = None
        else:
            runners = {}
            vstep = self._make_vstep(steps)
        rngs = [np.random.default_rng(s) for s in self.seeds]

        padded = steps * batch_size
        w_full = np.zeros(padded, np.float32)
        w_full[:n] = 1.0
        w2d = jnp.asarray(w_full.reshape(steps, batch_size))

        best_auc = np.zeros(S)
        stop_count = np.zeros(S, np.int64)
        stopped = np.zeros(S, bool)
        best_vars = None
        val_dev = (
            tr._prepare_eval_tensors(val[0], val[1], val[3], batch_size)
            if val is not None
            else None
        )
        use_dev_eval = val is not None and tr._use_device_eval()
        val_metric_dev = (
            tr._prepare_metric_tensors(val[2], val_dev) if use_dev_eval else None
        )
        veval = self._make_veval() if use_dev_eval else None
        vpred = self._make_vpred() if val is not None and not use_dev_eval else None

        for epoch in range(epochs):
            t0 = time.time()
            idx3 = np.zeros((S, steps, batch_size), np.int32)
            for si, rng in enumerate(rngs):
                # same per-seed stream a solo Trainer(seed) would draw
                order = rng.permutation(n)
                flat = np.zeros(padded, np.int64)
                flat[:n] = order
                idx3[si] = flat.reshape(steps, batch_size)
            idx3_dev = jnp.asarray(idx3)
            state["epoch_step"] = jnp.zeros((S,), jnp.int32)

            loss_refs = []
            prob_refs = []
            if runners:
                pos = 0
                while pos < steps:
                    L = min(max(runners), steps - pos)
                    state, tls, probs = runners[L](state, idx3_dev, w2d, staged)
                    loss_refs.append(tls)  # [L, S]
                    if tr.metric_fns:
                        prob_refs.append(probs)  # [L, S, bs, T]
                    pos += L
                losses = np.asarray(jnp.concatenate(loss_refs, axis=0))
            else:
                for _ in range(steps):
                    state, tl, probs = vstep(state, idx3_dev, w2d, staged)
                    loss_refs.append(tl)
                    if tr.metric_fns:
                        prob_refs.append(probs[None])
                losses = np.asarray(jnp.stack(loss_refs))  # [steps, S]
            epoch_time = time.time() - t0

            per_seed_logs = [
                {"loss": float(losses[:, si].sum()) / max(n, 1), "epoch_s": epoch_time}
                for si in range(S)
            ]
            if tr.metric_fns and prob_refs:
                # [steps, S, bs, T] -> per-seed train metrics on its own rows
                probs_all = np.asarray(jnp.concatenate(prob_refs, axis=0))
                for si in range(S):
                    p = probs_all[:, si].reshape(padded, -1)[: n]
                    rows = idx3[si].reshape(-1)[:n]
                    if tr.model_name in ("escm", "escm_dr"):
                        p = p[:, [0, 2]]
                    per_seed_logs[si].update(
                        regime_eval(
                            tr.metric_fns, y2[rows], p, tr.task_name,
                            tr.num_domains,
                        )
                    )

            variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
            was_stopped = stopped.copy()
            if val is not None:
                if use_dev_eval:
                    out = veval(
                        variables, val_dev[0], val_dev[1], val_dev[2],
                        *val_metric_dev,
                    )
                    out_np = {k: np.asarray(v) for k, v in out.items()}
                    per_seed_res = [
                        {k: float(v[si]) for k, v in out_np.items()}
                        for si in range(S)
                    ]
                else:
                    vprobs = np.asarray(
                        vpred(variables, val_dev[0], val_dev[1], val_dev[2])
                    )
                    n_val = val_dev[3]
                    per_seed_res = []
                    for si in range(S):
                        preds = vprobs[si].reshape(-1, vprobs.shape[-1])[:n_val]
                        preds = preds.astype(np.float64)
                        if tr.model_name in ("escm", "escm_dr"):
                            preds = preds[:, [0, 2]]
                        per_seed_res.append(
                            regime_eval(
                                tr.metric_fns, val[2], preds, tr.task_name,
                                tr.num_domains,
                            )
                        )
                improved = np.zeros(S, bool)
                for si in range(S):
                    res = per_seed_res[si]
                    for k, v in res.items():
                        per_seed_logs[si][f"val_{k}"] = v
                    auc = res.get("auc", 0.0)
                    if not was_stopped[si] and auc > best_auc[si]:
                        best_auc[si] = auc
                        stop_count[si] = 0
                        improved[si] = True
                    elif not was_stopped[si]:
                        stop_count[si] += 1
                imp_dev = jnp.asarray(improved)

                def select(new, old):
                    m = imp_dev.reshape((S,) + (1,) * (new.ndim - 1))
                    return jnp.where(m, new, old)

                snap = jax.tree_util.tree_map(jnp.copy, variables)
                best_vars = (
                    snap
                    if best_vars is None
                    else jax.tree_util.tree_map(select, snap, best_vars)
                )
                stopped |= stop_count >= oc.early_stop

            for si in range(S):
                # a seed that already stopped in a PRIOR epoch is done (a
                # solo Trainer would have broken out); the epoch where the
                # patience runs out is still logged, like the solo loop
                if val is None or not was_stopped[si]:
                    self.histories[si].append(per_seed_logs[si])
            if verbose:
                line = " | ".join(
                    f"{self.labels[si]}: loss {per_seed_logs[si]['loss']:.4f}"
                    + (
                        f" val_auc {per_seed_logs[si].get('val_auc', float('nan')):.4f}"
                        if val is not None
                        else ""
                    )
                    for si in range(S)
                )
                print(f"Epoch {epoch + 1}/{epochs} - {epoch_time:.1f}s - {line}")
            if val is not None and stopped.all():
                break

        self.variables = variables
        self.best_variables = best_vars if best_vars is not None else variables
        return self

    # ------------------------------------------------------------------
    def masked_test_metrics_device(self, x, y, test_mask,
                                   batch_size: int = 256):
        """Per-seed final masked LogLoss/AUC rows computed fully on device
        (Trainer.masked_test_metrics_device vmapped over the stacked axis):
        [S] scalars per metric instead of the [S, N_test, H] prediction
        download."""
        tr = self.tr
        if self.sequential:
            rows = []
            for si in range(len(self.seeds)):
                tr.best_variables = self._per_seed_best(si)
                rows.append(
                    tr.masked_test_metrics_device(x, y, test_mask, batch_size)
                )
            return rows
        ids, dense = tr.pack_inputs(x)
        y2 = tr._prepare_y(y)
        dmask = tr._domain_mask_from(x)
        val_dev = tr._prepare_eval_tensors(ids, dense, dmask, batch_size)
        y_dev, w_dev = tr._prepare_metric_tensors(y2, val_dev)
        tm_dev = tr._prepare_mask_tensor(test_mask, y_dev.shape[0])
        prog = jax.jit(
            jax.vmap(
                tr._build_masked_test_program(),
                in_axes=(0, None, None, None, None, None, None),
            )
        )
        out = prog(self.best_variables, val_dev[0], val_dev[1], val_dev[2],
                   y_dev, w_dev, tm_dev)
        out_np = {k: np.asarray(v) for k, v in out.items()}
        return [
            tr._order_masked_row({k: float(v[si]) for k, v in out_np.items()})
            for si in range(len(self.seeds))
        ]

    # ------------------------------------------------------------------
    def predict(self, x, batch_size: int = 256) -> np.ndarray:
        """[S, N, num_heads] predictions from each seed's best params."""
        tr = self.tr
        if self.sequential:
            preds = []
            for si in range(len(self.seeds)):
                tr.best_variables = self._per_seed_best(si)
                preds.append(tr.predict(x, batch_size=batch_size))
            return np.stack(preds)
        ids, dense = tr.pack_inputs(x)
        dmask = tr._domain_mask_from(x)
        ids3, dense3, dmask3, n = tr._prepare_eval_tensors(ids, dense, dmask, batch_size)
        vpred = self._make_vpred()
        probs = np.asarray(vpred(self.best_variables, ids3, dense3, dmask3))
        S = probs.shape[0]
        preds = probs.reshape(S, -1, probs.shape[-1])[:, :n].astype(np.float64)
        if tr.model_name in ("escm", "escm_dr"):
            preds = preds[:, :, [0, 2]]
        return preds
