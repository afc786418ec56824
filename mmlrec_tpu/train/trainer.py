"""Keras-style training engine (compile / fit / evaluate / predict).

TPU-native replacement for the reference's ``BaseModel`` fit loop
(model/basemodel.py:135-457).  Key differences by design:

* The whole dataset lives in device memory as packed int32/float32 arrays;
  each step is ONE jitted function (forward + loss + backward + optax
  update) with a fixed batch shape — the final partial batch is padded and
  zero-weighted instead of triggering a recompile.
* Metrics run once per epoch on gathered predictions instead of the
  reference's per-batch sklearn host syncs (basemodel.py:316-331).
* MSL/MTMSL loss masking is configurable: ``model_config.masked_loss=False``
  (default) reproduces the reference's *effective* unmasked training (its
  always-true-conditional bug nulls domain_mask, basemodel.py:265-266);
  True enables the intended masked semantics (:273-282).
* Early stopping on validation AUC with best-params snapshot mirrors
  basemodel.py:342-347, :368-369; the snapshot is an on-device pytree
  reference rather than a deepcopy.
* When a ``jax.sharding.Mesh`` is provided, parameters/batches are placed
  with NamedShardings (embedding vocab over the 'model' axis, batch over
  'data'); XLA inserts the gradient psums and gather collectives.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ExperimentConfig
from ..models.base import RecModel
from . import staging
from .cka import cka_domain_loss
from .losses import l2_regularization, multitask_loss
from .metrics import get_metric_fns, regime_eval
from .optimizers import get_optimizer
from .pcgrad import pcgrad_merge


def stacked_auto_conditions(cfg, layout, mesh, batch_size) -> bool:
    """True iff the auto pallas+stacked conditions hold at ``batch_size``:
    two_phase + pallas-eligible 128-lane rows + packed bf16 moments +
    (no mesh, OR an explicit-collective mesh whose 'model' axis divides
    the physical rows — round 5 shard-major layout) + real TPU + the
    unique-metadata headroom (phys rows > Kp).  The SINGLE predicate
    behind both resolve_table_container (config time) and the Trainer's
    fit-time demotion, so the two cannot drift (ADVICE r3).
    """
    mc = cfg.model_config
    if not (
        mc.extra.get("two_phase_embedding")
        and str(mc.extra.get("table_update", "auto")) in ("auto", "pallas")
        and str(mc.extra.get("table_opt_dtype") or "") == "bfloat16"
    ):
        return False
    if mesh is not None and not (
        mc.extra.get("explicit_collective_embedding")
        and "model" in getattr(mesh, "shape", {})
    ):
        return False
    if mesh is None and mc.extra.get("explicit_collective_embedding"):
        return False
    from ..ops.embedding import fused_table_geometry

    geo = fused_table_geometry(layout)
    if geo is None:
        return False
    dim, P, phys_rows = geo
    if dim * P != 128:
        return False
    if mesh is not None and phys_rows % mesh.shape["model"] != 0:
        return False
    K = batch_size * len(layout.sparse_slots)
    if phys_rows <= -(-K // 256) * 256:
        return False
    exec_platform = (
        mesh.devices.flat[0].platform if mesh is not None
        else jax.devices()[0].platform
    )
    return exec_platform != "cpu"


def resolve_table_container(cfg, layout, mesh=None) -> None:
    """Opt INTO ``table_container="stacked"`` when the pallas table update
    will engage, BEFORE the model is built.

    The stacked container must be decided at model-construction time (the
    FusedEmbedding param shape depends on it, models/base.py), but whether
    the pallas update engages is a Trainer-time platform decision — so
    experiment drivers that build model+trainer together (main.py) call
    this on the config first.  Evaluates ``stacked_auto_conditions`` at the
    config's train_batch_size; if a library caller later fits with a
    LARGER batch that breaks the headroom, the Trainer demotes back to the
    split layout with a warning before variables are created
    (_resolve_table_update).  A user-set ``table_container`` always wins.
    Measured: the stacked dual-write + gather-route step is 1.33x the
    split path at 40M x 32 (docs/perf_notes.md round-3 ladder).
    """
    mc = cfg.model_config
    if mc.extra.get("table_container") is not None:
        # round 5: a USER-set stacked container on an explicit-collective
        # mesh needs the shard-major layout baked into the model — resolve
        # stacked_shards from the mesh here so main.py-style drivers need
        # no extra plumbing (Trainer validates the final consistency)
        if (
            mc.extra["table_container"] == "stacked"
            and mesh is not None
            and "model" in getattr(mesh, "shape", {})
            and mc.extra.get("stacked_shards") is None
            and mc.extra.get("explicit_collective_embedding")
        ):
            mc.extra["stacked_shards"] = int(mesh.shape["model"])
        return
    if stacked_auto_conditions(
        cfg, layout, mesh, cfg.training_config.train_batch_size
    ):
        mc.extra["table_container"] = "stacked"
        # marker letting the Trainer distinguish the auto opt-in from an
        # explicit user choice (only the former may demote at fit time)
        mc.extra["_table_container_auto"] = True
        if mesh is not None:
            # shard-major mesh layout (round 5): the model must be built
            # with the mesh's 'model' size baked in
            mc.extra["stacked_shards"] = int(mesh.shape["model"])


def get_mask(domain_values, mask_values, num_domains) -> np.ndarray:
    """[B] domain column -> one-hot [B, num_domains]
    (reference model/utils.py:639-645)."""
    dv = np.asarray(domain_values).reshape(-1, 1)
    mv = np.asarray(mask_values).reshape(1, -1)
    return (dv == mv).astype(np.float32)


class Trainer:
    def __init__(
        self,
        model: RecModel,
        seed: int = 0,
        mesh=None,
        debug: bool = False,
    ):
        """debug=True enables jax NaN checking (jax_debug_nans) and disables
        buffer donation so intermediate state survives for inspection
        (SURVEY §5: the reference has no sanitizer/debug mode at all)."""
        self.debug = debug
        if debug:
            jax.config.update("jax_debug_nans", True)
        self.model = model
        self.cfg: ExperimentConfig = model.cfg
        self.layout = model.layout
        self.seed = seed
        self.mesh = mesh
        self.variables = None  # {'params': ..., 'batch_stats': ...}
        self.best_variables = None
        self._save_layer_output = False
        self._step_fns: Dict[Tuple, Any] = {}
        self.history: List[Dict[str, float]] = []
        # per-epoch list of per-batch train-metric dicts, filled only when
        # model_config.extra["batch_metric_curves"] is set (see fit())
        self.batch_history: List[List[Dict[str, float]]] = []
        self.throughput_examples_per_s: Optional[float] = None

        mc = self.cfg.model_config
        self.task_name = mc.task_name
        self.num_tasks = self.cfg.num_tasks
        self.num_domains = self.cfg.data_config.num_domains
        self.model_name = mc.model_name
        self.is_pcgrad = self.model_name == "pcg"
        # l2_reg_dnn inclusion set: default = the reference's per-model
        # registration (model REG_DNN_PREFIXES; pinned per family by
        # tests/test_loss_parity.py).  ``l2_reg_inclusion: "all_kernels"``
        # opts back into the round-1 global kernel heuristic.
        self._reg_dnn_prefixes = (
            None
            if mc.extra.get("l2_reg_inclusion") == "all_kernels"
            else getattr(model, "REG_DNN_PREFIXES", None)
        )
        # on-device validation metrics (train/device_metrics.py): fuse the
        # regime metrics into the jitted eval program so only scalars cross
        # the host boundary instead of the [N_test, H] prediction matrix
        self.device_eval = bool(self.cfg.training_config.extra.get("device_eval"))

        if self.model_name in ("escm", "escm_dr") and (
            self.is_pcgrad
            or mc.extra.get("use_gradnorm")
            or mc.extra.get("use_cagrad")
        ):
            raise ValueError(
                "per-task gradient methods (pcg/gradnorm/cagrad) are not "
                "defined for ESCM's entire-space objective"
            )

        # row-sparse embedding updates (train/sparse_embedding.py).
        # two_phase_embedding supersedes sparse_embedding_update: the model
        # consumes PRE-GATHERED rows (injected collection, ops/embedding.py)
        # and the loss is differentiated w.r.t. those rows, so no dense
        # [V, D] cotangent ever materializes.
        self.two_phase_embedding = bool(mc.extra.get("two_phase_embedding"))
        self.sparse_embedding_update = (
            bool(mc.extra.get("sparse_embedding_update"))
            and not self.two_phase_embedding
        )
        self._fused_offsets = None
        if self.sparse_embedding_update or self.two_phase_embedding:
            flag = (
                "two_phase_embedding"
                if self.two_phase_embedding
                else "sparse_embedding_update"
            )
            sparse_dims = {
                int(s.feature.embedding_dim) for s in self.layout.sparse_slots
            }
            if len(sparse_dims) != 1 or self.layout.varlen_slots:
                raise ValueError(
                    f"{flag} requires the fused embedding "
                    "path (uniform dims, no varlen features)"
                )
            vocabs = [s.feature.vocabulary_size for s in self.layout.sparse_slots]
            self._fused_offsets = jnp.asarray(
                np.concatenate([[0], np.cumsum(vocabs)[:-1]]).astype(np.int32)
            )
            if self.cfg.optim_config.optimizer != "adam":
                raise ValueError(f"{flag} implements SparseAdam")
            # lane-packed tables store P logical rows per physical row; the
            # row update then touches super-rows flat_ids // P (ops/embedding.py)
            from ..ops.embedding import pack_factor_for

            self._emb_dim = sparse_dims.pop()
            self._emb_pack_factor = pack_factor_for(int(sum(vocabs)), self._emb_dim)
        # duplicate-free big-array updates (train/sparse_embedding.py
        # two_phase_sparse_adam_unique): "scatter" = rep-masked XLA
        # scatter-adds, "unique" = XLA scatter with unique-index guarantees
        # (measured slower end-to-end — fallback only), "pallas" = fused
        # rows-RMW kernel (ops/pallas_scatter.py) updating table+moments in
        # one pass of pipelined row DMAs (2.06x at 40M x 32,
        # docs/perf_notes.md).  Default "auto" picks pallas on a real TPU
        # when its constraints hold (128-lane physical rows, single device,
        # f32/bf16 moments) and scatter otherwise.
        self.table_update = str(mc.extra.get("table_update", "auto"))
        if self.table_update not in ("auto", "scatter", "unique", "pallas"):
            raise ValueError(
                f"table_update must be auto|scatter|unique|pallas, got "
                f"{self.table_update!r}"
            )
        self._table_update_auto = self.table_update == "auto"
        # moment-container gather routing for the two-phase unique update:
        # "pallas" = HBM->HBM row-DMA kernel (~2.5x the XLA take on the
        # serialized monu-gather stage, probe_row_gather_scan.py round 3);
        # "auto" follows table_update (the same Mosaic constraints apply)
        self.monu_gather = str(mc.extra.get("monu_gather", "auto"))
        if self.monu_gather not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"monu_gather must be auto|xla|pallas, got "
                f"{self.monu_gather!r}"
            )
        if self.table_update == "auto":
            # the jax.devices() probe initializes the backend (and a failed
            # relay init is cached in-process), so it must come LAST in the
            # conjunction — plain dense-model construction touches no device
            self.table_update = (
                "pallas"
                if (
                    self.two_phase_embedding
                    and self.mesh is None
                    and self._emb_dim * self._emb_pack_factor == 128
                    and str(mc.extra.get("table_opt_dtype") or "float32")
                    in ("float32", "bfloat16")
                    and jax.devices()[0].platform != "cpu"
                )
                else "scatter"
            )
        if self.table_update != "scatter":
            if not self.two_phase_embedding:
                raise ValueError("table_update requires two_phase_embedding")
            if self.mesh is not None and not (
                self.table_update == "pallas"
                and mc.extra.get("explicit_collective_embedding")
            ):
                raise ValueError(
                    "table_update unique/pallas with a mesh requires the "
                    "explicit_collective_embedding path (pallas only); the "
                    "GSPMD mesh path keeps its own update"
                )
            # static physical row count (mirrors FusedEmbedding.setup)
            self._emb_phys_rows = self._emb_phys_rows_static()
            # interpret mode runs the Pallas kernel on CPU (tests).  Key the
            # decision on the devices that will actually EXECUTE: the mesh's
            # when one is given (a CPU virtual mesh must interpret even if a
            # TPU backend was initialized first, e.g. dryrun_multichip after
            # entry()), the default device otherwise.
            exec_platform = (
                self.mesh.devices.flat[0].platform
                if self.mesh is not None
                else jax.devices()[0].platform
            )
            self._pallas_interpret = exec_platform == "cpu"
            mdt = str(mc.extra.get("table_opt_dtype") or "float32")
            # Mosaic rejects single-row DMA slices of sub-32-bit HBM arrays
            # (bf16 tiling (8,128)(2,1) packs rows; a 1-row slice is
            # unaligned).  bf16 moments therefore ride the pallas path as
            # (mu, nu) pairs PACKED into f32 lanes (SparseAdamPackedState);
            # f16 has no packed layout implemented.
            self._packed_moments = (
                self.table_update == "pallas" and mdt == "bfloat16"
            )
            if (
                self.table_update == "pallas"
                and not self._pallas_interpret
                and mdt == "float16"
            ):
                raise ValueError(
                    "table_update='pallas' supports float32 or bfloat16 "
                    f"moment storage, got table_opt_dtype={mdt!r}"
                )
        # dedup_route="gather": compute the unique-slot accumulation as a
        # designated-contributor gather + small residual scatter instead of
        # the full [Kp, 2W] scatter (bitwise equal — int32 payload adds
        # commute; gathers are 8.8 ns/row vs scatter's per-op cost on this
        # backend).  Only the packed pallas update has the int32 merged
        # accumulation this rewrites; since round 4 the explicit-collective
        # mesh step routes its shard-local accumulation the same way
        # (parallel/shard_embedding.py, VERDICT r3 #2).
        self.dedup_route = str(mc.extra.get("dedup_route", "auto"))
        if self.dedup_route not in ("auto", "scatter", "gather"):
            raise ValueError(
                f"dedup_route must be auto|scatter|gather, got "
                f"{self.dedup_route!r}"
            )
        if self.dedup_route == "auto":
            self.dedup_route = (
                "gather"
                if (
                    self.table_update == "pallas"
                    and getattr(self, "_packed_moments", False)
                )
                else "scatter"
            )
        elif self.dedup_route == "gather" and not (
            self.table_update == "pallas"
            and getattr(self, "_packed_moments", False)
        ):
            raise ValueError(
                "dedup_route='gather' requires table_update='pallas' with "
                "packed bf16 moments"
            )
        if self.monu_gather == "auto":
            # measured round 3 (probe_row_gather_scan.py + the in-step A/B):
            # XLA's 128-lane take is FASTER than the pallas row-DMA gather
            # (8.8 vs 12.7 ns/row scan-amortized) — only scatters/writes
            # favor pallas on this backend.  The knob stays for A/Bs.
            self.monu_gather = "xla"
        # table_container="stacked": the FusedEmbedding param is [2*Vp, 128]
        # with the packed moment container folded in as the bottom half
        # (SparseAdamFoldedState) so the pallas update writes each touched
        # row's table+moment pair with ONE [2, 1, 128] strided DMA
        # (8.0 vs 15.0 ns/row-pair, probe_dma_issue_floor.py).  The model
        # reads the same extra at construction (models/base.py), so the
        # combo is validated here rather than resolved.
        self.table_container = str(mc.extra.get("table_container", "split"))
        if self.table_container not in ("split", "stacked"):
            raise ValueError(
                f"table_container must be split|stacked, got "
                f"{self.table_container!r}"
            )
        self._stacked_shards = 1
        if self.table_container == "stacked":
            if self.table_update != "pallas":
                raise ValueError(
                    "table_container='stacked' requires table_update="
                    f"'pallas' (resolved: {self.table_update!r})"
                )
            if not self._packed_moments:
                raise ValueError(
                    "table_container='stacked' requires packed bf16 "
                    "moments (table_opt_dtype='bfloat16')"
                )
            if self.mesh is not None:
                # round 5: the stacked container runs on a mesh through the
                # explicit-collective path with the SHARD-MAJOR layout
                # (train/sparse_embedding.py split_stacked_planes) — each
                # shard's slice holds its own [table_d; monu_d] pair so the
                # dual-DMA kernels stay zero-collective.
                if not mc.extra.get("explicit_collective_embedding"):
                    raise ValueError(
                        "table_container='stacked' on a mesh requires the "
                        "explicit_collective_embedding path (GSPMD keeps "
                        "the split layout)"
                    )
                n_model = self.mesh.shape.get("model", 1)
                if self._emb_phys_rows_static() % max(n_model, 1) != 0:
                    raise ValueError(
                        f"stacked container needs the physical row count "
                        f"({self._emb_phys_rows_static()}) divisible by the "
                        f"'model' axis ({n_model})"
                    )
                declared = int(mc.extra.get("stacked_shards", 1) or 1)
                if declared != n_model:
                    raise ValueError(
                        f"model was built with stacked_shards={declared} but "
                        f"the mesh 'model' axis is {n_model}; set "
                        "model_config.extra['stacked_shards'] to the mesh's "
                        "'model' size BEFORE building the model"
                    )
                self._stacked_shards = n_model
        # pair_gather="dual": fetch each touched row's (table, monu) pair
        # with ONE [2, 1, 128] strided DMA (ops/pallas_gather.py
        # pallas_rows_gather_dual, 12.8 ns/row-PAIR) instead of two
        # separate XLA takes (8.8 each) — only possible with the stacked
        # container, where the pair is one strided descriptor apart.
        self.pair_gather = str(mc.extra.get("pair_gather", "auto"))
        if self.pair_gather not in ("auto", "split", "dual"):
            raise ValueError(
                f"pair_gather must be auto|split|dual, got "
                f"{self.pair_gather!r}"
            )
        if self.pair_gather == "auto":
            self.pair_gather = (
                "dual" if self.table_container == "stacked" else "split"
            )
        elif self.pair_gather == "dual" and self.table_container != "stacked":
            raise ValueError(
                "pair_gather='dual' requires table_container='stacked'"
            )
        # update_space="slot": run the table update's gather + wide-lane
        # Adam math at unique-physical-SLOT granularity instead of
        # position granularity (train/sparse_embedding.py
        # two_phase_sparse_adam_slot) — the pair-gather and math touch
        # n_phys_unique rows instead of K and the dedup route moves ONE
        # plane, so wins scale with duplication.  Same-window 40M A/B
        # (probe_zipf_contention.py): zipf-1.1 3.29 vs 3.50 ms, uniform
        # 2.82 vs 2.57 — "auto" (default) picks slot when the first
        # metadata batch shows >= 25% physical-row duplication, else
        # position; sticky once resolved.  Bitwise-pinned to the
        # position path either way.
        self.update_space = str(mc.extra.get("update_space", "auto"))
        if self.update_space not in ("auto", "position", "slot"):
            raise ValueError(
                f"update_space must be auto|position|slot, got "
                f"{self.update_space!r}"
            )
        if self.update_space == "slot":
            if self.table_container != "stacked":
                raise ValueError(
                    "update_space='slot' requires table_container='stacked'")
            if getattr(self, "dedup_route", "scatter") != "gather":
                raise ValueError(
                    "update_space='slot' requires dedup_route='gather' "
                    "(the slot route rides the accperm/resid metadata)")
        # device_metadata (round 5): compute the per-batch dedup metadata
        # ON DEVICE inside the step (one stable lax.sort + segment ops,
        # train/sparse_embedding.py device_step_metadata) instead of
        # host-precomputing + uploading it.  The full-shuffle host stacks
        # serialize against dispatches on this relay (perf_notes round-5
        # 40M traces); the in-step sort rides the scanned dispatch.
        self.device_metadata = bool(mc.extra.get("device_metadata"))
        if self.device_metadata:
            if not self.two_phase_embedding:
                raise ValueError("device_metadata requires two_phase_embedding")
            if self.table_update == "unique":
                raise ValueError(
                    "device_metadata is incompatible with table_update="
                    "'unique' (its XLA unique-indices scatter needs the "
                    "host path's distinct pad rows)"
                )
            if mc.extra.get("dedup_route") == "gather":
                raise ValueError(
                    "device_metadata has no gather-route lists; drop "
                    "dedup_route='gather' (the in-step scatter is used)"
                )
            if mc.extra.get("update_space") == "slot":
                raise ValueError(
                    "device_metadata supports update_space='position' only "
                    "(slot space rides the route metadata)"
                )
            # auto-resolved route/space fall back to the scatter/position
            # forms the device metadata supports
            self.dedup_route = "scatter"
            self.update_space = "position"
            self._emb_phys_rows = self._emb_phys_rows_static()
        if self.two_phase_embedding and (
            self.is_pcgrad
            or mc.extra.get("use_gradnorm")
            or mc.extra.get("use_cagrad")
        ):
            raise ValueError(
                "two_phase_embedding is incompatible with per-task gradient "
                "methods (they need whole-param task gradients)"
            )
        # scan_steps: run N train steps per dispatch via lax.scan on the
        # device-data fast path (int chunk size; true = whole epoch).  The
        # per-dispatch floor scales with donated state size (a no-op step
        # with a 10 GB state measured ~6.3 ms), so this is the dominant win
        # at production vocabularies (docs/perf_notes.md).  Unset = AUTO:
        # 16-step chunks when the fused table spans >= 256 MB (numerics are
        # bitwise identical to the per-step path — the scan body IS the
        # per-step program); explicit 0/false disables.
        # streaming-path prefetch depth (host loop only): batches ahead to
        # build (uploads + metadata) in a worker thread.  1 = synchronous.
        self._prefetch_batches = int(mc.extra.get("prefetch_batches", 2))
        # datasets below this (x2 for staging headroom) ride the on-device
        # fast path; larger ones stream per batch with prefetch
        self._device_data_bytes_cap = 4 * 1024**3
        raw_scan = mc.extra.get("scan_steps", None)
        if raw_scan is None:
            # auto: 16 steps per dispatch on the device-data fast path.
            # Originally enabled only for >= 256 MB tables (whose donated
            # state carries a ~6.3 ms/dispatch floor); after the matmul
            # embedding cotangent cut the flagship device time to ~364 us,
            # even the SMALL-state per-dispatch floor (~0.4-0.6 ms,
            # window-dependent) dominates chained dispatches, and scan16
            # measured 1.26x over chained on the flagship step
            # (benchmarks/probe_flagship_scan.py; docs/perf_notes.md).
            self._scan_steps = 16
        else:
            self._scan_steps = -1 if raw_scan is True else int(raw_scan or 0)
        # Stochastic-gate noise warmup (round 5, VERDICT r4 #4): train the
        # first E epochs with the DETERMINISTIC midpoint gate (u = 0.5) so
        # head takeoff beats tight early-stop patience, then engage the
        # hard-concrete noise.  Only meaningful with snr_stochastic_gates;
        # the warmup/post-warmup programs are separate compiled variants
        # (ops/layers.py gate_noise_off is a trace-time constant).
        self._gate_warmup_epochs = int(
            mc.extra.get("snr_gate_noise_warmup_epochs", 0) or 0
        )
        self._gate_warmup_active = False
        self._tx_wrapped = False

    # ------------------------------------------------------------------
    # compile
    # ------------------------------------------------------------------
    def compile(self, optimizer=None, loss=None, metrics=None):
        """Bind optimizer/loss/metrics (reference basemodel.py:557-567)."""
        oc = self.cfg.optim_config
        opt_name = optimizer or oc.optimizer
        self.tx = (
            get_optimizer(opt_name, oc.lr)
            if isinstance(opt_name, str)
            else opt_name
        )
        if self._use_flat_optimizer():
            # One fused vector update for all parameter leaves instead of a
            # per-tensor kernel fan-out: measured 1.04x on the flagship step
            # (benchmarks/probe_flat_optimizer.py; chases the ~369 us fixed
            # per-step cost quantified by benchmarks/batch_scaling.py).
            # Element-wise optimizers (adam/adagrad/sgd/rmsprop) are
            # bit-exact under the ravel, so this never changes numerics.
            self.tx = optax.flatten(self.tx)
        loss = loss if loss is not None else oc.loss
        self.loss_names = [loss] if isinstance(loss, str) else list(loss)
        self.metric_fns = get_metric_fns(metrics if metrics is not None else oc.metrics)
        # compiled programs close over the optimizer/loss/metrics bound
        # here — drop any cached ones from a previous compile()
        self._step_fns.clear()
        return self

    def _use_flat_optimizer(self) -> bool:
        """Flatten is skipped when it could hurt: under a mesh (the fused
        table's row sharding must survive in the optimizer state), in the
        legacy masked sparse path (optax.masked's placeholder leaves don't
        ravel), or when a large table flows through the base optimizer (the
        ravel would copy it every step).  two_phase_embedding keeps the
        table out of the base optimizer entirely, so any table size is fine
        there.  Opt out with model_config.extra["flat_optimizer"] = false."""
        if self.mesh is not None or self.sparse_embedding_update:
            return False
        if not self.cfg.model_config.extra.get("flat_optimizer", True):
            return False
        if self.two_phase_embedding:
            return True
        table_elems = sum(
            v * d for (v, d) in self.layout.embedding_specs.values()
        )
        return table_elems < (1 << 22)

    # ------------------------------------------------------------------
    # input packing
    # ------------------------------------------------------------------
    def pack_inputs(self, x) -> Tuple[np.ndarray, np.ndarray]:
        """dict {feature_name: array/Series} -> (ids [N,S] int32,
        dense [N,Dd] float32) in layout order."""
        if isinstance(x, tuple) and len(x) == 2:
            return np.asarray(x[0], np.int32), np.asarray(x[1], np.float32)
        n = None
        ids_parts: List[np.ndarray] = []
        for slot in self.layout.sparse_slots:
            col = np.asarray(x[slot.feature.name]).reshape(-1, 1)
            ids_parts.append(col.astype(np.int32))
            n = len(col)
        for slot in self.layout.varlen_slots:
            seq = np.asarray(x[slot.feature.name]).reshape(n if n else -1, -1)
            ids_parts.append(seq.astype(np.int32))
            if slot.feature.length_name is not None:
                ids_parts.append(
                    np.asarray(x[slot.feature.length_name]).reshape(-1, 1).astype(np.int32)
                )
        dense_parts: List[np.ndarray] = []
        for slot in self.layout.dense_slots:
            dense_parts.append(
                np.asarray(x[slot.feature.name], np.float32).reshape(-1, slot.feature.dimension)
            )
        ids = np.concatenate(ids_parts, axis=1) if ids_parts else np.zeros((n or 0, 0), np.int32)
        dense = (
            np.concatenate(dense_parts, axis=1)
            if dense_parts
            else np.zeros((len(ids), 0), np.float32)
        )
        return ids, dense

    def _domain_mask_from(self, x) -> Optional[np.ndarray]:
        dc = self.cfg.data_config
        if self.task_name in ("msl", "mtmsl") and dc.mask_column:
            if isinstance(x, dict) and dc.mask_column in x:
                vals = np.asarray(x[dc.mask_column])
                return get_mask(vals, dc.mask_values, dc.num_domains)
        return None

    def _prepare_y(self, y) -> np.ndarray:
        y = np.asarray(y, np.float32)
        if y.ndim == 1:
            y = y.reshape(-1, 1)
        T = self.num_tasks
        if self.model_name in ("escm", "escm_dr"):
            return y  # [N, 2] (ctr, cvr labels)
        if y.shape[1] != T and T % y.shape[1] == 0:
            # replicate each label column across its domains: [l1, l2] with
            # D domains -> [l1]*D ++ [l2]*D, the reference's duplicated
            # label_columns layout (configs_mtmsl/config_amazon.json:10-16).
            y = np.repeat(y, T // y.shape[1], axis=1)
        return y

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _init_variables(self, ids, dense):
        rng = jax.random.PRNGKey(self.seed)
        dm = (
            jnp.ones((ids.shape[0], self.num_domains), jnp.float32)
            if self.task_name in ("msl", "mtmsl")
            else None
        )
        # jit the init: eagerly, every init intermediate materializes
        # (normal draw, pad mask select, zeros, update) — at the 40M
        # stacked-container shape that is ~25 GB of transients vs ~10.3
        # fused/aliased under jit (the dual_init dynamic_update_slice
        # reuses the zeros buffer in place only when compiled)
        init_fn = self._cached(
            "model_init",
            lambda: jax.jit(
                lambda r, i, d, m: self.model.init(r, i, d, m, train=False)
            ),
        )
        variables = init_fn(rng, jnp.asarray(ids), jnp.asarray(dense), dm)
        variables = dict(variables)
        variables.pop("intermediates", None)
        if self.mesh is not None:
            from ..parallel.mesh import shard_variables

            variables = shard_variables(variables, self.mesh)
        return variables

    def _loss_terms(self, params, batch_stats, batch, rng, train: bool):
        mc = self.cfg.model_config
        ids, dense, y, dmask, weight = batch
        model_mask = dmask if (mc.masked_loss and dmask is not None) else None
        mutable = ["batch_stats"]
        want_cka = (
            mc.use_cka_loss and self.task_name in ("msl", "mtmsl") and dmask is not None
        )
        if want_cka:
            mutable.append("intermediates")
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        probs, mutated = self.model.apply(
            variables,
            ids,
            dense,
            model_mask,
            train=train,
            mutable=mutable,
            rngs={"dropout": rng},
        )
        data_loss = multitask_loss(
            probs,
            y,
            weight,
            self.loss_names,
            self.task_name,
            self.num_domains,
            domain_mask=dmask if mc.masked_loss else None,
            model_name=self.model_name,
            loss_weights=(
                mc.loss_weights if mc.extra.get("use_loss_weights") else None
            ),
        )
        reg = l2_regularization(params, mc.l2_reg_embedding, mc.l2_reg_dnn,
                                dnn_prefixes=self._reg_dnn_prefixes,
                                l2_linear=mc.l2_reg_linear)
        cka = 0.0
        if want_cka:
            inter = mutated.get("intermediates", {})
            last = inter.get("last_layer", inter.get("dnn_input"))
            if last is not None:
                last = last[0] if isinstance(last, tuple) else last
                cka = cka_domain_loss(last, dmask, alpha=0.5)
        total = data_loss + reg + cka
        new_stats = mutated.get("batch_stats", batch_stats)
        return total, (data_loss, new_stats, probs)

    # -- two-phase embedding step ---------------------------------------
    #
    # Phase 1 gathers the batch's table rows (non-differentiated); phase 2
    # differentiates the loss w.r.t. the GATHERED rows, injected into the
    # model through the ``injected`` flax collection (ops/embedding.py), and
    # applies exact SparseAdam to only the touched rows
    # (train/sparse_embedding.py two_phase_sparse_adam).  The embedding
    # table never appears in a grad pytree, so no [V, D] cotangent, dense
    # moment update, or optimizer sweep of the table exists anywhere.
    # Duplicate-id metadata (inv, rep) is host-precomputed per batch — batch
    # composition is host-known in every fit path.

    @staticmethod
    def _without_table(params):
        emb = dict(params["embeddings"])
        fused = dict(emb["fused"])
        table = fused.pop("table")
        emb["fused"] = fused
        return {**params, "embeddings": emb}, table

    @staticmethod
    def _with_table(rest, table):
        emb = dict(rest["embeddings"])
        fused = dict(emb.get("fused", {}))
        fused["table"] = table
        emb["fused"] = fused
        return {**rest, "embeddings": emb}

    def _loss_terms_injected(self, rest, table, rows, batch_stats, batch, rng,
                             reg_scale: float = 1.0):
        """_loss_terms with pre-gathered embedding rows.

        ``table`` is a non-differentiated argument; the embedding penalty is
        the sparse form (touched unique rows only), matching SparseAdam's
        touched-rows-only philosophy — exact equality with the dense L2 holds
        when l2_reg_embedding == 0 (all reference configs that matter).

        ``reg_scale`` scales only the replicated-parameter L2 term: inside an
        explicit data-parallel shard_map body (parallel/explicit_step.py) the
        per-shard objectives are psum-reduced, so the shard-local replicated
        penalty must be 1/n_data of the global one.  The touched-rows penalty
        is already partitioned (rows and the rep slice are shard-local).
        """
        mc = self.cfg.model_config
        ids, dense, y, dmask, weight = batch[:5]
        rep = batch[6]
        model_mask = dmask if (mc.masked_loss and dmask is not None) else None
        params = self._with_table(rest, table)
        variables = {
            "params": params,
            "injected": {"embeddings": {"sparse_rows": rows}},
        }
        if batch_stats:
            variables["batch_stats"] = batch_stats
        probs, mutated = self.model.apply(
            variables, ids, dense, model_mask, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        data_loss = multitask_loss(
            probs, y, weight, self.loss_names, self.task_name,
            self.num_domains,
            domain_mask=dmask if mc.masked_loss else None,
            model_name=self.model_name,
            loss_weights=(
                mc.loss_weights if mc.extra.get("use_loss_weights") else None
            ),
        )
        reg = reg_scale * l2_regularization(
            rest, mc.l2_reg_embedding, mc.l2_reg_dnn,
            dnn_prefixes=self._reg_dnn_prefixes,
            l2_linear=mc.l2_reg_linear)
        if mc.l2_reg_embedding:
            flat_rows = rows.reshape(-1, rows.shape[-1])
            reg = reg + mc.l2_reg_embedding * jnp.sum(
                rep[:, None] * jnp.square(flat_rows)
            )
        total = data_loss + reg
        new_stats = mutated.get("batch_stats", batch_stats)
        return total, (data_loss, new_stats, probs)

    def _step_body_two_phase(self, state, batch):
        from .sparse_embedding import two_phase_sparse_adam

        params, batch_stats, opt_state, rng = (
            state["params"],
            state["batch_stats"],
            state["opt_state"],
            state["rng"],
        )
        rng, step_rng = jax.random.split(rng)
        ids, dense, y, dmask, weight = batch[:5]
        B, F = ids.shape
        rest, table = self._without_table(params)
        flat_ids = (ids + self._fused_offsets[None, :]).reshape(-1)
        P = self._emb_pack_factor
        if getattr(self, "device_metadata", False):
            # round 5: dedup metadata computed ON DEVICE inside the step
            # (train/sparse_embedding.py device_step_metadata) — the
            # full-shuffle host stacks (~125 MB/epoch compacted) serialize
            # against dispatches on this relay; the in-step sort does not.
            # Pairs with dedup_route='scatter' (no route lists) and
            # position space; pid pads = n_phys_rows (bounds-skipped).
            from .sparse_embedding import device_step_metadata

            K = B * F
            Kp_n = -(-K // 256) * 256
            inv, rep, d_pids, d_pinv, d_nuniq, d_prep = device_step_metadata(
                flat_ids.astype(jnp.int32), P, Kp_n, self._emb_phys_rows
            )
            batch = batch[:5] + (inv, rep)
            if self.table_update != "scatter":
                batch = batch + (d_pids, d_pinv, d_nuniq, d_prep)
        else:
            inv, rep = batch[5], batch[6]
        # keep the phase-1 SUPER rows in hand: the write-only pallas update
        # reuses them as the old-row values (same take XLA would CSE, made
        # explicit), and the logical rows derive from them exactly as in
        # gather_rows.  Under the stacked container the update's
        # moment-container rows live one strided plane away, so both are
        # fetched together by the dual pair-gather kernel (pair_gather).
        phys = flat_ids // P if P > 1 else flat_ids
        sup_c = None
        slot_mode = (
            getattr(self, "update_space", "position") == "slot"
            and len(batch) > 11
        )
        if slot_mode:
            # SLOT-SPACE phase 1 (round 4): pair-gather the n_phys_unique
            # slot rows once (pids, n_real skip) and derive the position
            # super-rows from them with a small-array take — at heavy
            # duplication this fetches far fewer big-table pairs than the
            # per-position gather (33k vs 65k at zipf-1.1).
            from ..ops.pallas_gather import pallas_rows_gather_dual

            Vp = table.shape[0] // 2
            pair = pallas_rows_gather_dual(
                table.reshape(2, Vp, table.shape[1]),
                batch[7].astype(jnp.int32),  # pids
                n_real=batch[9],  # nuniq
                interpret=self._pallas_interpret,
            )
            sup_slot, monu_slot = pair[0], pair[1]
            sup = jnp.take(sup_slot, batch[8], axis=0)  # pinv -> positions
        elif (
            getattr(self, "pair_gather", "split") == "dual"
            and (B * F) % 256 == 0
        ):
            from ..ops.pallas_gather import pallas_rows_gather_dual

            Vp = table.shape[0] // 2
            pair = pallas_rows_gather_dual(
                table.reshape(2, Vp, table.shape[1]),
                phys.astype(jnp.int32),
                interpret=self._pallas_interpret,
            )
            sup, sup_c = pair[0], pair[1]
        else:
            sup = jnp.take(table, phys, axis=0)
        if P > 1:
            sub = jax.nn.one_hot(flat_ids % P, P, dtype=table.dtype)
            rows = jnp.einsum(
                "kp,kpd->kd", sub,
                sup.reshape(-1, P, self._emb_dim),
            )
        else:
            rows = sup
        rows = rows.reshape(B, F, self._emb_dim)
        (total_loss, (data_loss, new_stats, probs)), (g_rest, g_rows) = (
            jax.value_and_grad(
                self._loss_terms_injected, argnums=(0, 2), has_aux=True
            )(rest, table, rows, batch_stats, batch, step_rng)
        )
        if slot_mode:
            from .sparse_embedding import two_phase_sparse_adam_slot

            new_table, new_table_opt = two_phase_sparse_adam_slot(
                table,
                g_rows.reshape(B * F, self._emb_dim),
                flat_ids,
                rep,
                batch[7],  # pids
                batch[9],  # nuniq
                sup_slot,
                monu_slot,
                state["table_opt"],
                lr=self.cfg.optim_config.lr,
                accperm=batch[11], resid_pos=batch[12],
                resid_slot=batch[13], gdup_pos=batch[14],
                gdup_tgt=batch[15],
                pack_factor=P,
                interpret=self._pallas_interpret,
            )
        elif self.table_update != "scatter":
            from .sparse_embedding import two_phase_sparse_adam_unique

            pids, pinv, nuniq, prep = (
                batch[7], batch[8], batch[9], batch[10])
            route = (
                dict(accperm=batch[11], resid_pos=batch[12],
                     resid_slot=batch[13], gdup_pos=batch[14],
                     gdup_tgt=batch[15])
                if len(batch) > 11 else {}
            )
            new_table, new_table_opt = two_phase_sparse_adam_unique(
                table,
                g_rows.reshape(B * F, self._emb_dim),
                flat_ids,
                inv,
                rep,
                pids,
                pinv,
                state["table_opt"],
                lr=self.cfg.optim_config.lr,
                pack_factor=self._emb_pack_factor,
                use_pallas=self.table_update == "pallas",
                interpret=self._pallas_interpret,
                n_real=nuniq,
                sup=sup,
                sup_c=sup_c,
                prep=prep,
                monu_gather=self.monu_gather,
                **route,
            )
        else:
            new_table, new_table_opt = two_phase_sparse_adam(
                table,
                g_rows.reshape(B * F, self._emb_dim),
                flat_ids,
                inv,
                rep,
                state["table_opt"],
                lr=self.cfg.optim_config.lr,
                pack_factor=self._emb_pack_factor,
            )
        updates, opt_state = self.tx.update(g_rest, opt_state, rest)
        rest = optax.apply_updates(rest, updates)
        new_state = {
            "params": self._with_table(rest, new_table),
            "batch_stats": new_stats,
            "opt_state": opt_state,
            "rng": rng,
            "table_opt": new_table_opt,
        }
        if "epoch_step" in state:
            new_state["epoch_step"] = state["epoch_step"]
        return new_state, total_loss, data_loss, probs

    def _use_explicit_collectives(self) -> bool:
        return (
            self.mesh is not None
            and self.two_phase_embedding
            and bool(
                self.cfg.model_config.extra.get("explicit_collective_embedding")
            )
        )

    def _step_body(self, state, batch):
        """One training step: forward + loss + backward + optimizer update.
        Pure function of (state, batch); reused by the per-step jit and the
        scanned whole-epoch jit."""
        from ..ops.layers import gate_noise_off

        with gate_noise_off(self._gate_warmup_active):
            return self._step_body_inner(state, batch)

    def _step_body_inner(self, state, batch):
        if self._use_explicit_collectives():
            # hand-placed collectives instead of GSPMD partitioning
            # (parallel/explicit_step.py); shard_map composes under
            # jit / lax.scan so the staged scan runners drive it too
            from ..parallel.explicit_step import make_explicit_two_phase_step

            fn = self._cached(
                "explicit_step_body",
                lambda: make_explicit_two_phase_step(self),
            )
            return fn(state, batch)
        if self.two_phase_embedding:
            return self._step_body_two_phase(state, batch)
        tx = self.tx
        params, batch_stats, opt_state, rng = (
            state["params"],
            state["batch_stats"],
            state["opt_state"],
            state["rng"],
        )
        rng, step_rng = jax.random.split(rng)

        use_gradnorm = bool(self.cfg.model_config.extra.get("use_gradnorm"))
        use_cagrad = bool(self.cfg.model_config.extra.get("use_cagrad"))
        if self.is_pcgrad or use_gradnorm or use_cagrad:
            T = self.num_tasks
            task_grads = []
            data_loss = 0.0
            new_stats = batch_stats
            probs = None
            for i in range(T):
                def task_loss(p, i=i):
                    total, (dl, ns, pr) = self._loss_terms_single_task(
                        p, batch_stats, batch, step_rng, i
                    )
                    return total, (dl, ns, pr)

                (l_i, (dl, ns, pr)), g_i = jax.value_and_grad(
                    task_loss, has_aux=True
                )(params)
                task_grads.append(g_i)
                data_loss = dl
                new_stats, probs = ns, pr
            if use_gradnorm:
                from .gradnorm import gradnorm_update
                from .losses import per_task_losses

                mc = self.cfg.model_config
                _, _, y_b, dmask_b, weight_b = batch
                loss_vec = per_task_losses(
                    probs, y_b, weight_b, self.loss_names, self.task_name,
                    self.num_domains,
                    domain_mask=dmask_b if mc.masked_loss else None,
                )
                w = state["task_weights"]
                gn_step = state["gn_step"]
                init_losses = jnp.where(
                    gn_step == 0, loss_vec, state["initial_losses"]
                )
                # grads of w_i * L_i
                task_grads = [
                    jax.tree_util.tree_map(lambda g, wi=w[i]: wi * g, task_grads[i])
                    for i in range(T)
                ]
                grads = jax.tree_util.tree_map(
                    lambda *gs: sum(gs), *task_grads
                )
                new_w, _ = gradnorm_update(
                    w, loss_vec, init_losses, task_grads,
                    alpha=float(mc.extra.get("gradnorm_alpha", 1.5)),
                    lr=float(mc.extra.get("gradnorm_lr", 0.025)),
                )
                total_loss = jnp.sum(w * loss_vec)
            elif use_cagrad:
                from .cagrad import cagrad_merge

                grads = cagrad_merge(
                    task_grads,
                    alpha=float(self.cfg.model_config.extra.get("cagrad_alpha", 0.5)),
                )
                total_loss = data_loss
            else:
                grads = pcgrad_merge(task_grads)
                total_loss = data_loss
        else:
            (total_loss, (data_loss, new_stats, probs)), grads = (
                jax.value_and_grad(self._loss_terms, has_aux=True)(
                    params, batch_stats, batch, step_rng, True
                )
            )
        new_table_opt = None
        if self.sparse_embedding_update:
            from .sparse_embedding import sparse_adam_row_update

            b_ids = batch[0][:, : len(self.layout.sparse_slots)]
            flat_ids = (b_ids + self._fused_offsets[None, :]).reshape(-1)
            if self._emb_pack_factor > 1:
                flat_ids = flat_ids // self._emb_pack_factor
            old_table = params["embeddings"]["fused"]["table"]
            g_table = grads["embeddings"]["fused"]["table"]
            new_table, new_table_opt = sparse_adam_row_update(
                old_table, g_table, flat_ids, state["table_opt"],
                lr=self.cfg.optim_config.lr,
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if new_table_opt is not None:
            emb = dict(params["embeddings"])
            fused = dict(emb["fused"])
            fused["table"] = new_table
            emb["fused"] = fused
            params = {**params, "embeddings": emb}
        new_state = {
            "params": params,
            "batch_stats": new_stats,
            "opt_state": opt_state,
            "rng": rng,
        }
        if new_table_opt is not None:
            new_state["table_opt"] = new_table_opt
        if use_gradnorm:
            new_state["task_weights"] = new_w
            new_state["initial_losses"] = init_losses
            new_state["gn_step"] = state["gn_step"] + 1
        return new_state, total_loss, data_loss, probs

    def _gate_key(self) -> str:
        """Cache-key suffix separating the gate-noise-warmup step programs
        from the post-warmup ones (both are live within one fit)."""
        return "_gw" if self._gate_warmup_active else ""

    @property
    def _donate(self):
        return () if self.debug else (0,)

    def _cached(self, key: str, maker):
        """jit wrappers must be created once per Trainer — a fresh jit
        closure per call would retrace/recompile on every invocation."""
        fn = self._step_fns.get(key)
        if fn is None:
            fn = maker()
            self._step_fns[key] = fn
        return fn

    def _make_train_step(self):
        # the explicit-collective dispatch lives inside _step_body; donation
        # is skipped there (the streaming explicit path's per-batch inputs
        # carry shardings the donated aliases must not constrain)
        donate = () if self._use_explicit_collectives() else self._donate
        return self._cached(
            "train_step" + self._gate_key(),
            lambda: jax.jit(self._step_body, donate_argnums=donate),
        )

    # -- device-resident stepping --------------------------------------
    #
    # Measured on the v5e (docs/perf_notes.md): XLA device loops
    # (lax.scan / fori_loop) execute this train step at ~1 ms/iteration
    # while CHAINED per-step dispatches of the identical body run at
    # ~0.15 ms/step, and a random-row gather of one 4096-batch costs
    # ~0.7-1 ms per gathered array (per-row bound).  The fit fast path
    # therefore uses chained dispatches over a device-resident dataset:
    #
    # * the whole dataset is packed into ONE combined f32 matrix
    #   [N, S + Dd + T (+D)] (ids are exact in f32 below 2^24) so a
    #   full-shuffle batch costs a single gather;
    # * ``shuffle='block'`` instead pre-shuffles rows once and slices
    #   contiguous batches (dynamic_slice ~ microseconds), shuffling only
    #   the batch order per epoch — near-identical training dynamics on
    #   i.i.d. tabular data at ~5x the full-shuffle step rate.

    # staging / metadata machinery lives in train/staging.py (VERDICT r4
    # #7); these thin delegates keep the established private surface for
    # benchmarks, tests, and multi_seed/sweep.

    def _stage_dataset(self, ids, dense, y, dmask):
        from . import staging

        return staging.stage_dataset(self, ids, dense, y, dmask)

    def _to_mesh(self, a, spec=None):
        from . import staging

        return staging.to_mesh(self, a, spec)

    def _fetch_staged_rows(self, staged, idx):
        from . import staging

        return staging.fetch_staged_rows(self, staged, idx)

    def _split_staged(self, rows, weight):
        from . import staging

        return staging.split_staged(self, rows, weight)

    # The hot loop must pass ZERO host-side values: a python scalar argument
    # to a jitted call costs ~9 ms through this environment's TPU tunnel
    # (synchronous constant transfer; docs/perf_notes.md).  The step index
    # therefore lives in the train state as a device counter and the epoch's
    # shuffled indices/weights are transferred once per epoch.

    def _resolve_table_update(self, batch_size: int) -> None:
        from . import staging

        staging.resolve_table_update(self, batch_size)

    def _emb_phys_rows_static(self) -> int:
        from . import staging

        return staging.emb_phys_rows_static(self)

    def _resolve_update_space(self, flat: np.ndarray) -> None:
        from . import staging

        staging.resolve_update_space(self, flat)

    def _step_metadata(self, flat: np.ndarray) -> tuple:
        from . import staging

        return staging.step_metadata(self, flat)

    def _slice_dedup(self, dedup2d, s):
        from . import staging

        return staging.slice_dedup(self, dedup2d, s)

    def _gather_step_body(self, state, staged, idx2d, w2d, dedup2d=None):
        steps, bs = idx2d.shape
        s = state["epoch_step"] % steps
        idx = jax.lax.dynamic_slice(idx2d, (s, 0), (1, bs))[0]
        w = jax.lax.dynamic_slice(w2d, (s, 0), (1, bs))[0]
        rows = self._fetch_staged_rows(staged, idx)
        batch = self._split_staged(rows, w) + self._slice_dedup(dedup2d, s)
        new_state, tl, dl, probs = self._step_body(state, batch)
        new_state["epoch_step"] = state["epoch_step"] + 1
        return new_state, tl, dl, probs

    def _slice_step_body(self, batch_size, state, staged, starts, w2d,
                         dedup2d=None):
        steps = starts.shape[0]
        s = state["epoch_step"] % steps
        start = jax.lax.dynamic_slice(starts, (s,), (1,))[0]
        w = jax.lax.dynamic_slice(w2d, (s, 0), (1, batch_size))[0]
        if self.mesh is not None:
            # contiguous batch as a distributed fetch (dynamic_slice across
            # a row-sharded operand would make GSPMD all-gather the operand)
            rows = self._fetch_staged_rows(
                staged, start + jnp.arange(batch_size, dtype=jnp.int32)
            )
        else:
            rows = jax.lax.dynamic_slice(
                staged, (start, 0), (batch_size, staged.shape[1])
            )
        batch = self._split_staged(rows, w) + self._slice_dedup(dedup2d, s)
        new_state, tl, dl, probs = self._step_body(state, batch)
        new_state["epoch_step"] = state["epoch_step"] + 1
        return new_state, tl, dl, probs

    def _make_gather_step(self):
        def gather_step(state, staged, idx2d, w2d, dedup2d=None):
            return self._gather_step_body(state, staged, idx2d, w2d, dedup2d)

        return self._cached(
            "gather_step" + self._gate_key(),
            lambda: jax.jit(gather_step, donate_argnums=self._donate),
        )

    def _make_scan_runner(self, kind: str, batch_size: int, length: int):
        """``length`` train steps in ONE dispatch via lax.scan.

        The per-dispatch cost on this backend scales with the donated state
        size (a NO-OP state->state step with a 10 GB table+moments state
        measured ~6.3 ms, probe_40m_step_stages.py), so at production
        vocabularies amortizing dispatches beats any in-step optimization:
        the 40M x 32 pallas step went 9.3 -> 7.0 ms/step with a 16-step
        scan.  Enabled by model_config.extra["scan_steps"] (int chunk, or
        true = whole epoch); numerics are the per-step path's exactly — the
        body IS the per-step program.
        """
        body_fn = (
            functools.partial(self._slice_step_body, batch_size)
            if kind == "slice"
            else self._gather_step_body
        )

        def runner(state, staged, arg, w2d, dedup2d=None):
            def body(st, _):
                st, tl, dl, probs = body_fn(st, staged, arg, w2d, dedup2d)
                return st, (tl, probs)

            state, (tls, probs) = jax.lax.scan(
                body, state, None, length=length)
            return state, tls, probs

        return self._cached(
            f"scan_{kind}_{batch_size}_{length}" + self._gate_key(),
            lambda: jax.jit(runner, donate_argnums=self._donate),
        )

    def _make_slice_step(self, batch_size: int):
        def slice_step(state, staged, starts, w2d, dedup2d=None):
            return self._slice_step_body(
                batch_size, state, staged, starts, w2d, dedup2d)

        return self._cached(
            f"slice_step_{batch_size}" + self._gate_key(),
            lambda: jax.jit(slice_step, donate_argnums=self._donate),
        )

    def _loss_terms_single_task(self, params, batch_stats, batch, rng, task_idx):
        mc = self.cfg.model_config
        ids, dense, y, dmask, weight = batch
        model_mask = dmask if (mc.masked_loss and dmask is not None) else None
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        probs, mutated = self.model.apply(
            variables, ids, dense, model_mask, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        onehot = jnp.zeros((probs.shape[-1],)).at[task_idx].set(1.0)
        masked_probs = probs * onehot[None] + jax.lax.stop_gradient(probs) * (1 - onehot[None])
        data_loss = multitask_loss(
            masked_probs, y, weight, self.loss_names, self.task_name,
            self.num_domains,
            domain_mask=dmask if mc.masked_loss else None,
            model_name=self.model_name,
        )
        # spread the (task-agnostic) reg evenly across task objectives
        reg = l2_regularization(params, mc.l2_reg_embedding, mc.l2_reg_dnn,
                                dnn_prefixes=self._reg_dnn_prefixes,
                                l2_linear=mc.l2_reg_linear)
        total = data_loss + reg / max(self.num_tasks, 1)
        return total, (data_loss, mutated.get("batch_stats", batch_stats), probs)

    def _make_eval_step(self):
        return self._cached("eval_step", self._build_eval_step)

    def _build_eval_step(self):
        def eval_step(variables, ids, dense, dmask):
            mc = self.cfg.model_config
            model_mask = dmask if (mc.masked_loss and dmask is not None) else None
            return self.model.apply(
                variables, ids, dense, model_mask, train=False
            )

        return jax.jit(eval_step)

    def _make_predict_fn(self):
        return self._cached("predict_fn", self._build_predict_fn)

    def _scanned_probs(self, variables, ids3, dense3, dmask3):
        """Traced whole-dataset inference over [steps, bs, ...] batches —
        the shared body of predict/eval/final-metrics programs (vs the
        reference's per-batch loop with a device->host sync each batch,
        basemodel.py:431-444).  Returns raw [steps, bs, H] probabilities."""
        mc = self.cfg.model_config

        def body(_, xs):
            b_ids, b_dense, b_dm = xs
            model_mask = b_dm if (mc.masked_loss and b_dm is not None) else None
            probs = self.model.apply(
                variables, b_ids, b_dense, model_mask, train=False
            )
            return None, probs

        _, probs = jax.lax.scan(body, None, (ids3, dense3, dmask3))
        return probs

    def _flat_selected(self, probs):
        """[steps, bs, H] -> [steps*bs, H'], escm keeping [pCTR, pCTCVR]
        (reference basemodel.py:438-441)."""
        p = probs.reshape(-1, probs.shape[-1])
        if self.model_name in ("escm", "escm_dr"):
            p = p[:, jnp.asarray([0, 2])]
        return p

    def _build_predict_fn(self):
        return jax.jit(self._scanned_probs)

    # ------------------------------------------------------------------
    # fit
    # ------------------------------------------------------------------
    def fit(
        self,
        x=None,
        y=None,
        batch_size: Optional[int] = None,
        epochs: int = 1,
        initial_epoch: int = 0,
        validation_split: float = 0.0,
        validation_data=None,
        shuffle: bool = True,
        verbose: int = 1,
        resume_from: Optional[str] = None,
        epoch_callback=None,
    ) -> "Trainer":
        mc, oc, tc = self.cfg.model_config, self.cfg.optim_config, self.cfg.training_config
        batch_size = batch_size or 256
        # metadata-compaction codec is per-fit (its widths specialize on
        # this fit's K/Kp and route layout) — train/staging.py
        self._meta_codec = "unset"
        if self.two_phase_embedding:
            self._resolve_table_update(batch_size)
        ids, dense = self.pack_inputs(x)
        y = self._prepare_y(y)
        dmask = self._domain_mask_from(x)
        n = len(ids)

        val = None
        if validation_data is not None:
            vx, vy = validation_data[:2]
            v_ids, v_dense = self.pack_inputs(vx)
            v_dmask = self._domain_mask_from(vx)
            val = (v_ids, v_dense, self._prepare_y(vy), v_dmask)
        elif validation_split and 0.0 < validation_split < 1.0:
            split = int(n * (1.0 - validation_split))
            val = (
                ids[split:],
                dense[split:],
                y[split:],
                dmask[split:] if dmask is not None else None,
            )
            ids, dense, y = ids[:split], dense[:split], y[:split]
            dmask = dmask[:split] if dmask is not None else None
            n = split

        if self.variables is None:
            self.variables = self._init_variables(ids[:2], dense[:2])
        params = self.variables["params"]
        batch_stats = self.variables.get("batch_stats", {})
        if self.sparse_embedding_update and not self._tx_wrapped:
            # the base optimizer must not touch the table (and must not
            # allocate dense moments for it): route it to set_to_zero
            def label(path, _):
                keys = [str(getattr(p, "key", "")) for p in path]
                return "emb" if "table" in keys else "rest"

            labels = jax.tree_util.tree_map_with_path(label, params)
            self.tx = optax.multi_transform(
                {"emb": optax.set_to_zero(), "rest": self.tx}, labels
            )
            self._tx_wrapped = True
        # optimizer state persists across fit() calls (the reference creates
        # the optimizer once at compile, basemodel.py:563, so a second fit
        # continues with warm adam moments)
        prev = getattr(self, "_train_state", None)
        if prev is not None and "opt_state" in prev:
            opt_state = prev["opt_state"]
            rng_key = prev["rng"]
        else:
            # two-phase mode never exposes the table to the base optimizer —
            # its opt state covers only the non-embedding params (the table's
            # moments live in state["table_opt"])
            tx_params = (
                self._without_table(params)[0]
                if self.two_phase_embedding
                else params
            )
            opt_state = self.tx.init(tx_params)
            rng_key = jax.random.PRNGKey(self.seed + 1)
        state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "rng": rng_key,
        }
        if self.cfg.model_config.extra.get("use_gradnorm"):
            T = self.num_tasks
            state["task_weights"] = jnp.ones((T,), jnp.float32)
            state["initial_losses"] = jnp.ones((T,), jnp.float32)
            state["gn_step"] = jnp.zeros((), jnp.int32)
        if self.sparse_embedding_update or self.two_phase_embedding:
            from .sparse_embedding import init_sparse_adam

            # warm moments persist across fit() calls, like opt_state above
            if prev is not None and "table_opt" in prev:
                state["table_opt"] = prev["table_opt"]
            elif getattr(self, "table_container", "split") == "stacked":
                # moments live INSIDE the fat table param (bottom half,
                # zero-initialized by FusedEmbedding.dual_init); only the
                # step counter is separate state
                from .sparse_embedding import SparseAdamFoldedState

                state["table_opt"] = SparseAdamFoldedState(
                    count=jnp.zeros((), jnp.int32)
                )
            else:
                state["table_opt"] = init_sparse_adam(
                    params["embeddings"]["fused"]["table"],
                    # e.g. "bfloat16" halves moment HBM at production vocab
                    dtype=self.cfg.model_config.extra.get("table_opt_dtype"),
                    packed=getattr(self, "_packed_moments", False),
                )
        # two_phase_embedding composes with a mesh through GSPMD: the table
        # (and its mu/nu) stay vocab-row-sharded over 'model', the row
        # gathers/scatter-adds are partitioned by XLA with the all-to-all /
        # all-gather collectives inserted automatically
        # (tests/test_sharding.py::test_two_phase_sharded_matches_single_device)

        if resume_from is not None:
            state, initial_epoch = self._restore_training_state(resume_from, state)
            if verbose:
                print(f"resumed from {resume_from} at epoch {initial_epoch}")

        train_step = self._make_train_step()
        steps_per_epoch = (n - 1) // batch_size + 1
        max_steps = tc.max_steps or 0
        if verbose:
            print(
                f"Train on {n} samples, validate on "
                f"{len(val[0]) if val else 0} samples, {steps_per_epoch} steps per epoch"
            )

        rng_np = np.random.default_rng(self.seed)
        best_auc = 0.0
        early_stop_count = 0
        best_state_vars = None
        total_steps = 0
        examples_seen = 0
        train_time = 0.0
        val_dev = None
        val_metric_dev = None

        # fit-path decision + dataset/metadata staging + the full-shuffle
        # thread-ahead pool: train/staging.py::make_device_plan (block mode
        # returns pre-shuffled data arrays)
        (use_device_data, block_mode, staged, step_dev, block_w, block_dedup,
         fs_pool, ids, dense, y, dmask) = staging.make_device_plan(
            self, ids, dense, y, dmask, batch_size, shuffle, steps_per_epoch,
            n, rng_np, state, epochs, initial_epoch, max_steps,
        )
        fs_future = None

        # full-shuffle epoch host prep + worker-thread staging: see
        # train/staging.py::fs_host_prep (round-5 compaction included)
        _fs_host_prep = functools.partial(
            staging.fs_host_prep, self, ids, n, batch_size
        )

        for epoch in range(initial_epoch, epochs):
            t0 = time.time()
            if self._gate_warmup_epochs:
                # deterministic-gate warmup programs for the first E epochs
                # (separate compiled variants; see _gate_key)
                self._gate_warmup_active = epoch < self._gate_warmup_epochs
                train_step = self._make_train_step()
                if use_device_data:
                    step_dev = (
                        self._make_slice_step(batch_size)
                        if block_mode else self._make_gather_step()
                    )
            if fs_pool is not None and fs_future is not None:
                order = None  # this epoch's permutation was drawn ahead
            else:
                order = rng_np.permutation(n) if shuffle is True else np.arange(n)
            total_loss_epoch = 0.0
            epoch_probs: List[np.ndarray] = []
            epoch_y: List[np.ndarray] = []
            # (rows_in_concat, valid_rows) per train step, for the opt-in
            # per-batch metric curves (reference basemodel.py:316-331)
            epoch_spans: List[Tuple[int, int]] = []

            steps_this_epoch = steps_per_epoch
            if max_steps:
                steps_this_epoch = min(steps_per_epoch, max_steps - total_steps)
                if steps_this_epoch <= 0:
                    break

            if use_device_data:
                # fresh device zero each epoch (the previous one was donated)
                state["epoch_step"] = jnp.zeros((), jnp.int32)
                if block_mode:
                    batch_order = (
                        rng_np.permutation(steps_per_epoch)[:steps_this_epoch]
                        if shuffle
                        else np.arange(steps_this_epoch)
                    )
                    (state, loss_refs, prob_refs, valid, host_rows, take,
                     spans) = staging.run_block_epoch(
                        self, state, staged, step_dev, block_w, block_dedup,
                        batch_size, steps_per_epoch, steps_this_epoch,
                        batch_order,
                    )
                else:
                    # thread-ahead resolution stays here: the rng_np
                    # permutation draw ORDER must match the synchronous loop
                    if fs_pool is not None:
                        if fs_future is None:
                            prep = _fs_host_prep(order, steps_this_epoch)
                        else:
                            # the ahead-submitted prep was shaped with
                            # steps_per_epoch; the enable guard excludes
                            # max_steps so every epoch is full-length — keep
                            # that coupling explicit rather than implicit
                            assert steps_this_epoch == steps_per_epoch, (
                                "prefetched epoch prep is full-length; "
                                "short epochs must not enable fs_pool"
                            )
                            prep = fs_future.result()
                            fs_future = None
                        if epoch + 1 < epochs:
                            order_next = rng_np.permutation(n)
                            fs_future = fs_pool.submit(
                                _fs_host_prep, order_next, steps_per_epoch
                            )
                    else:
                        prep = _fs_host_prep(order, steps_this_epoch)
                    (state, loss_refs, prob_refs, valid, host_rows, take,
                     spans) = staging.run_gather_epoch(
                        self, state, staged, step_dev, prep, batch_size,
                        steps_this_epoch,
                    )
                epoch_spans += spans
                total_steps += steps_this_epoch
                examples_seen += take
                total_loss_epoch = float(np.sum(np.asarray(
                    jnp.concatenate([jnp.atleast_1d(l) for l in loss_refs])
                )))
                if self.metric_fns and prob_refs:
                    probs_flat = np.asarray(jnp.concatenate(prob_refs, axis=0))
                    if valid is not None:
                        probs_flat = probs_flat[valid]
                    else:
                        probs_flat = probs_flat[:take]
                    epoch_probs.append(probs_flat)
                    epoch_y.append(y[host_rows])
            else:
                (state, total_loss_epoch, stream_ex, epoch_probs, epoch_y,
                 epoch_spans) = staging.run_streaming_epoch(
                    self, state, train_step, order, ids, dense, y, dmask,
                    batch_size, steps_this_epoch,
                )
                total_steps += steps_this_epoch
                examples_seen += stream_ex

            jax.block_until_ready(state["params"])
            epoch_time = time.time() - t0
            train_time += epoch_time
            logs: Dict[str, float] = {
                "loss": total_loss_epoch / max(n, 1),
                "epoch_s": epoch_time,
            }
            if self.metric_fns and epoch_probs:
                probs_all = np.concatenate(epoch_probs)
                y_all = np.concatenate(epoch_y)
                if self.model_name in ("escm", "escm_dr"):
                    probs_all = probs_all[:, [0, 2]]
                logs.update(
                    regime_eval(
                        self.metric_fns, y_all, probs_all, self.task_name, self.num_domains
                    )
                )
                if self.cfg.model_config.extra.get("batch_metric_curves"):
                    # opt-in per-batch in-training metric curves (reference
                    # model/basemodel.py:316-331 computes train metrics on
                    # every batch and epoch-averages them; its per-batch
                    # host sync is that code's main throughput sink — here
                    # the same curve falls out of the probs the epoch
                    # already collected, with zero extra device work).
                    curve: List[Dict[str, float]] = []
                    pos = 0
                    for full, valid_n in epoch_spans:
                        pb = probs_all[pos:pos + valid_n]
                        yb = y_all[pos:pos + valid_n]
                        pos += full
                        if valid_n > 0:
                            curve.append(regime_eval(
                                self.metric_fns, yb, pb,
                                self.task_name, self.num_domains))
                    self.batch_history.append(curve)
                    if curve:
                        # the reference's epoch "train metric" is the MEAN
                        # over per-batch values, not the pooled epoch
                        # metric — expose it alongside under batch_mean_*
                        for k in curve[0]:
                            logs[f"batch_mean_{k}"] = float(
                                np.mean([c[k] for c in curve]))

            self.variables = {
                "params": state["params"],
                "batch_stats": state["batch_stats"],
            }
            if val is not None:
                # stage the (fixed) validation tensors on device once
                # (sharded over 'data' per batch when a mesh is set)
                if val_dev is None:
                    val_dev = self._prepare_eval_tensors(
                        val[0], val[1], val[3], batch_size
                    )
                    if val_dev is not None and self._use_device_eval():
                        val_metric_dev = self._prepare_metric_tensors(
                            val[2], val_dev
                        )
                        if validation_data is not None:
                            # masked_test_metrics_device reuses these when
                            # called on the same arrays (main.py validates
                            # on the test set)
                            self._staged_eval_cache = (
                                id(validation_data[0]), id(validation_data[1]),
                                batch_size, val_dev, *val_metric_dev,
                            )
                if val_metric_dev is not None:
                    out = self._make_eval_program()(
                        self.variables, val_dev[0], val_dev[1], val_dev[2],
                        *val_metric_dev,
                    )
                    val_result = {k: float(np.asarray(v)) for k, v in out.items()}
                elif val_dev is not None:
                    val_result = self._evaluate_prepared(
                        self.variables, val_dev, val[2]
                    )
                else:
                    val_result = self._evaluate_packed(*val, batch_size=batch_size)
                for k, v in val_result.items():
                    logs[f"val_{k}"] = v
                auc = val_result.get("auc", 0.0)
                if auc > best_auc:
                    best_auc = auc
                    # device-side copy: train_step donates its input state,
                    # so the snapshot must own its buffers (reference keeps
                    # a deepcopy, basemodel.py:344)
                    best_state_vars = jax.tree_util.tree_map(
                        lambda a: jnp.copy(a), self.variables
                    )
                    early_stop_count = 0
                else:
                    early_stop_count += 1
            self.history.append(logs)
            if epoch_callback is not None:
                self._train_state = state
                epoch_callback(epoch, self)
            if verbose:
                msg = f"Epoch {epoch + 1}/{epochs} - {epoch_time:.1f}s - " + " - ".join(
                    f"{k}: {v:.4f}" for k, v in logs.items() if k != "epoch_s"
                )
                print(msg)
            if val is not None and early_stop_count >= oc.early_stop:
                break
            if max_steps and total_steps >= max_steps:
                break

        if fs_pool is not None:
            fs_pool.shutdown(wait=False, cancel_futures=True)
            self._fs_pool = None
        self._train_state = state
        if train_time > 0:
            # steady-state throughput: exclude the first (compile) epoch
            # when more than one epoch ran
            epoch_times = [h["epoch_s"] for h in self.history]
            warm_time = sum(epoch_times[1:])
            if len(epoch_times) > 1 and warm_time > 0:
                per_epoch = examples_seen / len(epoch_times)
                self.throughput_examples_per_s = (
                    per_epoch * (len(epoch_times) - 1) / warm_time
                )
            else:
                self.throughput_examples_per_s = examples_seen / train_time
        self.best_variables = best_state_vars or self.variables
        if self.cfg.save_config.save:
            try:
                self.save_checkpoint(self.cfg.save_config.save_path)
            except Exception as e:  # pragma: no cover - fs dependent
                print(f"checkpoint save failed: {e}")
        return self

    # ------------------------------------------------------------------
    # evaluate / predict
    # ------------------------------------------------------------------
    def _predict_packed(
        self, ids, dense, dmask, batch_size: int, collect_intermediates: bool = False
    ):
        variables = self.best_variables or self.variables
        n = len(ids)
        steps = (n - 1) // batch_size + 1

        if not collect_intermediates:
            # scanned fast path: pad to steps*batch and run one dispatch
            # (batches sharded over 'data' when a mesh is set)
            padded = steps * batch_size
            ids3, dense3, dmask3, _ = self._prepare_eval_tensors(
                ids, dense, dmask, batch_size
            )
            probs = self._make_predict_fn()(variables, ids3, dense3, dmask3)
            out = np.asarray(probs).reshape(padded, -1)[:n].astype(np.float64)
            return out

        eval_step = self._make_eval_step()
        preds = []
        inters: Dict[str, List[np.ndarray]] = {}
        for s in range(steps):
            lo, hi = s * batch_size, min((s + 1) * batch_size, n)
            pad = batch_size - (hi - lo)
            sl = slice(lo, hi)
            b_ids, b_dense = ids[sl], dense[sl]
            b_dm = dmask[sl] if dmask is not None else None
            if pad:
                b_ids = np.concatenate([b_ids, np.repeat(b_ids[-1:], pad, 0)])
                b_dense = np.concatenate([b_dense, np.repeat(b_dense[-1:], pad, 0)])
                if b_dm is not None:
                    b_dm = np.concatenate([b_dm, np.repeat(b_dm[-1:], pad, 0)])
            if collect_intermediates:
                mc = self.cfg.model_config
                model_mask = (
                    jnp.asarray(b_dm)
                    if (mc.masked_loss and b_dm is not None)
                    else None
                )
                probs, mutated = self.model.apply(
                    variables, jnp.asarray(b_ids), jnp.asarray(b_dense), model_mask,
                    train=False, mutable=["intermediates"],
                )
                for key, vals in mutated["intermediates"].items():
                    v = vals[0] if isinstance(vals, tuple) else vals
                    arr = np.asarray(v)[: hi - lo]
                    inters.setdefault(key, []).append(arr)
            else:
                probs = eval_step(
                    variables,
                    jnp.asarray(b_ids),
                    jnp.asarray(b_dense),
                    jnp.asarray(b_dm) if b_dm is not None else None,
                )
            preds.append(np.asarray(probs)[: hi - lo])
        out = np.concatenate(preds).astype(np.float64)
        if collect_intermediates:
            return out, {k: np.concatenate(v).astype(np.float64) for k, v in inters.items()}
        return out

    def _eval_batch_spec(self, batch_size: int):
        return staging.eval_batch_spec(self, batch_size)

    def _prepare_eval_tensors(self, ids, dense, dmask, batch_size: int):
        return staging.prepare_eval_tensors(self, ids, dense, dmask, batch_size)

    def _use_device_eval(self) -> bool:
        """device_eval is honored only when every requested metric has a
        device implementation (train/device_metrics.py::SUPPORTED); any
        other metric (e.g. logloss) falls the whole epoch back to host."""
        from . import device_metrics

        return self.device_eval and device_metrics.supports(self.metric_fns.keys())

    def _prepare_metric_tensors(self, y, val_dev):
        return staging.prepare_metric_tensors(self, y, val_dev)

    def _make_eval_program(self):
        return self._cached("eval_program", self._build_eval_program)

    def _build_eval_program(self):
        """Fused whole-validation inference + regime metrics as ONE jitted
        program returning scalars (train/device_metrics.py).  The host path
        (_evaluate_prepared) downloads the full [N, H] prediction matrix
        through the relay every epoch; here only len(metric_fns) scalars
        come back.  The sort/cumsum inside the AUC ranks ride the same
        program as the model scan, avoiding this backend's ~27 ms
        standalone dispatch penalty for those primitives (docs/perf_notes.md)."""
        from . import device_metrics

        names = tuple(self.metric_fns.keys())

        def eval_program(variables, ids3, dense3, dmask3, y2, w):
            p = self._flat_selected(
                self._scanned_probs(variables, ids3, dense3, dmask3)
            )
            return device_metrics.regime_metrics(
                names, y2, p, w, self.task_name, self.num_domains
            )

        return jax.jit(eval_program)

    def _evaluate_prepared(self, variables, val_dev, y) -> Dict[str, float]:
        ids3, dense3, dmask3, n = val_dev
        probs = self._make_predict_fn()(variables, ids3, dense3, dmask3)
        preds = np.asarray(probs).reshape(-1, probs.shape[-1])[:n].astype(np.float64)
        if self.model_name in ("escm", "escm_dr"):
            preds = preds[:, [0, 2]]
        return regime_eval(self.metric_fns, y, preds, self.task_name, self.num_domains)

    def reset_for_seed(self, seed: int) -> "Trainer":
        """Reset per-run state, KEEPING the jitted-program caches
        (self._step_fns), so a seed suite re-fits without recompiling —
        remote compiles cost 5-390 s each here (docs/perf_notes.md).  Used
        by train/multi_seed.py's sequential-shared mode for the
        two-phase/pallas path."""
        self.seed = seed
        self.variables = None
        self.best_variables = None
        self.history = []
        self.batch_history = []
        self.throughput_examples_per_s = None
        for attr in ("_train_state", "_staged_eval_cache", "_meta_codec"):
            if hasattr(self, attr):
                delattr(self, attr)
        return self

    def predict(self, x, batch_size: int = 256):
        """Reference basemodel.py:395-457; escm keeps [pCTR, pCTCVR] columns
        (:438-441); returns (preds, layer_output_dict) after update_save()."""
        ids, dense = self.pack_inputs(x)
        dmask = self._domain_mask_from(x)
        result = self._predict_packed(
            ids, dense, dmask, batch_size, collect_intermediates=self._save_layer_output
        )
        if self._save_layer_output:
            preds, inters = result
        else:
            preds = result
        if self.model_name in ("escm", "escm_dr"):
            preds = preds[:, [0, 2]]
        if self._save_layer_output:
            return preds, inters
        return preds

    def _evaluate_packed(self, ids, dense, y, dmask, batch_size: int) -> Dict[str, float]:
        preds = self._predict_packed(ids, dense, dmask, batch_size)
        if self.model_name in ("escm", "escm_dr"):
            preds = preds[:, [0, 2]]
        return regime_eval(self.metric_fns, y, preds, self.task_name, self.num_domains)

    def evaluate(self, x, y, batch_size: int = 256) -> Dict[str, float]:
        ids, dense = self.pack_inputs(x)
        return self._evaluate_packed(
            ids, dense, self._prepare_y(y), self._domain_mask_from(x), batch_size
        )

    def masked_test_metrics_device(self, x, y, test_mask,
                                   batch_size: int = 256) -> Dict[str, float]:
        """Final per-head masked LogLoss/AUC (+ total AUC) computed ON
        DEVICE in one fused predict+metrics program — the device-side
        analogue of predict() + train/metrics.py::masked_test_metrics
        (reference main.py:134-172).  Only scalars cross the relay; rows
        keep the reference's 4-decimal rounding."""
        cached = getattr(self, "_staged_eval_cache", None)
        if cached is not None and cached[:3] == (id(x), id(y), batch_size):
            # fit() already staged these exact tensors (main.py validates
            # on the test set); skip the re-pack + re-upload
            val_dev, y_dev, w_dev = cached[3], cached[4], cached[5]
        else:
            ids, dense = self.pack_inputs(x)
            y2 = self._prepare_y(y)
            dmask = self._domain_mask_from(x)
            val_dev = self._prepare_eval_tensors(ids, dense, dmask, batch_size)
            y_dev, w_dev = self._prepare_metric_tensors(y2, val_dev)
        tm_dev = self._prepare_mask_tensor(test_mask, y_dev.shape[0])
        variables = self.best_variables or self.variables
        program = self._cached(
            "masked_test_program", self._build_masked_test_program
        )
        out = program(variables, val_dev[0], val_dev[1], val_dev[2], y_dev,
                      w_dev, tm_dev)
        return self._order_masked_row(
            {k: float(np.asarray(v)) for k, v in out.items()}
        )

    def _prepare_mask_tensor(self, test_mask, total: int):
        return staging.prepare_mask_tensor(self, test_mask, total)

    @staticmethod
    def _order_masked_row(vals: Dict[str, float]) -> Dict[str, float]:
        """Round to the reference's 4 decimals and restore its row order
        (jit pytrees alphabetize dict keys; reference order is log_loss_i,
        auc_i per head, then total_auc — main.py:167).  Raises on
        non-finite values like the host sklearn path would."""
        vals = {k: round(v, 4) for k, v in vals.items()}
        bad = [k for k, v in vals.items() if not np.isfinite(v)]
        if bad:
            raise ValueError(
                f"non-finite device test metrics {bad} — a head's masked "
                "rows are single-class (sklearn would raise here too)"
            )
        n_heads = sum(1 for k in vals if k.startswith("auc_"))
        ordered = {}
        for i in range(n_heads):
            ordered[f"log_loss_{i}"] = vals[f"log_loss_{i}"]
            ordered[f"auc_{i}"] = vals[f"auc_{i}"]
        if "total_auc" in vals:
            ordered["total_auc"] = vals["total_auc"]
        return ordered

    def _build_masked_test_program(self):
        from . import device_metrics

        def program(variables, ids3, dense3, dmask3, y2, w, tm):
            p = self._flat_selected(
                self._scanned_probs(variables, ids3, dense3, dmask3)
            )
            return device_metrics.masked_test_metrics_device(
                y2, p, w, tm, self.task_name, self.num_domains
            )

        return jax.jit(program)

    def update_save(self, value: bool = True):
        """Enable layer-output capture on predict (reference basemodel.py:458)."""
        self._save_layer_output = value

    # ------------------------------------------------------------------
    # observability (the reference prints only; SURVEY §5)
    # ------------------------------------------------------------------
    def dump_history(self, path: str) -> None:
        """Write the per-epoch training history as JSON lines."""
        import json

        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        with open(path, "w") as f:
            for epoch, logs in enumerate(self.history):
                f.write(json.dumps({"epoch": epoch, **logs}) + "\n")

    def profile(self, x, y, batch_size: int = 256, steps: int = 5,
                trace_dir: str = "/tmp/mmlrec_trace"):
        """Capture a jax.profiler trace of `steps` training steps
        (viewable with TensorBoard / xprof)."""
        ids, dense = self.pack_inputs(x)
        yv = self._prepare_y(y)
        dmask = self._domain_mask_from(x)
        if self.variables is None:
            self.variables = self._init_variables(ids[:2], dense[:2])
        state = {
            "params": self.variables["params"],
            "batch_stats": self.variables.get("batch_stats", {}),
            "opt_state": self.tx.init(self.variables["params"]),
            "rng": jax.random.PRNGKey(self.seed + 2),
        }
        step = self._make_train_step()
        b = min(batch_size, len(ids))
        batch = (
            jnp.asarray(ids[:b]), jnp.asarray(dense[:b]), jnp.asarray(yv[:b]),
            jnp.asarray(dmask[:b]) if dmask is not None else None,
            jnp.ones((b,), jnp.float32),
        )
        state, *_ = step(state, batch)  # compile outside the trace
        jax.block_until_ready(state["params"])
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                state, *_ = step(state, batch)
            jax.block_until_ready(state["params"])
        return trace_dir

    # ------------------------------------------------------------------
    # checkpointing (the reference defines save_config but never reads it;
    # SURVEY §5 — honored here via orbax)
    # ------------------------------------------------------------------
    # -- full training-state checkpointing (params + optimizer state +
    #    epoch) for mid-run resume; the reference has no on-disk
    #    checkpointing at all (SURVEY §5) --
    # bodies in train/checkpointing.py (VERDICT r4 #7 split)

    def _state_ckpt_dir(self, path: str) -> str:
        from . import checkpointing

        return checkpointing.state_ckpt_dir(self, path)

    def _state_to_split_layout(self, state):
        from . import checkpointing

        return checkpointing.state_to_split_layout(self, state)

    def _state_to_runtime_layout(self, state):
        from . import checkpointing

        return checkpointing.state_to_runtime_layout(self, state)

    def save_training_state(self, path: str, epoch: Optional[int] = None) -> str:
        from . import checkpointing

        return checkpointing.save_training_state(self, path, epoch)

    def _restore_training_state(self, path: str, template_state):
        from . import checkpointing

        return checkpointing.restore_training_state(self, path, template_state)

    def save_checkpoint(self, path: str):
        from . import checkpointing

        return checkpointing.save_checkpoint(self, path)

    def restore_checkpoint(self, path: str):
        from . import checkpointing

        return checkpointing.restore_checkpoint(self, path)
