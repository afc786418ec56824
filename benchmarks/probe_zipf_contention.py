"""Decompose the zipf hot-row slowdown on the 40M-row step (round 4).

Round-3 measured the production 40M x 32 step 6.5 ms at zipf-1.1 vs 4.3
uniform with IDENTICAL program shapes (scatter route) — mechanism unknown
(docs/perf_notes.md).  Candidate mechanisms:

  (a) PHYSICAL CLUSTERING — zipf's hot head occupies a few contiguous MB
      of the 10 GB table, so the per-row DMAs (pair-gather + dual write)
      hammer a narrow HBM region (bank/page contention);
  (b) DUPLICATE MACHINERY — 43% duplicates inflate the residual routes
      (R_cap/G_cap 256 -> 32k) and their scatter-adds COLLIDE on hot
      slots (XLA scatter serializes colliding updates);
  (c) DUPLICATE READS — the K-row pair-gather re-fetches hot rows
      thousands of times (same-address DMA serialization).

This probe runs the EXACT production scanned step (stacked container,
gather route, scan32) on four id distributions that separate the axes:

  uniform          spread layout, ~no dups          (baseline)
  zipf             clustered layout, heavy dups     (the slow case)
  zipf_spread      SPREAD layout, SAME dup structure as zipf: physical
                   rows pass through the bijection p -> (p * A) % Vp
                   (A coprime to Vp), which preserves every duplicate
                   relation (bijective) but scatters the hot head across
                   the whole table
  clustered_nodup  clustered layout, NO dups: distinct physical rows
                   drawn from a narrow per-feature window, random lane

Readout: zipf_spread ~= zipf         -> clustering innocent, (b)/(c)
         zipf_spread ~= uniform      -> clustering (a) is the mechanism
         clustered_nodup >> uniform  -> clustering alone hurts

Usage: python benchmarks/probe_zipf_contention.py [dist ...]
Env: SCAN_STEPS (default 32), VOCAB_PER_FEATURE (default 2_500_000).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOCAB = int(os.environ.get("VOCAB_PER_FEATURE", 2_500_000))
SCAN_STEPS = int(os.environ.get("SCAN_STEPS", "32"))
N_SPARSE = 16
EMB_DIM = 32
BATCH = 4096
P = 128 // EMB_DIM  # lane pack factor of the stacked container


def make_ids(kind: str, rng: np.random.Generator) -> np.ndarray:
    if kind == "uniform":
        ids = rng.integers(0, VOCAB, (BATCH, N_SPARSE))
    elif kind in ("zipf", "zipf_spread"):
        ids = (rng.zipf(1.1, (BATCH, N_SPARSE)) - 1) % VOCAB
        if kind == "zipf_spread":
            # physical-row bijection: preserves the duplicate structure
            # exactly (bijective per lane) but spreads the hot head
            # across the feature's whole 2.5M-row block
            Vp = VOCAB // P
            A = 1_000_003  # odd prime, coprime to Vp = 2^3 * 5^8
            assert np.gcd(A, Vp) == 1
            phys = (ids // P).astype(np.int64)
            ids = ((phys * A) % Vp) * P + ids % P
    elif kind == "clustered_nodup":
        # distinct physical rows from a narrow window (matches zipf's
        # footprint scale: ~8k phys rows/feature = 4 MB of table),
        # random lane -> no logical or physical duplicates
        window = 8192
        ids = np.stack(
            [rng.permutation(window)[:BATCH] * P + rng.integers(0, P, BATCH)
             for _ in range(N_SPARSE)], axis=1)
    else:
        raise ValueError(kind)
    return ids.astype(np.int32)


def main(dists):
    import jax
    import jax.numpy as jnp

    from mmlrec_tpu.features import DenseFeat, FeatureLayout, SparseFeat
    from mmlrec_tpu.models import get_model
    from mmlrec_tpu.synthetic import make_config
    from mmlrec_tpu.train import Trainer
    from mmlrec_tpu.train.sparse_embedding import SparseAdamFoldedState

    cfg = make_config(
        task_name="mtl", model_name="mmoe", emb=EMB_DIM, n_sparse=N_SPARSE,
        n_dense=4, hidden=(256, 128), tower=(64,), gate=(64,),
        batch_size=BATCH, two_phase_embedding=True,
        table_opt_dtype="bfloat16", table_update="pallas",
        table_container="stacked",
        # UPDATE_SPACE=slot A/Bs the slot-space update (round 4)
        update_space=os.environ.get("UPDATE_SPACE", "position"),
    )
    cols = [SparseFeat(f"s{i}", VOCAB, EMB_DIM) for i in range(N_SPARSE)] + [
        DenseFeat(f"d{i}", 1) for i in range(4)]
    layout = FeatureLayout(cols)
    model = get_model("mmoe", layout, cfg)
    trainer = Trainer(model, seed=0).compile(metrics=[])

    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((BATCH, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, (BATCH, 2)), jnp.float32)
    trainer.variables = trainer._init_variables(
        np.zeros((2, N_SPARSE), np.int32), np.asarray(dense[:2]))
    params = trainer.variables["params"]
    state = {
        "params": params,
        "batch_stats": trainer.variables.get("batch_stats", {}),
        "opt_state": trainer.tx.init(trainer._without_table(params)[0]),
        "rng": jax.random.PRNGKey(1),
        "table_opt": SparseAdamFoldedState(count=jnp.zeros((), jnp.int32)),
    }
    offs = np.asarray(trainer._fused_offsets)[None, :]

    def run(kind):
        nonlocal state
        # "slot:<dist>" runs the cell with update_space='slot' (same
        # trainer/state — the folded layout is identical; the step body
        # reads the attribute at trace time)
        if kind.startswith("slot:"):
            trainer.update_space = "slot"
            kind = kind[5:]
        else:
            trainer.update_space = str(
                os.environ.get("UPDATE_SPACE", "position"))
        # perf-only ABLATION cells (numerically wrong, shapes right):
        # zipf_noresid / zipf_nogdup / zipf_smallcaps truncate the resid /
        # gdup metadata to the uniform-sized 256 cap to attribute the zipf
        # delta between the physical-accumulation residual scatters and
        # the logical gradient-dedup scatter
        base = kind.split("_", 1)[0] if kind.startswith("zipf_") else kind
        ids_np = make_ids(base, np.random.default_rng(1))
        ids = jnp.asarray(ids_np)
        # each distribution gets its NATURAL residual caps (the trainer's
        # monotone floor would otherwise leak zipf's 32k caps into later
        # low-dup variants)
        trainer._route_r_cap = 0
        flat = (ids_np.astype(np.int64) + offs).reshape(1, -1)
        meta = trainer._step_metadata(flat)
        if kind in ("zipf_noresid", "zipf_smallcaps"):
            meta = meta[:7] + (meta[7][:, :256], meta[8][:, :256]) + meta[9:]
        if kind in ("zipf_nogdup", "zipf_smallcaps"):
            meta = meta[:9] + (meta[9][:, :256], meta[10][:, :256])
        if kind.startswith("zipf_rcap"):  # resid cap sweep (perf-only)
            n = int(kind[len("zipf_rcap"):])
            meta = meta[:7] + (meta[7][:, :n], meta[8][:, :n]) + meta[9:]
        if kind.startswith("zipf_gcap"):  # gdup cap sweep (perf-only)
            n = int(kind[len("zipf_gcap"):])
            meta = meta[:9] + (meta[9][:, :n], meta[10][:, :n])
        if kind == "zipf_invg":
            # EXACT alternative: plain full inv-scatter g_sum instead of
            # the gdup route (the route moves 28k of 65k rows at zipf —
            # possibly worse than the thing it replaced)
            meta = meta[:9] + (None, None)
        uniq = len(np.unique(flat[0]))
        puniq = len(np.unique(flat[0] // P))
        caps = {f"m{i}": None if a is None else tuple(a.shape[1:])
                for i, a in enumerate(meta)}
        print(f"[{kind}] {uniq} uniq logical / {puniq} uniq phys of "
              f"{flat.shape[1]}; meta shapes {caps}", flush=True)
        batch = (ids, dense, y, None, jnp.ones((BATCH,), jnp.float32),
                 ) + tuple(
                     None if a is None else jnp.asarray(a[0]) for a in meta)

        def body(st, _):
            st, total, dl, probs = trainer._step_body(st, batch)
            return st, total

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_step(st):
            return jax.lax.scan(body, st, None, length=SCAN_STEPS)

        def sync(st):
            leaf = st["params"]["embeddings"]["fused"]["table"]
            return float(np.asarray(leaf[(0,) * leaf.ndim]))

        t0 = time.perf_counter()
        state, _ = scan_step(state)
        sync(state)
        print(f"[{kind}] compiled+first in {time.perf_counter()-t0:.0f}s",
              flush=True)
        best = float("inf")
        for r in range(5):
            t0 = time.perf_counter()
            for _ in range(4):
                state, _ = scan_step(state)
            sync(state)
            dt = (time.perf_counter() - t0) / (4 * SCAN_STEPS)
            best = min(best, dt)
            print(f"[{kind}] round {r}: {dt*1e3:.2f} ms/step", flush=True)
        return best

    results = {}
    for kind in dists:
        results[kind] = run(kind)
    print(json.dumps({
        "metric": "zipf_contention_decomposition",
        "scan_steps": SCAN_STEPS,
        "ms_per_step": {k: round(v * 1e3, 2) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["uniform", "zipf", "zipf_spread", "clustered_nodup"])
