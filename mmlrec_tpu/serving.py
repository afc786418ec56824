"""Production serving: AOT-exported, self-contained inference bundles.

The reference has no deployment story — ``predict`` is a Python batch loop
over a live torch module (reference model/basemodel.py:395-457), so serving
requires the full framework, the model class, and its config at load time.

Here a trained model is exported ONCE to portable StableHLO via
``jax.export`` and written to disk as a three-file bundle:

    <dir>/predict.jaxexport   serialized Exported (StableHLO + calling conv)
    <dir>/params.msgpack      parameters + batch_stats (flax msgpack)
    <dir>/meta.json           feature packing schema + batch/mask contract

``ServingBundle.load`` needs none of the model zoo, the config system, or
flax model code — just this module — and runs on any JAX backend the bundle
was exported for (multi-platform ``cpu``+``tpu`` by default, so a bundle
exported on a CPU dev box serves on TPU unchanged).

Exports prefer a SYMBOLIC batch dimension (one program serves any batch
size, no padding); models whose programs need concrete batch sizes fall
back to a fixed-batch export with pad-and-trim at call time.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

_EXPORT_FILE = "predict.jaxexport"
_PARAMS_FILE = "params.msgpack"
_META_FILE = "meta.json"


def _packing_schema(layout) -> Dict:
    """Feature→packed-column schema, standalone-serializable so the loader
    can pack inputs without a FeatureLayout."""
    return {
        "sparse": [s.feature.name for s in layout.sparse_slots],
        "varlen": [
            {
                "name": s.feature.name,
                "maxlen": int(s.feature.maxlen),
                "length_name": s.feature.length_name,
            }
            for s in layout.varlen_slots
        ],
        "dense": [
            {"name": s.feature.name, "dim": int(s.feature.dimension)}
            for s in layout.dense_slots
        ],
    }


def _pack_from_schema(schema: Dict, x) -> tuple:
    """Standalone re-implementation of Trainer.pack_inputs driven by the
    bundle's schema (train/trainer.py:190-219 semantics)."""
    if isinstance(x, tuple) and len(x) == 2:
        return np.asarray(x[0], np.int32), np.asarray(x[1], np.float32)
    n = None
    ids_parts: List[np.ndarray] = []
    for name in schema["sparse"]:
        col = np.asarray(x[name]).reshape(-1, 1).astype(np.int32)
        ids_parts.append(col)
        n = len(col)
    for v in schema["varlen"]:
        seq = np.asarray(x[v["name"]]).reshape(n if n else -1, v["maxlen"])
        ids_parts.append(seq.astype(np.int32))
        if v["length_name"] is not None:
            ids_parts.append(
                np.asarray(x[v["length_name"]]).reshape(-1, 1).astype(np.int32)
            )
    dense_parts: List[np.ndarray] = []
    for d in schema["dense"]:
        dense_parts.append(
            np.asarray(x[d["name"]], np.float32).reshape(-1, d["dim"])
        )
    ids = (
        np.concatenate(ids_parts, axis=1)
        if ids_parts
        else np.zeros((n or 0, 0), np.int32)
    )
    dense = (
        np.concatenate(dense_parts, axis=1)
        if dense_parts
        else np.zeros((len(ids), 0), np.float32)
    )
    return ids, dense


def _domain_mask_from_meta(meta: Dict, x) -> Optional[np.ndarray]:
    col = meta.get("mask_column")
    if not meta["needs_mask"] or not col:
        return None
    vals = np.asarray(x[col])
    mask = np.zeros((len(vals), meta["num_domains"]), np.float32)
    for i, mv in enumerate(meta["mask_values"]):
        mask[:, i] = (vals == mv).astype(np.float32)
    return mask


def save_serving_bundle(
    trainer,
    path: str,
    batch_size: int = 1024,
    platforms: Optional[List[str]] = None,
) -> Dict:
    """Export ``trainer``'s best params + inference program to ``path``.

    Returns the bundle's meta dict (``batch_mode`` records whether the
    symbolic-batch export succeeded).
    """
    import flax.serialization

    variables = trainer.best_variables or trainer.variables
    if variables is None:
        raise ValueError("trainer has no parameters — fit() or load first")
    mc = trainer.cfg.model_config
    dc = trainer.cfg.data_config
    model = trainer.model
    if getattr(trainer, "table_container", "split") == "stacked":
        # the stacked training container carries the optimizer's moment
        # rows in the bottom half of the fat [2Vp, 128] table param
        # (train/sparse_embedding.py SparseAdamFoldedState) — serving must
        # not ship them.  Re-express the model in the split layout and
        # slice the table half out; inference math is identical (gathers
        # only ever touch rows < Vp).
        import copy as _copy

        from .models import get_model

        cfg2 = _copy.deepcopy(trainer.cfg)
        cfg2.model_config.extra["table_container"] = "split"
        cfg2.model_config.extra.pop("stacked_shards", None)
        model = get_model(cfg2.model_config.model_name, trainer.layout, cfg2)
        emb = dict(variables["params"]["embeddings"])
        fused = dict(emb["fused"])
        fat = fused["table"]
        from .train.sparse_embedding import split_stacked_planes

        fused["table"] = split_stacked_planes(
            jnp.asarray(fat), getattr(trainer, "_stacked_shards", 1)
        )[0]
        emb["fused"] = fused
        variables = {
            **variables,
            "params": {**variables["params"], "embeddings": emb},
        }
    escm = trainer.model_name in ("escm", "escm_dr")
    needs_mask = bool(mc.masked_loss) and trainer.task_name in ("msl", "mtmsl")

    S = int(trainer.layout.num_id_slots)
    Dd = int(trainer.layout.num_dense_dims)

    if needs_mask:

        def serve(variables, ids, dense, dmask):
            probs = model.apply(variables, ids, dense, dmask, train=False)
            # escm keeps [pCTR, pCTCVR] (reference basemodel.py:438-441)
            return probs[:, jnp.array([0, 2])] if escm else probs

    else:

        def serve(variables, ids, dense):
            probs = model.apply(variables, ids, dense, None, train=False)
            return probs[:, jnp.array([0, 2])] if escm else probs

    var_specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
    )
    platforms = platforms or ["cpu", "tpu"]

    def specs_for(b):
        args = [
            var_specs,
            jax.ShapeDtypeStruct((b, S), jnp.int32),
            jax.ShapeDtypeStruct((b, Dd), jnp.float32),
        ]
        if needs_mask:
            args.append(
                jax.ShapeDtypeStruct((b, trainer.num_domains), jnp.float32)
            )
        return args

    exported = None
    batch_mode = "symbolic"
    try:
        (b,) = jax.export.symbolic_shape("b")
        exported = jax.export.export(jax.jit(serve), platforms=platforms)(
            *specs_for(b)
        )
    except Exception:
        batch_mode = "fixed"
        exported = jax.export.export(jax.jit(serve), platforms=platforms)(
            *specs_for(batch_size)
        )

    meta = {
        "format": 1,
        "model_name": trainer.model_name,
        "task_name": trainer.task_name,
        "num_domains": int(trainer.num_domains),
        "num_heads": int(trainer.num_tasks if not escm else 2),
        "batch_mode": batch_mode,
        "batch_size": None if batch_mode == "symbolic" else int(batch_size),
        "needs_mask": needs_mask,
        "mask_column": dc.mask_column or None,
        "mask_values": list(dc.mask_values or []),
        "platforms": platforms,
        "packing": _packing_schema(trainer.layout),
    }

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _EXPORT_FILE), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, _PARAMS_FILE), "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ServingBundle:
    """A loaded inference bundle: ``predict(x)`` with no model code.

    ``x`` is the same dict-of-columns the Trainer takes (or a packed
    ``(ids, dense)`` tuple)."""

    def __init__(self, exported, variables, meta: Dict):
        self.exported = exported
        self.variables = variables
        self.meta = meta
        self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str) -> "ServingBundle":
        import flax.serialization

        with open(os.path.join(path, _META_FILE)) as f:
            meta = json.load(f)
        with open(os.path.join(path, _EXPORT_FILE), "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        with open(os.path.join(path, _PARAMS_FILE), "rb") as f:
            variables = flax.serialization.msgpack_restore(bytearray(f.read()))
        return cls(exported, variables, meta)

    # ------------------------------------------------------------------
    def _run(self, ids: np.ndarray, dense: np.ndarray, dmask) -> np.ndarray:
        args = [self.variables, jnp.asarray(ids), jnp.asarray(dense)]
        if self.meta["needs_mask"]:
            args.append(jnp.asarray(dmask))
        return np.asarray(self._call(*args))

    def predict(self, x, batch_size: Optional[int] = None) -> np.ndarray:
        """[N, num_heads] float64 probabilities (Trainer.predict contract,
        reference basemodel.py:395-457)."""
        ids, dense = _pack_from_schema(self.meta["packing"], x)
        dmask = _domain_mask_from_meta(self.meta, x)
        n = len(ids)

        if self.meta["batch_mode"] == "fixed":
            batch_size = self.meta["batch_size"]
        if batch_size is None:  # symbolic: one program, any batch
            return self._run(ids, dense, dmask)[:n].astype(np.float64)

        steps = (n - 1) // batch_size + 1
        pad = steps * batch_size - n

        def pad_rows(a):
            if a is None:
                return None
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            return a

        ids, dense, dmask = pad_rows(ids), pad_rows(dense), pad_rows(dmask)
        outs = [
            self._run(
                ids[s * batch_size : (s + 1) * batch_size],
                dense[s * batch_size : (s + 1) * batch_size],
                None if dmask is None else dmask[s * batch_size : (s + 1) * batch_size],
            )
            for s in range(steps)
        ]
        return np.concatenate(outs)[:n].astype(np.float64)
